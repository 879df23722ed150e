package graft.core

import graft.SparkSpec
import java.nio.file.Files

class WriteAuditSpec extends SparkSpec {
  import spark.implicits._

  test("audit metrics match the written data, in one pass") {
    val dir = Files.createTempDirectory("audit").toFile.getAbsolutePath
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("k", "s")
    val m = WriteAudit.writeWithAudit(df, s"$dir/out", Seq("k", "s"))
    assert(m("rows") === 4L)
    assert(m("null_k") === 0L)
    assert(m("null_s") === 2L)
    assert(spark.read.parquet(s"$dir/out").count() === 4L)
  }

  test("fingerprint is order-independent and content-sensitive") {
    val dir = Files.createTempDirectory("audit2").toFile.getAbsolutePath
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("k", "s") // same rows, new order
    val c = Seq((1L, "x"), (2L, "y"), (3L, "DIFFERENT")).toDF("k", "s")
    val fa = WriteAudit.writeWithAudit(a, s"$dir/a")("fingerprint")
    val fb = WriteAudit.writeWithAudit(b.repartition(3), s"$dir/b")("fingerprint")
    val fc = WriteAudit.writeWithAudit(c, s"$dir/c")("fingerprint")
    assert(fa === fb)
    assert(fa !== fc)
  }

  test("sidecar JSON lands next to the data") {
    val dir = Files.createTempDirectory("audit3").toFile.getAbsolutePath
    val df = Seq((1L, "x")).toDF("k", "s")
    val m = WriteAudit.writeWithAuditSidecar(df, s"$dir/out", Seq("k"))
    val sidecar = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out._audit.json")), "UTF-8")
    assert(sidecar.contains(s""""rows":${m("rows")}"""))
    assert(sidecar.contains(""""null_k":0"""))
  }
}
