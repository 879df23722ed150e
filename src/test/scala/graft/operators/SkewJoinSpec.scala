package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, duplicates included") {
    // 80% of fact rows hit key 1 (the hot key); dim has dup keys too
    val fact = (1 to 200).map(i => (if (i % 5 != 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (1L, "hot2"), (5L, "cold"), (10L, "cold"),
      (999L, "nomatch")).toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedJoin(fact, dim, "k", "dk", salts)
        .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain, s"salts=$salts")
    }
  }

  test("salt column never leaks into the output") {
    val fact = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("dk", "name")
    val out = SkewJoin.saltedJoin(fact, dim, "k", "dk", 4)
    assert(!out.columns.contains("_salt"))
    assert(out.columns.toSet == Set("k", "v", "dk", "name"))
  }
}
