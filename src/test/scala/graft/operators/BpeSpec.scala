package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer golden: merge order follows pair counts with " +
    "lexicographic ties; encode applies ranks greedily") {
    val docs = Seq((1L, "ab ab ab"), (2L, "ac")).toDF("doc_id", "text")
    // histogram ab:3, ac:1 → pairs (a,b):3, (b,</w>):3, (a,c):1,
    // (c,</w>):1; tie at 3 → lexicographic (a,b) first, then the new
    // (ab,</w>):3; the count-1 pairs stay under minPairCount=2
    val m = Bpe.train(docs, "text", numMerges = 10)
    assert(m.merges.toSeq == Seq(("a", "b"), ("ab", "</w>")))
    val enc = docs.select(col("doc_id"), Bpe.encode(m, col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(1L) == Seq("ab</w>", "ab</w>", "ab</w>"))
    assert(enc(2L) == Seq("a", "c", "</w>")) // no learned pair applies
    // unseen text reuses learned merges where adjacency allows
    val novel = Seq((9L, "abc Ab")).toDF("doc_id", "text")
      .select(Bpe.encode(m, col("text")).as("t")).as[Seq[String]].head()
    assert(novel == Seq("ab", "c", "</w>", "ab</w>")) // lowercased
  }

  test("overlapping occurrences merge left-to-right in both trainer " +
    "and encoder; training is deterministic across partitionings") {
    val docs = Seq((1L, "aaa aaa"), (2L, "aaa")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 1)
    assert(m.merges.toSeq == Seq(("a", "a")))
    val enc = docs.limit(1).select(Bpe.encode(m, col("text")).as("t"))
      .as[Seq[String]].head()
    assert(enc == Seq("aa", "a", "</w>", "aa", "a", "</w>"))
    // same merges from any partitioning of the same corpus
    val big = (0 until 200).map(i => (i.toLong,
      if (i % 3 == 0) "lower lowest" else "newer newest")).toDF("doc_id", "text")
    val m1 = Bpe.train(big.repartition(1), "text", numMerges = 20)
    val m8 = Bpe.train(big.repartition(8), "text", numMerges = 20)
    assert(m1.merges.toSeq == m8.merges.toSeq)
    assert(m1.merges.nonEmpty)
  }

  test("non-BMP text splits on code points — no lone-surrogate " +
    "mojibake in tokens, and trainer/encoder agree on emoji symbols") {
    val docs = Seq((1L, "😀x 😀x"), (2L, "😀x"))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 2)
    // 😀x = [😀, x, </w>]: pairs (😀,x) and (x,</w>) tie at 3; "x"
    // sorts before the surrogate-leading 😀, so (x,</w>) merges first,
    // then (😀, x</w>) — learnable only if both trainer and encoder
    // keep the emoji as ONE symbol
    assert(m.merges.toSeq == Seq(("x", "</w>"), ("😀", "x</w>")))
    val enc = docs.limit(1).select(Bpe.encode(m, col("text")).as("t"))
      .as[Seq[String]].head()
    assert(enc == Seq("😀x</w>", "😀x</w>"))
    assert(!enc.exists(_.contains("?")))
  }

  test("property: encoding is lossless — tokens concatenate back to " +
    "the lowercased words with </w> terminals (seeded random corpus)") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 60).map { i =>
      val words = (0 to rnd.nextInt(6)).map(_ =>
        (0 to rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 50)
    assert(m.merges.nonEmpty)
    val got = docs.select(col("doc_id"), col("text"),
        Bpe.encode(m, col("text")).as("t"))
      .as[(Long, String, Seq[String])].collect()
    got.foreach { case (_, text, toks) =>
      val expected = text.toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).map(_ + "</w>").mkString
      assert(toks.mkString == expected, s"text='$text' tokens=$toks")
    }
  }

  test("model round-trips through parquet; empty corpus yields the " +
    "identity tokenizer (characters + </w>)") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    try {
      Bpe.modelWrite(spark, m, s"$dir/model")
      val back = Bpe.modelRead(spark, s"$dir/model")
      assert(back.merges.toSeq == m.merges.toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    val empty = Bpe.train(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "text", numMerges = 5)
    assert(empty.merges.isEmpty)
    val chars = Seq((1L, "hi")).toDF("doc_id", "text")
      .select(Bpe.encode(empty, col("text")).as("t")).as[Seq[String]].head()
    assert(chars == Seq("h", "i", "</w>"))
  }
}
