package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRepetitionPiiSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: n-grams and short-doc guards") {
    val df = Seq("a b c d", "a b", "a", "").toDF("t")
      .select(TextAnalysis.wordNgrams(col("t"), 3).as("g"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty && rows(2).isEmpty && rows(3).isEmpty)
  }

  test("ngramRepetitionSignals: hand-computed fractions") {
    // "x y x y x y": bigrams = [x y, y x, x y, y x, x y] -> top "x y" 3/5
    // trigrams = [x y x, y x y, x y x, y x y] -> all duplicated: 4/4
    // "a b c": bigrams [a b, b c] top 1/2; trigram [a b c] dup 0/1
    // "p q": bigram [p q] top 1/1; no trigram -> null
    val docs = Seq(
      (1L, "x y x y x y"), (2L, "a b c"), (3L, "p q"), (4L, "solo")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetitionSignals(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 3.0 / 5, 1.0)))
    assert(out(2L) == ((2L, 0.5, 0.0)))
    assert(out(3L) == ((1L, 1.0, -1.0))) // too short for trigrams -> null
    assert(!out.contains(4L)) // <2 tokens: absent
    // per-document stats compute inside the scan: zero shuffles
    val plan = TextAnalysis.ngramRepetitionSignals(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("aggregate"),
      plan)
  }

  test("oovRates: top-K vocabulary with deterministic ties") {
    // corpus counts: a=4, b=2, c=1, d=1 -> K=2 vocab {a, b}
    val docs = Seq(
      (1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRates(docs, "text", "doc_id", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((4L, 0.25)) && out(2L) == ((4L, 0.25)))
    // K=3 breaks the c/d tie by token order: c in, d out
    val out3 = TextAnalysis.oovRates(docs, "text", "doc_id", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out3(1L) == 0.0 && out3(2L) == 0.25)
  }

  test("PII redaction: tags, counts, and ordering") {
    val df = Seq(
      "write to alice.smith+x@mail.example.org today",
      "server at 192.168.0.1 port 80",
      "call 555-0142 or 555-0199",
      "mixed a@b.co 10.0.0.7 555-1234",
      "clean text with no pii").toDF("t")
      .select(PiiRedaction.redact(col("t")).as("red"),
        PiiRedaction.emailCount(col("t")).as("e"),
        PiiRedaction.ipCount(col("t")).as("i"),
        PiiRedaction.phoneCount(col("t")).as("p"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "write to <EMAIL> today")
    assert(rows(1).getString(0) == "server at <IP> port 80")
    assert(rows(2).getString(0) == "call <PHONE> or <PHONE>")
    assert(rows(3).getString(0) == "mixed <EMAIL> <IP> <PHONE>")
    assert(rows(4).getString(0) == "clean text with no pii")
    assert(rows(3).getInt(1) == 1 && rows(3).getInt(2) == 1 && rows(3).getInt(3) == 1)
    assert(rows(4).getInt(1) == 0 && rows(4).getInt(2) == 0 && rows(4).getInt(3) == 0)
  }

  test("PII report over documents matches injection density") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.queries.Q.textPii(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val injected = out.filter(col("n_emails") === 1 && col("n_ips") === 1 &&
      col("n_phones") === 1).count()
    val clean = out.filter(col("n_emails") === 0 && col("n_ips") === 0 &&
      col("n_phones") === 0).count()
    assert(out.count() == n && injected + clean == n && injected > 0)
  }
}
