package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure `functions._` column compositions — codegen'd, no UDFs, so
  * they run at scan speed over a 100 TB `documents` table and push no
  * data to the driver.
  */
object TextAnalysis {

  /** Whitespace-delimited word tokens of the lowercased text. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digits, and punctuation each
    * count as one token — a cheap, deterministic proxy for subword
    * tokenizer counts. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for",
      "with", "as", "his", "on", "be", "at", "by", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del",
      "las", "por", "con", "una", "para", "es", "al", "como"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
      "dans", "qui", "que", "pour", "sur", "au", "pas", "plus"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "den", "mit", "ist",
      "des", "im", "nicht", "ein", "eine", "auf", "als", "auch", "es"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    val toks = tokens(text)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Heuristic language ID over {en,es,fr,de}: highest stopword ratio
    * wins; "und" (undetermined) when no stopwords hit at all. */
  def languageId(text: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map(l =>
      struct(stopwordRatio(text, l).as("score"), lit(l).as("lang")))
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: long-enough text, moderate
    * punctuation, some stopwords, sane mean word length. Weights are
    * heuristic; the point is the shape (cheap, columnar, monotone in
    * each signal). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(text, "en") * 5.0, lit(1.0))
    val meanWordLen = length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nTok, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    round(lengthScore * 0.3 + punctScore * 0.3 + swScore * 0.2 + wordLenScore * 0.2, 6)
  }

  /** Document fingerprint: 64-bit hash of the whitespace-normalised
    * lowercased text. Identical up to whitespace ⇒ identical prints. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Top-`k` TF-IDF terms per document: tf = term count in the doc,
    * idf = ln((N+1)/(df+1)) + 1 (the smoothed sklearn formulation —
    * never zero, so rare terms always outrank stopwords), ranked by
    * (tfidf desc, term asc) for determinism.
    *
    * Shape at 100 TB: the inverted-index pattern — one shuffle to the
    * (doc, term) counts, one map-side-combining shuffle to the term
    * document frequencies, one broadcast-or-shuffle join back (the
    * vocabulary is orders of magnitude smaller than the corpus), one
    * window top-k per document. No driver-side vocabulary state,
    * unlike MLlib's fitted `IDFModel` which collects the idf vector.
    */
  def tfIdfTopTerms(docs: DataFrame, textCol: String, idCol: String,
                    k: Int = 3): DataFrame = {
    val termCounts = docs
      .select(col(idCol).as("docId"), explode(tokens(col(textCol))).as("term"))
      .groupBy("docId", "term")
      .agg(count(lit(1)).as("tf"))
    val docFreq = termCounts.groupBy("term")
      .agg(count(lit(1)).as("df")) // termCounts is distinct per (doc, term)
    // corpus size as a lazy broadcast single-row join, not an eager
    // driver-side count(): keeps the whole op one deferred plan
    val nDocs = docs.agg(
      count_distinct(col(idCol)).cast("double").as("_nDocs"))
    val w = Window.partitionBy("docId")
      .orderBy(col("tfidf").desc, col("term"))
    termCounts
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log((col("_nDocs") + 1.0) / (col("df") + 1.0)) + 1.0)
      .withColumn("tfidf", col("tf") * col("idf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("docId", "rank", "term", "tf", "df", "tfidf")
  }

  /** Corpus-relative unigram log-probability per document (the mean
    * ln p(token) under the corpus' own unigram LM) — the classic
    * cheap fluency/quality signal: gibberish and boilerplate-heavy
    * docs sit far from the corpus mode; complements [[tfIdfTopTerms]]
    * with a corpus-global scalar. One token-keyed shuffle for the
    * term counts, one token-keyed join back (right side is
    * vocabulary-sized — AQE broadcasts it when small), one group by
    * doc. The exploded token frame is recomputed rather than cached:
    * at corpus scale it is larger than the corpus itself, so
    * re-tokenising (scan-speed codegen) beats materialising it. */
  def unigramLogProbScores(docs: DataFrame, textCol: String,
                           idCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("_tf"))
    val total = counts.agg(sum("_tf").as("_n"))
    toks
      .join(counts, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(avg(log(col("_tf").cast("double") / col("_n")))
          .as("unigramLogProb"),
        count(lit(1)).as("nTokens"))
  }
}
