package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors the reference doctests and unit cases for the GWAS Catalog
  * study-index parser (reference: study_index.py docstrings,
  * study_splitter.py:21-82). */
class GwasCatalogStudyIndexSpec extends SparkSpec {
  import spark.implicits._

  test("parse_discovery_samples splits multi-ancestry counts evenly") {
    // reference doctest: study_index.py:52-72
    val df = Seq(
      ("s1", Seq(("European", 10), ("African", 10))),
      ("s2", Seq(("European, African, Asian", 100), ("European", 50))))
      .toDF("studyId", "raw")
      .select(col("studyId"),
        expr("transform(raw, t -> named_struct('ancestry', t._1, " +
          "'sampleSize', t._2))").as("discoverySampleSize"))
      .withColumn("parsed",
        GwasCatalogStudyIndex.parseDiscoverySamples(col("discoverySampleSize")))
    val out = df.select("studyId", "parsed").collect()
      .map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getString(0), x.getInt(1))).toMap).toMap
    assert(out("s1") == Map("European" -> 10, "African" -> 10))
    assert(out("s2") == Map("European" -> 83, "African" -> 33, "Asian" -> 33))
  }

  test("parse_cohorts dedups pipe-separated labels; parse_efos sorts ids") {
    val r = Seq(("BioME|CaPS|Estonia|FHS|UKB|GERA|GERA|GERA",
      "http://www.ebi.ac.uk/efo/EFO_0000002,http://www.ebi.ac.uk/efo/EFO_0000001"))
      .toDF("cohorts", "efos")
      .select(GwasCatalogStudyIndex.parseCohorts(col("cohorts")).as("c"),
        GwasCatalogStudyIndex.parseEfos(col("efos")).as("e"))
      .head
    assert(r.getSeq[String](0) ==
      Seq("BioME", "CaPS", "Estonia", "FHS", "UKB", "GERA"))
    assert(r.getSeq[String](1) == Seq("EFO_0000001", "EFO_0000002"))
  }

  test("study table parse + sample-size annotation") {
    val studies = Seq(
      ("GCST1", "123", "Doe J", "2020-01-01", "Nat", "T1", "trait one",
        "1,000 European cases, 2,000 European controls",
        "http://www.ebi.ac.uk/efo/EFO_1", null, "UKB|FHS"))
      .toDF("STUDY ACCESSION", "PUBMED ID", "FIRST AUTHOR", "DATE",
        "JOURNAL", "STUDY", "DISEASE/TRAIT", "INITIAL SAMPLE SIZE",
        "MAPPED_TRAIT_URI", "MAPPED BACKGROUND TRAIT URI", "COHORT")
    val out = GwasCatalogStudyIndex.annotateDiscoverySampleSizes(
      GwasCatalogStudyIndex.parseStudyTable(studies)).head
    assert(out.getAs[String]("studyId") == "GCST1")
    assert(out.getAs[Int]("nCases") == 1000)
    assert(out.getAs[Int]("nControls") == 2000)
    assert(out.getAs[Int]("nSamples") == 3000)
  }

  test("ancestry annotation pivots stages and maps LD populations") {
    val studies = Seq(("GCST1", "t")).toDF("studyId", "traitFromSource")
    val lut = Seq(
      ("GCST1", "initial", "European", 100L, "desc"),
      ("GCST1", "replication", "African", 50L, "desc"))
      .toDF("STUDY ACCESSION", "STAGE", "BROAD ANCESTRAL CATEGORY",
        "NUMBER OF INDIVIDUALS", "INITIAL SAMPLE DESCRIPTION")
    val out = GwasCatalogStudyIndex.annotateAncestries(studies, lut).head
    val disc = out.getSeq[Row](out.fieldIndex("discoverySamples"))
    assert(disc.map(r => (r.getString(0), r.getInt(1))) ==
      Seq(("European", 100)))
    assert(out.getSeq[Row](out.fieldIndex("ldPopulationStructure")).nonEmpty)
    val rep = out.getSeq[Row](out.fieldIndex("replicationSamples"))
    assert(rep.map(_.getString(0)) == Seq("African"))
  }

  test("curation annotation flags non-curated studies and updates type") {
    val studies = Seq(("GCST1", "gwas"), ("GCST2", "gwas"))
      .toDF("studyId", "studyType")
    val curation = Seq(("GCST1", "eqtl", Seq("flagA")))
      .toDF("studyId", "studyType", "analysisFlags")
    val out = GwasCatalogStudyIndex
      .annotateFromStudyCuration(studies, Some(curation))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("GCST1").getAs[String]("studyType") == "eqtl")
    val qc2 = out("GCST2").getSeq[String](
      out("GCST2").fieldIndex("qualityControls"))
    assert(qc2.contains(GwasCatalogStudyIndex.NoOtCurationFlag))
    assert(out("GCST1").getSeq[String](
      out("GCST1").fieldIndex("qualityControls")).isEmpty)
  }

  test("study splitter: sub-study ids, traits and EFOs") {
    val studies = Seq(
      ("GCST1", "base trait", Seq("EFO_1")),
      ("GCST2", "single trait", Seq("EFO_9")))
      .toDF("studyId", "traitFromSource", "traitFromSourceMappedIds")
    val assoc = Seq(
      ("GCST1", "trait A|p<1e-8|EFO_2/EFO_3"),
      ("GCST1", "trait B|no_pvalue_text|EFO_4"),
      ("GCST2", "only|no_pvalue_text|EFO_5"))
      .toDF("studyId", "subStudyDescription")
    val ann = GwasCatalogStudyIndex.splitAnnotation(studies, assoc)
      .collect().map(r => r.getAs[String]("subStudyDescription") -> r).toMap
    // reference quirk preserved: the running-frame count leaves the
    // FIRST sub-study unsuffixed (study_splitter.py:75-82 uses the
    // default range frame, so row 1 sees a count of 1)
    assert(ann("trait A|p<1e-8|EFO_2/EFO_3")
      .getAs[String]("updatedStudyId") == "GCST1")
    assert(ann("trait B|no_pvalue_text|EFO_4")
      .getAs[String]("updatedStudyId") == "GCST1_2")
    assert(ann("trait A|p<1e-8|EFO_2/EFO_3")
      .getAs[String]("traitFromSource") == "trait A [p<1e-8]")
    val efos = ann("trait A|p<1e-8|EFO_2/EFO_3")
    assert(efos.getSeq[String](efos.fieldIndex("traitFromSourceMappedIds")) ==
      Seq("EFO_2", "EFO_3"))
    assert(ann("trait B|no_pvalue_text|EFO_4")
      .getAs[String]("traitFromSource") == "trait B")
    // single sub-study keeps the original id
    assert(ann("only|no_pvalue_text|EFO_5")
      .getAs[String]("updatedStudyId") == "GCST2")
  }

  test("accession parsing takes the last GCST token") {
    val df = Seq(
      "./GCST90086001-GCST90087000/GCST90086758/harmonised/x.tsv.gz",
      "s3://sumstats/harmonised/GCST000568.parquet/")
      .toDF("path")
      .select(GwasCatalogStudyIndex.parseGwasCatalogStudyId("path").as("a"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("GCST90086758", "GCST000568"))
  }
}
