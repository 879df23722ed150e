package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Af(alleleFrequency: Double)

class GwasCatalogAssociationsSpec extends SparkSpec {
  import spark.implicits._
  import GwasCatalogAssociations._

  test("reverse complement matches reference doctest") {
    val out = Seq("A", "T", "G", "C", "AC", "GTaatc", "?")
      .toDF("a").select(reverseComplement(col("a"))).as[String].collect()
    assert(out.toSeq == Seq("T", "A", "C", "G", "GT", "GATTAC", "?"))
  }

  test("risk allele extraction and palindromic detection") {
    val risk = Seq("rs123-A", "rs9-?", "rs5-at").toDF("r")
      .select(extractRiskAllele(col("r"))).collect()
    assert(risk(0).getString(0) == "A")
    assert(risk(1).isNullAt(0))
    assert(risk(2).getString(0) == "AT")

    val pal = Seq(("A", Some("T")), ("AT", Some("AG")), ("AT", Some("AT")),
      ("CATATG", Some("CATATG")), ("-", None))
      .toDF("ref", "alt")
      .select(areAllelesPalindromic(col("ref"), col("alt"))).as[Boolean].collect()
    assert(pal.toSeq == Seq(true, false, true, true, false))
  }

  test("beta and odds-ratio harmonisation match reference doctests") {
    val beta = Seq(
      (0.5, "increase", false), (0.5, "decrease", false),
      (0.5, "decrease", true), (0.5, "increase", true))
      .toDF("e", "ci", "flip")
      .select(harmoniseBeta(col("e"), col("ci"), col("flip"))).as[Double].collect()
    // truth table: flip XOR decrease flips the sign
    assert(beta.toSeq == Seq(0.5, -0.5, 0.5, -0.5))

    val or = Seq((0.5, false), (0.5, true), (0.0, false), (0.0, true))
      .toDF("e", "flip")
      .select(harmoniseOddsRatio(col("e"), col("flip"))).as[Option[Double]].collect()
    assert(or.toSeq == Seq(Some(0.5), Some(2.0), Some(0.0), None))
  }

  test("effect harmonisation picks beta vs OR and drops palindromic") {
    val df = Seq(
      // risk matches ref + beta decrease -> flip beta: risk=A ref=A alt=G
      ("A", "A", "G", 0.5, "[0.2-0.8] unit decrease"),
      // OR with flip: risk matches ref -> reciprocal (C/A is not
      // palindromic; C/G would be — revcomp(G)=C)
      ("C", "C", "A", 2.0, "[1.5-3]"),
      // palindromic -> both null
      ("A", "A", "T", 0.5, "[0.2-0.8] unit increase"))
      .toDF("risk", "ref", "alt", "effect", "ci")
    val out = df.select(harmoniseEffect(col("risk"), col("ref"), col("alt"),
      col("effect"), col("ci")): _*).collect()
    assert(out(0).getDouble(0) == 0.5) // beta decrease + flip -> -(-0.5)... flip & increase -> -e; decrease&flip -> e
    assert(math.abs(out(1).getDouble(0) - math.log(0.5)) < 1e-12) // 1/2 OR -> ln
    assert(out(2).isNullAt(0))
  }

  test("rsID concordance and QC battery") {
    val conc = Seq(
      (Some(Seq("rs1")), Some(Seq("rs1", "rs2"))),
      (Some(Seq("rs1")), Some(Seq("rs3"))),
      (Some(Seq.empty[String]), Some(Seq("rs3"))),
      (Some(Seq("rs1")), Some(Seq.empty[String])))
      .toDF("gnomad", "gwas")
      .select(rsidsMatch(col("gnomad"), col("gwas"))).as[Boolean].collect()
    assert(conc.toSeq == Seq(true, false, true, true))

    val assoc = Seq(
      ("ok", Some("1"), Some(100), Some("A"), Some("G"), 1.0f, -10),
      ("subsig", Some("1"), Some(100), Some("A"), Some("G"), 1.0f, -5),
      ("noloc", None, None, Some("A"), Some("G"), 1.0f, -10),
      ("unmapped", Some("1"), Some(100), Some("A"), None, 1.0f, -10),
      ("palindromic", Some("1"), Some(100), Some("A"), Some("T"), 1.0f, -10))
      .toDF("name", "chromosome", "position", "referenceAllele",
        "alternateAllele", "pValueMantissa", "pValueExponent")
      .withColumn("qualityControls", lit(null).cast("array<string>"))
    val out = qcAll(assoc)
      .select(col("name"), col("qualityControls")).as[(String, Seq[String])]
      .collect().toMap
    assert(out("ok").isEmpty)
    assert(out("subsig") == Seq(Flags.SubSignificant))
    assert(out("noloc").contains(Flags.NoGenomicLocation))
    assert(out("unmapped").contains(Flags.NoMappedVariant))
    assert(out("palindromic") == Seq(Flags.PalindromicAlleles))
  }

  test("mapping helpers reproduce reference doctests") {
    // reference: associations.py:35-66, 301-455 doctests
    val pos = Seq((1, "A", "C"), (2, "AA", "C"), (3, "A", "AA"))
      .toDF("position", "reference", "alternate")
      .select(convertGnomadPositionToEnsembl(col("position"),
        col("reference"), col("alternate")).as("p"))
      .as[Int].collect().toSeq
    assert(pos == Seq(1, 3, 4))

    val rs = Seq(
      (1, Seq("rs123", "rs523"), Seq("rs123")),
      (2, Seq.empty[String], Seq("rs123")),
      (3, Seq("rs123", "rs523"), Seq.empty[String]),
      (4, Seq.empty[String], Seq.empty[String]))
      .toDF("id", "gnomad", "gwas")
      .select(col("id"), compareRsids(col("gnomad"), col("gwas")).as("m"))
      .as[(Int, Boolean)].collect().toMap
    assert(rs == Map(1 -> true, 2 -> false, 3 -> false, 4 -> false))

    val conc = Seq(
      ("A", Some("A"), Some("G")), ("A", Some("T"), Some("G")),
      ("A", Some("C"), Some("G")), ("A", Some("A"), Some("?")),
      (null.asInstanceOf[String], None, Some("A")))
      .toDF("risk", "ref", "alt")
      .select(checkConcordance(col("risk"), col("ref"), col("alt")))
      .as[Boolean].collect().toSeq
    assert(conc == Seq(true, true, false, true, true))

    val retain = Seq((1, false), (1, false), (2, false), (2, true),
      (3, true), (3, true))
      .toDF("id", "f")
      .select(col("id"), col("f"),
        flagMappingsToRetain(col("id"), col("f")).as("r"))
      .as[(Int, Boolean, Boolean)].collect().toSet
    assert(retain == Set((1, false, true), (2, false, false),
      (2, true, true), (3, true, true)))
  }

  test("rsID→GnomAD mapping picks the concordant highest-MAF candidate") {
    val assoc = Seq(
      // a1: two candidates at the position; only v2 matches the rsID
      ("a1", "1", "100", "rs11; rs99", "11", "rs11-A"),
      // a2: no rsID match anywhere, concordance keeps both; v4 wins on MAF
      ("a2", "1", "200", "rsX", "", "rsX-C"),
      // a3: no candidate position in GnomAD at all
      ("a3", "2", "999", "rs77", "77", "rs77-T"))
      .toDF("rowId", "CHR_ID", "CHR_POS", "SNPS", "SNP_ID_CURRENT",
        "STRONGEST SNP-RISK ALLELE")
    val vi = Seq(
      // discordant rsID AND discordant alleles (risk A vs C/G): dropped
      ("v1", "1", 100L, "C", "G", Seq("rs22"), Seq(Af(0.4))),
      ("v2", "1", 100L, "A", "C", Seq("rs11"), Seq(Af(0.2))),
      ("v3", "1", 200L, "C", "G", Seq("rs33"), Seq(Af(0.1))),
      ("v4", "1", 200L, "C", "T", Seq("rs44"), Seq(Af(0.7))))
      .toDF("variantId", "chromosome", "position", "referenceAllele",
        "alternateAllele", "rsIds", "alleleFrequencies")

    val out = GwasCatalogAssociations
      .mapVariantsToGnomadVariants(assoc, vi)
      .select(col("rowId"), col("variantId"))
      .as[(String, Option[String])].collect().toMap
    assert(out("a1").contains("v2")) // doubly-discordant v1 dropped despite MAF
    assert(out("a2").contains("v4")) // maxMaf(0.7)=0.3 > 0.1
    assert(out("a3").isEmpty)        // left join keeps unmapped rows
  }
}
