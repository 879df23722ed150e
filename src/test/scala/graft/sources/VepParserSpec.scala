package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import java.nio.file.Files

class VepParserSpec extends SparkSpec {
  import spark.implicits._

  private val transcript1 =
    """{"gene_id":"ENSG1","gene_symbol":"SYM1","transcript_id":"ENST1",
      |"canonical":1,"biotype":"protein_coding","impact":"MODERATE",
      |"consequence_terms":["missense_variant","intron_variant"],
      |"distance":500,"tssdistance":1200,"codons":"gca/aca",
      |"amino_acids":"A/T","protein_end":42,"swissprot":["P12345.2"],
      |"trembl":null,"hgvsg":"1:g.100A>T","appris":"P1","mane_select":"NM_1",
      |"cadd_phred":23.5,"polyphen_score":0.8,
      |"polyphen_prediction":"probably_damaging","sift_score":0.02,
      |"sift_prediction":"deleterious","lof":"HC","lof_filter":null,
      |"conservation":4.5,
      |"alphamissense":{"am_pathogenicity":0.93,"am_class":"likely_pathogenic"}}
      |""".stripMargin.replaceAll("\n", "")

  private val transcript2 =
    """{"gene_id":"ENSG2","transcript_id":"ENST2","canonical":0,
      |"consequence_terms":["upstream_gene_variant"],"distance":4000}
      |""".stripMargin.replaceAll("\n", "")

  private val intergenic =
    """{"gene_id":null,"transcript_id":null,"canonical":null,
      |"consequence_terms":["intergenic_variant"],"cadd_phred":1.2,
      |"hgvsg":"2:g.200delins"}
      |""".stripMargin.replaceAll("\n", "")

  private val longAlt = "GACGTACGTACGT" * 10

  private val vepJson =
    s"""{"input":"1\\t100\\t.\\tA\\tT\\t.\\t.\\t.","most_severe_consequence":"missense_variant","colocated_variants":[{"id":"rs123","var_synonyms":{"OMIM":["600123.0001"],"ClinVar":["VCV000012345","RCV01"]}}],"transcript_consequences":[$transcript1,$transcript2]}
      |{"input":"2\\t200\\t.\\tG\\t$longAlt\\t.\\t.\\t.","most_severe_consequence":"intergenic_variant","colocated_variants":null,"transcript_consequences":null,"intergenic_consequences":[$intergenic]}
      |""".stripMargin

  private lazy val parsed = {
    val dir = Files.createTempDirectory("vep")
    Files.writeString(dir.resolve("vep.jsonl"), vepJson)
    VepParser.processVepOutput(spark, dir.toString, hashThreshold = 50).cache()
  }

  test("location, SO mapping, rsIDs and hashing") {
    assert(parsed.count() == 2)
    val r1 = parsed.filter(col("chromosome") === "1").head()
    assert(r1.getAs[String]("variantId") == "1_100_A_T")
    assert(r1.getAs[String]("mostSevereConsequenceId") == "SO_0001583")
    assert(r1.getSeq[String](r1.fieldIndex("rsIds")) == Seq("rs123"))
    assert(r1.getAs[String]("hgvsId") == "1:g.100A>T")
    val r2 = parsed.filter(col("chromosome") === "2").head()
    assert(r2.getAs[String]("variantId").startsWith("OTVAR_2_200_"))
    assert(r2.getAs[String]("mostSevereConsequenceId") == "SO_0001060")
    assert(r2.getAs[String]("hgvsId") == "2:g.200delins")
  }

  test("transcript consequences: canonical-only, scored, ordered, indexed") {
    val tc = parsed.filter(col("chromosome") === "1")
      .select(explode(col("transcriptConsequences")).as("t")).select("t.*")
      .collect()
    assert(tc.length == 1) // non-canonical ENSG2 dropped
    val t = tc.head
    assert(t.getAs[String]("targetId") == "ENSG1")
    assert(t.getSeq[String](t.fieldIndex("variantFunctionalConsequenceIds")) ==
      Seq("SO_0001583", "SO_0001627"))
    assert(math.abs(t.getAs[Float]("consequenceScore") - 0.66f) < 1e-6)
    assert(t.getAs[String]("aminoAcidChange") == "A42T")
    assert(t.getSeq[String](t.fieldIndex("uniprotAccessions")) == Seq("P12345"))
    assert(t.getAs[Boolean]("isEnsemblCanonical"))
    assert(t.getAs[Long]("distanceFromFootprint") == 500L)
    assert(t.getAs[Long]("distanceFromTss") == 1200L)
    assert(t.getAs[String]("maneSelect") == "NM_1")
    assert(t.getAs[String]("lofteePrediction") == "HC")
    assert(t.getAs[String]("approvedSymbol") == "SYM1")
    assert(t.getAs[Int]("transcriptIndex") == 1)
  }

  test("in-silico predictor family extracted into variantEffect") {
    val effects = parsed.filter(col("chromosome") === "1")
      .select(explode(col("variantEffect")).as("e"))
      .select("e.method", "e.assessment", "e.score", "e.normalisedScore")
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(effects("CADD")._2.contains(23.5f))
    assert(effects("PolyPhen")._1.contains("probably_damaging"))
    assert(effects("PolyPhen")._2.contains(0.8f))
    assert(math.abs(effects("PolyPhen")._3.get
      .asInstanceOf[Double] - 0.8) < 1e-6)
    assert(effects("SIFT")._1.contains("deleterious"))
    assert(effects("SIFT")._2.contains(0.02f))
    assert(effects("LOFTEE")._1.contains("HC"))
    assert(effects("LOFTEE")._2.isEmpty) // "HC" is not a numeric score
    assert(effects("GERP")._2.contains(4.5f))
    assert(effects("AlphaMissense")._1.contains("likely_pathogenic"))
    assert(effects("AlphaMissense")._2.contains(0.93f))
    assert(effects("VEP")._1.contains("missense_variant"))
    assert(effects("VEP")._2.contains(0.66f))
    // CADD 23.5 normalises to 23.5/40
    assert(math.abs(effects("CADD")._3.get.asInstanceOf[Double] - 0.5875) < 1e-9)

    val intergenicEffects = parsed.filter(col("chromosome") === "2")
      .select(explode(col("variantEffect")).as("e")).select("e.method")
      .as[String].collect().toSet
    assert(intergenicEffects == Set("CADD", "VEP")) // null GERP filtered
  }

  test("cross-references: ensembl, omim, VCV-only clinvar, protvar") {
    val xrefs = parsed.filter(col("chromosome") === "1")
      .select(explode(col("dbXrefs")).as("x")).select("x.id", "x.source")
      .as[(String, String)].collect().toSet
    assert(xrefs == Set(
      ("rs123", "ensembl_variation"),
      ("600123.0001", "omim"),
      ("VCV000012345", "clinvar"), // RCV01 filtered out
      ("1_100_A_T", "protvar"))) // missense variant, pre-hash id
  }

  test("variant descriptions composed per biotype") {
    val d = parsed.select("chromosome", "variantDescription")
      .as[(String, String)].collect().toMap
    assert(d("1") == "Missense variant 500 basepair away from SYM1, " +
      "causing amio-acid change: A42T with moderate impact. " +
      "A high-confidence loss-of-function variant by loftee.")
    assert(d("2") == "Intergenic variant no gene in window")
  }
}
