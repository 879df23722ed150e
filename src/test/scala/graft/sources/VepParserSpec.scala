package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class VepParserSpec extends SparkSpec {
  import spark.implicits._

  private val vepJson =
    """{"input":"1\t100\t.\tA\tT\t.\t.\t.","most_severe_consequence":"missense_variant","colocated_variants":[{"id":"rs123","var_synonyms":{"OMIM":["600123.0001"],"ClinVar":["RCV01"]}}],"transcript_consequences":[{"gene_id":"ENSG1","transcript_id":"ENST1","canonical":1,"consequence_terms":["missense_variant"],"distance":500,"amino_acids":"A/T","protein_end":42,"swissprot":["P12345.2"],"trembl":null,"alphamissense":{"am_pathogenicity":0.93,"am_class":"likely_pathogenic"}},{"gene_id":"ENSG2","transcript_id":"ENST2","canonical":0,"consequence_terms":["upstream_gene_variant"],"distance":4000,"amino_acids":null,"protein_end":null,"swissprot":null,"trembl":["Q99999.1"],"alphamissense":{"am_pathogenicity":0.12,"am_class":"likely_benign"}}]}
      |{"input":"2\t200\t.\tG\tGACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACG\t.\t.\t.","most_severe_consequence":"intergenic_variant","colocated_variants":null,"transcript_consequences":null}
      |""".stripMargin

  test("VEP output parses to VariantIndex rows with all extractors") {
    val dir = Files.createTempDirectory("vep")
    Files.writeString(dir.resolve("vep.jsonl"), vepJson)
    val df = VepParser.processVepOutput(spark, dir.toString, hashThreshold = 50)

    assert(df.count() == 2)
    val r1 = df.filter(col("chromosome") === "1").head()
    assert(r1.getAs[String]("variantId") == "1_100_A_T")
    assert(r1.getAs[String]("mostSevereConsequence") == "missense_variant")
    assert(r1.getSeq[String](r1.fieldIndex("rsIds")) == Seq("rs123"))

    val tc = df.filter(col("chromosome") === "1")
      .select(explode(col("transcriptConsequences")).as("t"))
      .select("t.targetId", "t.isEnsemblCanonical", "t.aminoAcidChange",
        "t.uniprotAccessions")
      .collect()
    val byGene = tc.map(r => r.getString(0) ->
      (r.getBoolean(1), Option(r.getString(2)), r.getSeq[String](3))).toMap
    assert(byGene("ENSG1") == ((true, Some("A42T"), Seq("P12345"))))
    assert(byGene("ENSG2") == ((false, None, Seq("Q99999"))))

    val am = df.filter(col("chromosome") === "1")
      .select("alphaMissense.score").head.getDouble(0)
    assert(math.abs(am - 0.93) < 1e-12)

    val omim = df.filter(col("chromosome") === "1")
      .select(explode(col("dbXrefs")).as("x")).select("x.id", "x.source")
      .as[(String, String)].collect()
    assert(omim.toSeq == Seq(("600123.0001", "omim")))

    // long alt allele -> OTVAR hashed id with locatable prefix
    val r2 = df.filter(col("chromosome") === "2").head()
    assert(r2.getAs[String]("variantId").startsWith("OTVAR_2_200_"))
    assert(r2.getSeq[String](r2.fieldIndex("rsIds")).isEmpty)
  }
}
