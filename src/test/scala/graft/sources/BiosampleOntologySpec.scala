package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class BiosampleOntologySpec extends SparkSpec {
  import spark.implicits._

  test("OBO-graphs JSON parse with ancestor/descendant closure") {
    // tiny ontology: organ <- heart <- ventricle ; organ <- lung
    val json =
      """{"graphs": [{"id": "uberon.json", "nodes": [
        |{"id": "http://x/UBERON_0", "lbl": "organ"},
        |{"id": "http://x/UBERON_1", "lbl": "heart"},
        |{"id": "http://x/UBERON_2", "lbl": "ventricle"},
        |{"id": "http://x/UBERON_3", "lbl": "lung"}],
        |"edges": [
        |{"sub": "http://x/UBERON_1", "pred": "is_a", "obj": "http://x/UBERON_0"},
        |{"sub": "http://x/UBERON_2", "pred": "is_a", "obj": "http://x/UBERON_1"},
        |{"sub": "http://x/UBERON_3", "pred": "is_a", "obj": "http://x/UBERON_0"},
        |{"sub": "http://x/UBERON_3", "pred": "part_of", "obj": "http://x/UBERON_1"}]}]}
        |""".stripMargin
    val dir = Files.createTempDirectory("obo")
    Files.writeString(dir.resolve("onto.json"), json)
    val df = BiosampleOntology.fromJson(spark, dir.toString)
    assert(df.count() == 4)
    val byId = df.select("biosampleId", "ancestors", "descendants")
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[String](1).toSet, r.getSeq[String](2).toSet)).toMap
    // transitive ancestors of ventricle: heart, organ (part_of ignored)
    assert(byId("UBERON_2")._1 == Set("UBERON_1", "UBERON_0"))
    // descendants of organ: heart, ventricle, lung
    assert(byId("UBERON_0")._2 == Set("UBERON_1", "UBERON_2", "UBERON_3"))
    assert(byId("UBERON_3")._1 == Set("UBERON_0"))
    assert(byId("UBERON_2")._2.isEmpty)
  }

  test("graphTraversal refuses an over-cap input loudly (driver-collect guard)") {
    val big = spark.range(50)
      .select(concat(lit("N"), col("id")).as("node"),
        array().cast("array<string>").as("links"))
    // under the cap: traverses fine
    val ok = BiosampleOntology.graphTraversal(spark, big, "node", "links",
      "closure", maxNodes = 50)
    assert(ok.count() == 50)
    // over the cap: fails BEFORE collecting. The guard probes only
    // limit(maxNodes + 1) rows (short-circuits on corpus-scale
    // misuse), so the message reports ">cap nodes", not an exact count
    val e = intercept[IllegalArgumentException] {
      BiosampleOntology.graphTraversal(spark, big, "node", "links",
        "closure", maxNodes = 49)
    }
    assert(e.getMessage.contains(">49 nodes"))
    assert(e.getMessage.contains("49 driver-collect cap"))
  }
}
