package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Biosample ontology (Uberon / Cell Ontology) graph: per-node
  * ancestor/descendant closure.
  *
  * The reference collects the adjacency map to the driver and walks it
  * inside a Python UDF (reference:
  * src/gentropy/datasource/biosample_ontologies/utils.py:12-142). Same
  * strategy here — ontologies are tiny (tens of thousands of nodes) —
  * but the broadcast map + iterative DFS run in a Scala UDF on
  * executors.
  */
object BiosampleOntology {

  /** Transitive closure from a node over a broadcast adjacency map. */
  private[sources] def reachable(graph: Map[String, Seq[String]],
                                 start: String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val stack = scala.collection.mutable.Stack(start)
    while (stack.nonEmpty) {
      val cur = stack.pop()
      graph.getOrElse(cur, Seq.empty).foreach { next =>
        if (seen.add(next)) stack.push(next)
      }
    }
    seen.toSeq
  }

  /** Annotate each node row with the transitive closure over
    * `linkCol` (an array of directly linked node ids).
    *
    * The adjacency map is COLLECTED to the driver and broadcast — the
    * right plan for an ontology (Uberon + Cell Ontology ≈ 50k nodes),
    * and a driver-killer if someone points it at a corpus-scale frame.
    * `maxNodes` guards that: the guard counts a `limit(maxNodes + 1)`
    * of the node column BEFORE the collect, so an over-cap input fails
    * loudly instead of OOMing the driver mid-collect — and the limit
    * short-circuits the scan, so a corpus-scale misuse pays only
    * maxNodes+1 rows of work to be refused (a full count would
    * evaluate the whole upstream plan twice per call). Real ontologies
    * sit 3 orders of magnitude under the default cap — zero behavior
    * change there. */
  def graphTraversal(spark: SparkSession, df: DataFrame, nodeCol: String,
                     linkCol: String, resultCol: String,
                     maxNodes: Long = 1000000L): DataFrame = {
    val capPlusOne = math.min(maxNodes, Int.MaxValue - 1L).toInt + 1
    val probed = df.select(col(nodeCol)).limit(capPlusOne).count()
    require(probed < capPlusOne,
      s"BiosampleOntology.graphTraversal: input has >$maxNodes nodes, " +
        s"over the $maxNodes driver-collect cap. This operator collects " +
        "the adjacency map to the driver (ontologies are ~50k nodes); " +
        "a frame this size is not an ontology — use a distributed " +
        "iterative closure instead, or raise maxNodes deliberately.")
    val adjacency = df.select(col(nodeCol), col(linkCol))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.getSeq[String](1)).getOrElse(Seq.empty).toSeq)
      .toMap
    val bc = spark.sparkContext.broadcast(adjacency)
    val closureUdf = udf((node: String) => reachable(bc.value, node))
    df.withColumn(resultCol, closureUdf(col(nodeCol)))
  }

  /** Parse an OBO-graphs JSON export (graphs[].nodes[] / edges[]) into
    * a biosample index with ancestors/descendants. */
  def fromJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val graphs = raw.select(explode_outer(col("graphs")).as("graph"))
    val nodes = graphs.select(
      col("graph.id").as("graphId"),
      explode_outer(col("graph.nodes")).as("node"))
      .select(
        element_at(split(col("node.id"), "/"), -1).as("biosampleId"),
        col("node.lbl").as("biosampleName"))
      .filter(col("biosampleId").isNotNull)
    val edges = graphs.select(explode_outer(col("graph.edges")).as("edge"))
      .filter(col("edge.pred") === "is_a")
      .select(
        element_at(split(col("edge.sub"), "/"), -1).as("child"),
        element_at(split(col("edge.obj"), "/"), -1).as("parent"))
    val parentsByChild = edges.groupBy(col("child").as("biosampleId"))
      .agg(collect_list("parent").as("parents"))
    val childrenByParent = edges.groupBy(col("parent").as("biosampleId"))
      .agg(collect_list("child").as("children"))

    val withLinks = nodes
      .join(parentsByChild, Seq("biosampleId"), "left")
      .join(childrenByParent, Seq("biosampleId"), "left")
      .withColumn("parents", coalesce(col("parents"), array()))
      .withColumn("children", coalesce(col("children"), array()))

    val withAncestors = graphTraversal(spark, withLinks,
      "biosampleId", "parents", "ancestors")
    graphTraversal(spark, withAncestors, "biosampleId", "children",
      "descendants")
  }
}
