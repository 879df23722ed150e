package graft

import graft.steps.Steps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end genetics-lifecycle chain benchmark, driven through the
  * SAME CLI entrypoint a production run uses (`Steps.runFromArgs` —
  * the spark-submit surface), over TPC-H-derived inputs at a chosen
  * scale dir. StepsSpec locks the chain's SEMANTICS on toy rows; this
  * main is the missing integration evidence: the reference's §3.1
  * production path (reference: src/gentropy/colocalisation.py:26-75
  * and the surrounding step configs) run stage-by-stage at data
  * scale, every stage reading the previous stage's parquet, with
  * wall-clock and row counts recorded per stage.
  *
  * Chain: sumstats → window_based_clumping → lead filter →
  * ld_annotation → pics → credible-set projection → colocalisation
  * (eCAVIAR) → l2g_feature_matrix → l2g_train → l2g_score.
  *
  * Input synthesis derives positions/variants from RAW lineitem keys,
  * so key-shifted ScaleUp clones grow lead counts, LD-index size,
  * overlap pairs, and the L2G matrix linearly while per-group density
  * (variants per window, tags per bucket, genes per locus) stays O(1)
  * — the 100 TB shape. The study space (20 studies: 10 GWAS, 10 eQTL)
  * and chromosome space (3) stay fixed: genomes don't grow with data.
  *
  * Usage (exactly how a cluster run would look, minus the master):
  * {{{
  * /opt/spark/bin/spark-submit --class graft.ChainBench \
  *   --master local[32] <jar> <tpchDir> <workDir>
  * }}}
  * Prints one JSON line: {"chain":"genetics","dir":...,"stages":
  * {name:{"sec":s,"rows":n}},"total_sec":...}.
  */
object ChainBench {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("target/chainbench")
    val spark = SparkSession.builder()
      .appName("graft-chain-bench")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Size shuffle partitions to the INPUT, not the core count — the
    // engine's stated scale contract ("size shuffle.partitions to the
    // corpus"). At 58M input rows a fixed 32 partitions put ~2M wide
    // rows in every shuffle partition and every early stage spilled:
    // the 10x->100x decade read a uniform ~13-19x per stage; with
    // ~500k rows per partition the same stages are near-linear. AQE
    // coalesces the small ones back down at the low end.
    val nInput = spark.read.parquet(s"${args.headOption
      .getOrElse("/root/testdata/sf0.1")}/lineitem.parquet").count()
    val shufflePartitions = math.min(1024L,
      math.max(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toLong,
        nInput / 500000L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
    System.err.println(s"[chain] input=$nInput rows -> " +
      s"shuffle.partitions=$shufflePartitions")

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    def record(name: String, sec: Double, outPath: String): Long = {
      val n = spark.read.parquet(outPath).count()
      stages(name) = (sec, n)
      System.err.println(f"[chain] $name%-24s $sec%8.2f s  rows=$n")
      n
    }

    // ---- input synthesis (prep, recorded like a stage: a real run
    // pays an ingestion cost here too) -------------------------------
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val sumstatsIn = s"$work/sumstats"
    val (_, tSynth) = timed {
      li.select(
          // 10 GWAS ("g*") + 10 eQTL ("e*") studies — fixed space
          concat(when(col("l_partkey") % 20 < 10, lit("g")).otherwise(lit("e")),
            col("l_partkey") % 20).as("studyId"),
          (col("l_suppkey") % 3).cast("string").as("chromosome"),
          (col("l_orderkey") * 4).cast("int").as("position"),
          (lit(1.0) + (col("l_partkey") % 899) / 100.0)
            .cast("float").as("pValueMantissa"),
          (-(col("l_orderkey") % 12) - 4).cast("int").as("pValueExponent"))
        .withColumn("variantId", concat(col("chromosome"), lit("_"),
          col("position"), lit("_A_T")))
        // several lineitems can alias the same (study, chrom, position)
        .dropDuplicates("studyId", "chromosome", "position")
        .write.mode("overwrite").parquet(sumstatsIn)
    }
    record("synthesize_sumstats", tSynth, sumstatsIn)

    // ---- window clumping → leads -----------------------------------
    val clumped = s"$work/clumped"
    val (_, t1) = timed(Steps.runFromArgs(spark, Seq("window_based_clumping",
      s"in=$sumstatsIn", s"out=$clumped", "distance=1000")))
    record("window_based_clumping", t1, clumped)

    val leads = s"$work/leads"
    val (_, t1b) = timed {
      spark.read.parquet(clumped)
        .filter(!array_contains(col("qualityControls"), "WINDOW_CLUMPED"))
        .write.mode("overwrite").parquet(leads)
    }
    val nLeads = record("lead_filter", t1b, leads)

    // ---- LD index + study index (derived from the lead space so the
    // index scales with the data, as a real LD panel subset would) ---
    val ldIndexIn = s"$work/ld_index"
    val (_, tLd) = timed {
      spark.read.parquet(leads)
        .select("variantId", "chromosome", "position").distinct()
        // self-tag (r=1.0) + a 5000-wide position-bucket tag (r=0.9):
        // nearby leads across studies share the bucket tag, creating
        // the cross-study credible-set overlaps coloc consumes, at
        // O(1) leads per bucket at any clone factor
        .select(col("variantId"), col("chromosome"),
          array(
            struct(col("variantId").as("tagVariantId"),
              array(struct(lit("nfe").as("population"), lit(1.0).as("r")))
                .as("rValues")),
            struct(concat(col("chromosome"), lit("_b"),
              (col("position") - col("position") % 5000), lit("_A_T"))
              .as("tagVariantId"),
              array(struct(lit("nfe").as("population"), lit(0.9).as("r")))
                .as("rValues"))).as("ldSet"))
        .write.mode("overwrite").parquet(ldIndexIn)
    }
    record("ld_index_build", tLd, ldIndexIn)

    val studiesIn = s"$work/studies"
    spark.read.parquet(sumstatsIn).select("studyId").distinct()
      .withColumn("ldPopulationStructure",
        array(struct(lit("nfe").as("ldPopulation"),
          lit(1.0).as("relativeSampleSize"))))
      .write.mode("overwrite").parquet(studiesIn)

    // ---- LD annotation ---------------------------------------------
    val annotated = s"$work/annotated"
    val (_, t2) = timed(Steps.runFromArgs(spark, Seq("ld_annotation",
      s"in=$leads", s"studies=$studiesIn", s"ld_index=$ldIndexIn",
      s"out=$annotated")))
    record("ld_annotation", t2, annotated)

    // ---- PICS -------------------------------------------------------
    val picsOut = s"$work/pics"
    val (_, t3) = timed(Steps.runFromArgs(spark, Seq("pics",
      s"in=$annotated", s"out=$picsOut")))
    record("pics", t3, picsOut)

    // ---- credible-set projection (reference StudyLocus schema) ------
    val credOut = s"$work/credible_sets"
    val (_, t3b) = timed {
      spark.read.parquet(picsOut).select(
          col("studyLocusId"), col("studyId"),
          when(col("studyId").startsWith("g"), "gwas").otherwise("eqtl")
            .as("studyType"),
          col("chromosome"), concat(lit("r"), col("chromosome")).as("region"),
          col("variantId"), col("position"),
          transform(col("locus"), t => struct(
            t.getField("variantId").as("variantId"),
            lit(null).cast("double").as("logBF"),
            t.getField("posteriorProbability").as("posteriorProbability"),
            lit(null).cast("double").as("beta"),
            lit(null).cast("float").as("pValueMantissa"),
            lit(null).cast("int").as("pValueExponent"))).as("locus"))
        .write.mode("overwrite").parquet(credOut)
    }
    record("credset_projection", t3b, credOut)

    // ---- colocalisation (eCAVIAR over credible-set overlaps) --------
    val colocOut = s"$work/coloc"
    val (_, t4) = timed(Steps.runFromArgs(spark, Seq("colocalisation",
      s"in=$credOut", s"out=$colocOut", "method=ecaviar")))
    record("colocalisation", t4, colocOut)

    // ---- L2G: distances → feature matrix → train → score ------------
    val distancesIn = s"$work/distances"
    val (_, tDist) = timed {
      spark.read.parquet(leads).select("variantId").distinct()
        .select(col("variantId"), explode(array(
          struct(concat(lit("gn_"), col("variantId")).as("geneId"),
            lit(5000L).as("distanceFromTss")),
          struct(concat(lit("gf_"), col("variantId")).as("geneId"),
            lit(250000L).as("distanceFromTss")))).as("g"))
        .select(col("variantId"), col("g.geneId"), col("g.distanceFromTss"))
        .write.mode("overwrite").parquet(distancesIn)
    }
    record("distance_index_build", tDist, distancesIn)

    val matrixOut = s"$work/l2g_matrix"
    val (_, t5) = timed(Steps.runFromArgs(spark, Seq("l2g_feature_matrix",
      s"credible_sets=$credOut", s"distances=$distancesIn",
      s"out=$matrixOut")))
    record("l2g_feature_matrix", t5, matrixOut)

    val labelledIn = s"$work/l2g_labelled"
    val (_, t5b) = timed {
      spark.read.parquet(matrixOut)
        .withColumn("goldStandardSet",
          when(col("geneId").startsWith("gn_"), "positive")
            .otherwise("negative"))
        .write.mode("overwrite").parquet(labelledIn)
    }
    record("l2g_labelling", t5b, labelledIn)

    val modelOut = s"$work/l2g_model"
    val (_, t6) = timed(Steps.runFromArgs(spark, Seq("l2g_train",
      s"in=$labelledIn", s"out=$modelOut", "cross_validate=false",
      "max_iter=10", "max_depth=3")))
    stages("l2g_train") = (t6, -1L)
    System.err.println(f"[chain] l2g_train               $t6%8.2f s")

    val scoresOut = s"$work/l2g_scores"
    val (_, t7) = timed(Steps.runFromArgs(spark, Seq("l2g_score",
      s"model=$modelOut", s"in=$matrixOut", s"out=$scoresOut")))
    val nScores = record("l2g_score", t7, scoresOut)

    // sanity: the chain must end with one score per (locus, gene) pair
    // and a learnable distance signal — a silent-garbage chain would
    // still "complete"
    val scores = spark.read.parquet(scoresOut)
    require(nScores > 0 && nScores == spark.read.parquet(matrixOut).count(),
      "chain sanity: score rows != matrix rows")
    val near = scores.filter(col("geneId").startsWith("gn_"))
      .agg(avg("score")).head().getDouble(0)
    val far = scores.filter(col("geneId").startsWith("gf_"))
      .agg(avg("score")).head().getDouble(0)
    require(near > far,
      f"chain sanity: near-gene mean score $near%.3f !> far $far%.3f")
    System.err.println(f"[chain] sanity: mean(score) near=$near%.3f far=$far%.3f leads=$nLeads")

    val js = stages.map { case (k, (s, n)) =>
      "\"" + k + "\":{\"sec\":" + f"$s%.2f" + ",\"rows\":" + n + "}"
    }.mkString("{", ",", "}")
    val total = stages.values.map(_._1).sum
    println(s"""{"chain":"genetics","dir":"$dir","stages":$js,""" +
      f""""total_sec":$total%.2f,"near_mean":$near%.4f,"far_mean":$far%.4f}""")
    spark.stop()
  }
}
