package graft.queries

/** DuckDB oracle SQL for every SQL-expressible query in [[Q]].
  *
  * Engine-parity rules mirrored from Q:
  *  - quantisation literal: CAST(FLOOR(x * 10^d + 0.500000001) AS BIGINT);
  *  - counts via count(*) / FILTER so DuckDB yields BIGINT (not HUGEINT
  *    as sum(CASE...) would);
  *  - mixed-case aliases quoted so DuckDB preserves them;
  *  - Spark's exact `percentile` = DuckDB `quantile_cont`.
  */
object Oracles {

  private def q(expr: String, d: Int): String =
    s"CAST(FLOOR(($expr) * 1e$d + 0.500000001) AS BIGINT)"

  val scanPrune: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(l_quantity AS BIGINT) AS qty, l_returnflag
      |FROM lineitem WHERE l_quantity > 45""".stripMargin

  val pvalueFilter: String =
    s"""WITH p AS (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |         (l_discount + 0.0015) AS pv,
      |         CAST(FLOOR(log10(l_discount + 0.0015)) AS INT) AS exponent
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |       ${q("pv / POWER(10.0, exponent)", 6)} AS m_q6, exponent
      |FROM p
      |WHERE exponent < -2 OR (exponent = -2 AND pv / POWER(10.0, exponent) <= 5.0)
      |""".stripMargin

  val regionFilter: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_partkey
      |FROM lineitem
      |WHERE l_partkey BETWEEN 50 AND 150
      |  AND l_partkey NOT BETWEEN 90 AND 99 AND l_returnflag <> 'A'""".stripMargin

  /** Mirrors Q.intervalBandJoin / plans.BandJoin: the band bucketing is
    * a pure execution-strategy change, so the oracle is the naive range
    * join DuckDB plans as an IEJoin. */
  val intervalBandJoin: String =
    s"""WITH p AS (
      |  SELECT l_suppkey % 3 AS chrom, (l_orderkey * 61) % 100000 AS pos,
      |         l_quantity
      |  FROM lineitem),
      |i AS (
      |  SELECT o_orderkey AS iv_id, o_custkey % 3 AS ichrom,
      |         (o_orderkey * 97) % 100000 AS lo
      |  FROM orders)
      |SELECT i.iv_id, count(*) AS n,
      |       ${q("sum(p.l_quantity)", 0)} AS qty_q0
      |FROM i JOIN p
      |  ON p.chrom = i.ichrom AND p.pos BETWEEN i.lo AND i.lo + 20
      |GROUP BY i.iv_id""".stripMargin

  /** Mirrors Q.skewJoin / SkewJoin.saltedJoin: salting is a pure
    * execution-strategy change, so the oracle is the plain join. */
  val skewJoin: String =
    s"""WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0
      |              ELSE l_orderkey % 1000 END AS k, l_extendedprice
      |  FROM lineitem),
      |d AS (SELECT p_partkey AS dk, p_type FROM part WHERE p_partkey < 1000)
      |SELECT d.p_type, count(*) AS n,
      |       ${q("sum(f.l_extendedprice)", 0)} AS price_q0
      |FROM f JOIN d ON f.k = d.dk
      |GROUP BY d.p_type""".stripMargin

  /** Mirrors Q.rollupStats: DuckDB ROLLUP produces the same null-keyed
    * subtotal rows as Spark's. */
  val rollupStats: String =
    """SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars
      |FROM documents GROUP BY ROLLUP(source, lang)""".stripMargin

  val selfJoinPairs: String =
    """SELECT a.user_id AS user_id, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND a.event_type <> b.event_type
      |GROUP BY 1""".stripMargin

  val outerAlign: String =
    """WITH po AS (SELECT o_custkey AS custkey, count(*) AS n_orders
      |            FROM orders GROUP BY 1),
      |     rich AS (SELECT c_custkey AS custkey, 1 AS is_rich
      |              FROM customer WHERE c_acctbal > 9000)
      |SELECT COALESCE(po.custkey, rich.custkey) AS custkey,
      |       COALESCE(n_orders, 0) AS n_orders,
      |       CAST(COALESCE(is_rich, 0) AS BIGINT) AS is_rich
      |FROM po FULL OUTER JOIN rich ON po.custkey = rich.custkey""".stripMargin

  val rangeJoin: String =
    s"""WITH bands AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS bandkey,
      |         CAST(n_regionkey % 5 AS BIGINT) AS chrom,
      |         n_nationkey * 400 AS lo, n_nationkey * 400 + 500 AS hi
      |  FROM nation),
      |li AS (SELECT l_suppkey % 5 AS chrom, (l_partkey * 97) % 10000 AS position,
      |              l_extendedprice FROM lineitem)
      |SELECT bandkey, count(*) AS n, ${q("sum(l_extendedprice)", 0)} AS revenue_q0
      |FROM li JOIN bands ON li.chrom = bands.chrom
      |                  AND li.position BETWEEN bands.lo AND bands.hi
      |GROUP BY 1""".stripMargin

  val semiJoin: String =
    """SELECT o_orderkey, o_orderstatus FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)""".stripMargin

  val starJoin: String =
    s"""SELECT r_name, count(*) AS n,
      |       ${q("sum(l_extendedprice * (1.0 - l_discount))", 0)} AS revenue_q0
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1""".stripMargin

  val validationJoin: String =
    """WITH rich AS (SELECT c_custkey, 1 AS hit FROM customer WHERE c_acctbal > 5000)
      |SELECT o_orderstatus,
      |       CAST(CASE WHEN hit IS NULL THEN 1 ELSE 0 END AS BIGINT) AS missing,
      |       count(*) AS n
      |FROM orders LEFT JOIN rich ON o_custkey = c_custkey
      |GROUP BY 1, 2""".stripMargin

  val collectSorted: String =
    """SELECT l_orderkey,
      |       array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), ',')
      |         AS quantities
      |FROM lineitem GROUP BY 1""".stripMargin

  val sumProducts: String =
    s"""SELECT l_returnflag, ${q("sum(l_extendedprice * l_discount)", 0)} AS sp_q0
      |FROM lineitem GROUP BY 1""".stripMargin

  val signAvg: String =
    s"""SELECT l_linestatus, ${q("avg(sign(l_quantity - 25.5))", 6)} AS avg_sign_q6
      |FROM lineitem GROUP BY 1""".stripMargin

  val statsBattery: String =
    s"""SELECT l_returnflag, count(*) AS n,
      |       ${q("avg(l_discount)", 6)} AS mean_q6,
      |       ${q("stddev_samp(l_discount)", 6)} AS sd_q6
      |FROM lineitem GROUP BY 1""".stripMargin

  val pivotEvents: String =
    """SELECT user_id % 10 AS bucket,
      |       count(*) FILTER (event_type = 'click') AS click,
      |       count(*) FILTER (event_type = 'error') AS error,
      |       count(*) FILTER (event_type = 'purchase') AS purchase,
      |       count(*) FILTER (event_type = 'signup') AS signup,
      |       count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY 1""".stripMargin

  val meltLineitem: String =
    """WITH b AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |                  l_quantity, l_discount, l_tax
      |           FROM lineitem WHERE l_orderkey < 100)
      |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM b
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM b
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM b""".stripMargin

  val top1PerGroup: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) = 1""".stripMargin

  val sessionize: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT user_id,
      |       count(*) FILTER (gap IS NULL OR gap > 600000000) AS n_sessions,
      |       count(*) AS n_events
      |FROM e GROUP BY 1""".stripMargin

  val rankScan: String =
    """SELECT o_custkey, o_orderkey,
      |       row_number() OVER w AS rnk,
      |       first_value(o_totalprice) OVER w - o_totalprice AS gap_to_best
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin

  val runningFrame: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_suppkey,
      |       max(CAST(l_quantity AS BIGINT)) OVER w AS run_max_qty,
      |       lag(l_orderkey) OVER w AS prev_okey
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity,
      |                      l_extendedprice, l_discount, l_tax
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  val medians: String =
    s"""SELECT l_returnflag,
      |       ${q("quantile_cont(l_extendedprice, 0.5)", 4)} AS p50_q4,
      |       ${q("quantile_cont(l_extendedprice, 0.9)", 4)} AS p90_q4
      |FROM lineitem GROUP BY 1""".stripMargin

  val setOps: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
      |UNION
      |SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier""".stripMargin

  val harmonicSum: String =
    s"""WITH r AS (
      |  SELECT l_orderkey, l_discount,
      |         row_number() OVER (PARTITION BY l_orderkey
      |                            ORDER BY l_discount DESC) AS rn
      |  FROM lineitem)
      |SELECT l_orderkey,
      |       ${q("sum(l_discount / (rn * rn)) / sum(1.0 / (rn * rn))", 6)}
      |         AS harmonic_q6
      |FROM r GROUP BY 1""".stripMargin

  val cumsumFlags: String =
    """WITH r AS (
      |  SELECT l_orderkey,
      |         COALESCE(sum(l_discount) OVER
      |           (PARTITION BY l_orderkey ORDER BY l_discount DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS prev
      |  FROM lineitem)
      |SELECT l_orderkey, count(*) FILTER (prev < 0.155) AS n_core
      |FROM r GROUP BY 1""".stripMargin

  val pvalueCodec: String =
    """WITH p AS (
      |  SELECT (l_partkey % 9) + 1 AS m, (l_suppkey % 30) + 2 AS e2
      |  FROM lineitem),
      |parsed AS (
      |  SELECT CAST(string_split(m || 'e-' || e2, 'e-')[1] AS BIGINT) AS mantissa,
      |         -CAST(string_split(m || 'e-' || e2, 'e-')[2] AS BIGINT) AS exponent
      |  FROM p)
      |SELECT mantissa, exponent, count(*) AS n FROM parsed GROUP BY 1, 2""".stripMargin

  /** Shared synthetic-overlap CTE (must mirror Q.synthOverlaps). */
  private val synthOverlapCte: String =
    """ov AS (
      |  SELECT * FROM (
      |    SELECT 'L' || (l_orderkey % 20) AS "leftStudyLocusId",
      |           'R' || (l_partkey % 10) AS "rightStudyLocusId",
      |           'eqtl' AS "rightStudyType",
      |           CAST(l_suppkey % 3 AS VARCHAR) AS chromosome,
      |           'v' || (l_partkey % 200) AS "tagVariantId",
      |           l_extendedprice / 5000 AS lbf,
      |           l_quantity / 10 AS rbf,
      |           l_discount * 9 AS lpp,
      |           l_tax * 10 AS rpp,
      |           l_extendedprice / 10000 - 2 AS lbeta,
      |           l_tax * 10 - 0.4 AS rbeta,
      |           row_number() OVER (PARTITION BY 'L' || (l_orderkey % 20),
      |                              'R' || (l_partkey % 10), 'v' || (l_partkey % 200)
      |                              ORDER BY l_orderkey, l_linenumber, l_suppkey,
      |                                       l_partkey, l_extendedprice,
      |                                       l_quantity, l_discount, l_tax) AS rn
      |    FROM lineitem)
      |  WHERE rn = 1)""".stripMargin

  private val betaRatioCte: String =
    s"""br AS (
      |  SELECT "leftStudyLocusId", "rightStudyLocusId", chromosome,
      |         avg(sign(lbeta / rbeta)) AS bra
      |  FROM ov
      |  WHERE lbeta IS NOT NULL AND rbeta IS NOT NULL
      |    AND lbeta <> 0 AND rbeta <> 0
      |  GROUP BY 1, 2, 3)""".stripMargin

  val coloc: String =
    s"""WITH $synthOverlapCte,
      |$betaRatioCte,
      |g0 AS (
      |  SELECT *, max(lbf) OVER w AS mx1, max(rbf) OVER w AS mx2,
      |         max(lbf + rbf) OVER w AS mx12
      |  FROM ov
      |  WINDOW w AS (PARTITION BY chromosome, "leftStudyLocusId",
      |               "rightStudyLocusId", "rightStudyType")),
      |g AS (
      |  SELECT chromosome, "leftStudyLocusId", "rightStudyLocusId",
      |         "rightStudyType",
      |         count(*) AS n,
      |         max(CASE WHEN lpp > 0.5 AND rpp > 0.5 THEN 1 ELSE 0 END) AS anyhigh,
      |         max(mx1) + ln(sum(exp(lbf - mx1))) AS ls1,
      |         max(mx2) + ln(sum(exp(rbf - mx2))) AS ls2,
      |         max(mx12) + ln(sum(exp(lbf + rbf - mx12))) AS ls12
      |  FROM g0 GROUP BY 1, 2, 3, 4),
      |h AS (
      |  SELECT *, ls1 + ls2 AS sumls, greatest(ls1 + ls2, ls12) AS mx,
      |         CASE WHEN ls1 + ls2 = ls12 THEN 1e-10
      |              ELSE greatest(ls1 + ls2, ls12)
      |                   + ln(exp(ls1 + ls2 - greatest(ls1 + ls2, ls12))
      |                        - exp(ls12 - greatest(ls1 + ls2, ls12)))
      |         END AS logdiff
      |  FROM g WHERE n > 5 OR anyhigh = 1),
      |bf AS (
      |  SELECT *, 0.0 AS lh0, ln(1e-4) + ls1 AS lh1, ln(1e-4) + ls2 AS lh2,
      |         ln(1e-4) + ln(1e-4) + logdiff AS lh3, ln(1e-5) + ls12 AS lh4
      |  FROM h),
      |post AS (
      |  SELECT *, greatest(lh0, lh1, lh2, lh3, lh4) AS hmax,
      |         exp(lh0 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh1 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh2 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh3 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh4 - greatest(lh0, lh1, lh2, lh3, lh4)) AS denom
      |  FROM bf)
      |SELECT post."leftStudyLocusId", post."rightStudyLocusId", post.chromosome,
      |       CAST(n AS BIGINT) AS "numberColocalisingVariants",
      |       ${q("exp(lh0 - hmax) / denom", 4)} AS h0_q4,
      |       ${q("exp(lh1 - hmax) / denom", 4)} AS h1_q4,
      |       ${q("exp(lh2 - hmax) / denom", 4)} AS h2_q4,
      |       ${q("exp(lh3 - hmax) / denom", 4)} AS h3_q4,
      |       ${q("exp(lh4 - hmax) / denom", 4)} AS h4_q4,
      |       ${q("bra", 6)} AS beta_ratio_q6
      |FROM post LEFT JOIN br
      |  ON post."leftStudyLocusId" = br."leftStudyLocusId"
      | AND post."rightStudyLocusId" = br."rightStudyLocusId"
      | AND post.chromosome = br.chromosome""".stripMargin

  val ecaviar: String =
    s"""WITH $synthOverlapCte,
      |$betaRatioCte,
      |agg AS (
      |  SELECT "leftStudyLocusId", "rightStudyLocusId", chromosome,
      |         count(*) AS n, sum(lpp * rpp) AS clpp
      |  FROM ov GROUP BY 1, 2, 3)
      |SELECT agg."leftStudyLocusId", agg."rightStudyLocusId", agg.chromosome,
      |       CAST(n AS BIGINT) AS "numberColocalisingVariants",
      |       ${q("clpp", 6)} AS clpp_q6,
      |       ${q("bra", 6)} AS beta_ratio_q6
      |FROM agg LEFT JOIN br
      |  ON agg."leftStudyLocusId" = br."leftStudyLocusId"
      | AND agg."rightStudyLocusId" = br."rightStudyLocusId"
      | AND agg.chromosome = br.chromosome""".stripMargin

  /** Shared synthetic-sumstats CTE (must mirror Q.synthSumstats). */
  private val synthSumstatsCte: String =
    """ss AS (
      |  SELECT 's' || (l_orderkey % 5) AS "studyId",
      |         CAST(l_suppkey % 3 AS VARCHAR) AS chromosome,
      |         (l_partkey * 97) % 1000000 AS position,
      |         'v' || l_orderkey || '_' || l_linenumber AS "variantId",
      |         CAST((l_partkey % 90) / 10.0 + 1.0 AS REAL) AS mant,
      |         CAST(-(l_suppkey % 12) - 4 AS INT) AS expo,
      |         l_extendedprice / 5000 - 10 AS beta,
      |         l_tax + 0.01 AS se,
      |         l_orderkey, l_linenumber
      |  FROM lineitem)""".stripMargin

  val clusterTop1: String =
    s"""WITH $synthSumstatsCte,
      |cl AS (
      |  SELECT *,
      |         CASE WHEN position - lag(position) OVER w IS NULL
      |                OR position - lag(position) OVER w > 10000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM ss
      |  WINDOW w AS (PARTITION BY "studyId", chromosome
      |               ORDER BY position, l_orderkey, l_linenumber)),
      |cl2 AS (
      |  SELECT *, CAST(sum(is_new) OVER
      |    (PARTITION BY "studyId", chromosome
      |     ORDER BY position, l_orderkey, l_linenumber
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cluster
      |  FROM cl),
      |ranked AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY "studyId", chromosome, cluster
      |     ORDER BY expo, mant, position, l_orderkey, l_linenumber) AS rnk,
      |         count(*) OVER (PARTITION BY "studyId", chromosome, cluster)
      |           AS n_in_cluster
      |  FROM cl2)
      |SELECT "studyId", chromosome, cluster,
      |       CAST(position AS BIGINT) AS lead_position,
      |       CAST(expo AS BIGINT) AS lead_exponent, n_in_cluster
      |FROM ranked WHERE rnk = 1""".stripMargin

  val qcMetrics: String =
    s"""WITH $synthSumstatsCte
      |SELECT "studyId",
      |       ${q("avg(beta)", 6)} AS mean_beta_q6,
      |       count(*) AS n_variants,
      |       count(*) FILTER (log10(mant) + expo <= log10(5e-8)) AS n_variants_sig,
      |       ${q("quantile_cont((beta / se) * (beta / se), 0.5) / 0.4549364231195724", 6)}
      |         AS gc_lambda_q6
      |FROM ss GROUP BY 1""".stripMargin

  /** Mirrors Q.sanityFilterQ / SumstatQC.sanityFilter: the synthetic
    * sumstats with each malformation branch planted, then the full
    * filter battery (non-null components, beta ≠ 0, SE > 0,
    * 0 < p ≤ 1, non-NaN beta/SE). NaN compares greater-than-zero in
    * both engines; the isnan guard is what drops it. */
  val sanityFilter: String =
    s"""WITH $synthSumstatsCte,
      |mut AS (
      |  SELECT "variantId", "studyId",
      |    CASE WHEN l_orderkey % 97 = 0 THEN 0.0
      |         WHEN l_orderkey % 73 = 0 THEN 'NaN'::DOUBLE
      |         ELSE beta END AS beta,
      |    CASE WHEN l_orderkey % 89 = 0 THEN -0.5 ELSE se END AS se,
      |    CASE WHEN l_orderkey % 83 = 0 THEN NULL ELSE mant END AS mant,
      |    CASE WHEN l_orderkey % 79 = 0 THEN 0 ELSE expo END AS expo
      |  FROM ss)
      |SELECT "variantId", "studyId",
      |       ${q("beta", 6)} AS beta_q6, ${q("se", 6)} AS se_q6,
      |       ${q("CAST(mant AS DOUBLE)", 6)} AS mantissa_q6,
      |       CAST(expo AS BIGINT) AS exponent
      |FROM mut
      |WHERE beta IS NOT NULL AND se IS NOT NULL
      |  AND mant IS NOT NULL AND expo IS NOT NULL
      |  AND beta <> 0 AND se > 0
      |  AND mant * POWER(10.0, expo) > 0 AND mant * POWER(10.0, expo) <= 1
      |  AND NOT isnan(beta) AND NOT isnan(se)""".stripMargin

  /** Mirrors Q.credsetExtraction: the credible-set extraction suffix
    * (per-effect 99%-PIP cumsum sets, lead election, purity over the
    * LD block, logBF filter, lead dedup, high-LD lead removal) over
    * the SAME planted kernel outputs. Every planted quantity is
    * integer-derived so both engines compute bit-identical doubles;
    * Scala's stable sort ties (equal pip) resolve to ascending index —
    * replicated by the explicit `pip DESC, i ASC` orderings. The skip
    * rule (only the top effect is exempt from the lbf threshold) and
    * the later logBF filter collapse to `lbf >= 2.0` because the index
    * is consumed either way and the exempt top set is then filtered by
    * the same bound. With L = 2 the iterative high-LD removal scan
    * reduces to one pairwise test: doom the weaker lead (|z| desc,
    * cs_index asc — neglogp is monotone in |z|) when the leads sit
    * within r² ≥ 0.9.
    *
    * BOUNDARY-MARGIN REQUIREMENT for the planted pip constants: the
    * kept-set cut compares the windowed cumulative SUM(pip) against
    * 0.99 unquantized, and windowed-sum float association can differ
    * between DuckDB (segment-tree aggregation) and Scala's sequential
    * loop — a planted pip whose cumsum lands ulp-close to 0.99 would
    * flip set membership between the engines. Anyone re-planting the
    * `r1`/`raw4` distribution must keep every per-(k,l) cum_before
    * comfortably away from the boundary: CredsetExtractionMarginSpec
    * asserts min |cum_before − 0.99| > 1e-7 over the locus sizes that
    * occur at sf0.001/0.01/0.1 (the current plant's floor is 8.6e-7 at
    * a 155-variant locus — ~1e9 ulps of guard band against the ~1e-14
    * scale of summation-order drift); keep it green after any
    * replant. */
  /** Mirrors Q.picsRelational / PICS.finemapFlat with the exp(−x²/2)
    * sf surrogate: neglogp from the p-value codec (−(log10(m)+e), m/e
    * derived from the groupBy key), the r² ≥ 0.5 / usable-neglogp
    * filter, μ = nlp·r², σ = |√(1−(√r²)^6.4)·√nlp/2| (0 → 0.001),
    * rel = 2·exp(−x²/2), per-locus window normalisation, and
    * standardError = 10^−σ. Parenthesisation mirrors the engine's
    * column expressions op for op; only q6 quantisation absorbs
    * sub-ulp libm drift (pow/log10/exp). */
  val picsRelational: String =
    s"""WITH tags AS (
      |  SELECT l_orderkey AS k,
      |         'v' || CAST(l_partkey AS VARCHAR) AS variant_id,
      |         l_discount * 10 AS r2,
      |         -(log10(CAST((l_orderkey % 9) + 1 AS DOUBLE))
      |           + CAST(-(l_orderkey % 12) - 4 AS DOUBLE)) AS nlp
      |  FROM lineitem),
      |base AS (
      |  SELECT * FROM tags
      |  WHERE r2 IS NOT NULL AND r2 >= 0.5
      |    AND nlp IS NOT NULL AND nlp <> 0),
      |calc AS (
      |  SELECT *, nlp * r2 AS mu,
      |         CASE WHEN abs(sqrt(1.0 - pow(sqrt(r2), 6.4)) * sqrt(nlp) / 2) = 0
      |              THEN 0.001
      |              ELSE abs(sqrt(1.0 - pow(sqrt(r2), 6.4)) * sqrt(nlp) / 2)
      |         END AS sd
      |  FROM base),
      |rels AS (
      |  SELECT *,
      |         exp(-(((nlp - mu) / sd) * ((nlp - mu) / sd)) / 2) * 2 AS rel
      |  FROM calc),
      |tot AS (SELECT *, SUM(rel) OVER (PARTITION BY k) AS total FROM rels)
      |SELECT 'L' || CAST(k AS VARCHAR) AS "studyLocusId",
      |       variant_id AS "variantId",
      |       ${q("r2", 6)} AS r2_q6,
      |       ${q("pow(10.0, -sd)", 6)} AS se_q6,
      |       ${q("CASE WHEN total <> 0 THEN rel / total END", 6)} AS pp_q6
      |FROM tot""".stripMargin

  val credsetExtraction: String =
    s"""WITH vars AS (
      |  SELECT CAST(l_orderkey % 8 AS INT) AS k,
      |         'v' || CAST(l_orderkey AS VARCHAR) AS variant_id
      |  FROM lineitem
      |  WHERE l_orderkey % 13 = 0 AND l_linenumber = 1
      |    AND l_orderkey <= 26000),
      |idxed AS (
      |  SELECT k, variant_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY variant_id)
      |              - 1 AS INT) AS i
      |  FROM vars),
      |base AS (
      |  SELECT k, variant_id, i, l,
      |         CAST(((i*7 + l*3 + k*5) % 11) + 1 AS DOUBLE) AS r1,
      |         1.0 + ((k + 2*l) % 4) AS lbf,
      |         (i - 2*l) * 0.1 AS mu,
      |         1.0 + (i % 5) * 1.5 AS z
      |  FROM idxed CROSS JOIN (SELECT 0 AS l UNION ALL SELECT 1) eff),
      |raws AS (SELECT *, r1*r1*r1*r1 AS raw4 FROM base),
      |pips AS (
      |  SELECT *, raw4 / SUM(raw4) OVER (PARTITION BY k, l) AS pip
      |  FROM raws),
      |ordered AS (
      |  SELECT *,
      |         COALESCE(SUM(pip) OVER (PARTITION BY k, l
      |           ORDER BY pip DESC, i ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS cum_before,
      |         ROW_NUMBER() OVER (PARTITION BY k, l
      |           ORDER BY pip DESC, i ASC) AS rk
      |  FROM pips),
      |kept AS (SELECT * FROM ordered WHERE cum_before < 0.99),
      |eff AS (
      |  SELECT k, l, lbf,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY k
      |           ORDER BY lbf DESC, l ASC) AS BIGINT) AS cs_index
      |  FROM (SELECT DISTINCT k, l, lbf FROM base)),
      |leadrow AS (SELECT k, l, variant_id, i, mu, z FROM kept WHERE rk = 1),
      |purity AS (
      |  SELECT a.k, a.l,
      |         SUM(EXP(-ABS(a.i - b.i) / 60.0)
      |             * EXP(-ABS(a.i - b.i) / 60.0)) AS s,
      |         MIN(EXP(-ABS(a.i - b.i) / 60.0)
      |             * EXP(-ABS(a.i - b.i) / 60.0)) AS mn,
      |         COUNT(*) AS npairs
      |  FROM kept a JOIN kept b ON a.k = b.k AND a.l = b.l
      |  GROUP BY a.k, a.l),
      |tagagg AS (
      |  SELECT k, l, COUNT(*) AS tag_count,
      |         STRING_AGG(variant_id, ',' ORDER BY pip DESC, i ASC) AS tags
      |  FROM kept GROUP BY k, l),
      |sets AS (
      |  SELECT e.k, e.cs_index, lr.variant_id, lr.i AS lead_i,
      |         lr.mu AS beta, e.lbf * 0.4342944819 AS lbf10,
      |         p.s / p.npairs AS pur_mean, p.mn AS pur_min, lr.z,
      |         t.tag_count, t.tags
      |  FROM eff e
      |  JOIN leadrow lr ON lr.k = e.k AND lr.l = e.l
      |  JOIN purity p ON p.k = e.k AND p.l = e.l
      |  JOIN tagagg t ON t.k = e.k AND t.l = e.l
      |  WHERE e.lbf >= 2.0),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k, variant_id
      |      ORDER BY cs_index) AS dr FROM sets) WHERE dr = 1),
      |doomed AS (
      |  SELECT b.k, b.cs_index
      |  FROM dedup a JOIN dedup b ON a.k = b.k
      |  WHERE (ABS(a.z) > ABS(b.z)
      |         OR (ABS(a.z) = ABS(b.z) AND a.cs_index < b.cs_index))
      |    AND EXP(-ABS(a.lead_i - b.lead_i) / 60.0)
      |        * EXP(-ABS(a.lead_i - b.lead_i) / 60.0) >= 0.9)
      |SELECT 'LK' || CAST(d.k AS VARCHAR) AS locus_id, d.cs_index,
      |       d.variant_id,
      |       ${q("d.beta", 6)} AS beta_q6,
      |       ${q("d.lbf10", 6)} AS lbf_q6,
      |       ${q("d.pur_mean", 6)} AS purity_mean_q6,
      |       ${q("d.pur_min", 6)} AS purity_min_q6,
      |       ${q("d.z", 6)} AS z_q6,
      |       d.tag_count, d.tags
      |FROM dedup d
      |LEFT JOIN doomed x ON x.k = d.k AND x.cs_index = d.cs_index
      |WHERE x.k IS NULL""".stripMargin

  val dedupExact: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1""".stripMargin

  val ngramJaccard: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(l) AS tk, generate_subscripts(l, 1) AS i
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                           x -> x <> '') AS l
      |        FROM documents)),
      |sh0 AS (
      |  SELECT doc_id,
      |         tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w
      |           AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(tk, 2) OVER w IS NOT NULL),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS "idA", b.doc_id AS "idB", count(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT "idA", "idB",
      |       ${q("c * 1.0 / (sa.n + sb.n - c)", 6)} AS jaccard_q6
      |FROM common
      |JOIN sizes sa ON sa.doc_id = "idA"
      |JOIN sizes sb ON sb.doc_id = "idB"
      |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.4""".stripMargin

  /** Mirrors Q.dedupContainment / Dedup.containmentPairs: same
    * shingle CTEs as [[ngramJaccard]], then both directions of each
    * undirected candidate pair scored as |∩| / |sub|. */
  val dedupContainment: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(l) AS tk, generate_subscripts(l, 1) AS i
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                           x -> x <> '') AS l
      |        FROM documents)),
      |sh0 AS (
      |  SELECT doc_id,
      |         tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w
      |           AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(tk, 2) OVER w IS NOT NULL),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT ida, idb, c, sa.n AS na, sb.n AS nb
      |  FROM common
      |  JOIN sizes sa ON sa.doc_id = ida
      |  JOIN sizes sb ON sb.doc_id = idb),
      |dirs AS (
      |  SELECT ida AS id_sub, idb AS id_super, c * 1.0 / na AS containment
      |  FROM pairs
      |  UNION ALL
      |  SELECT idb, ida, c * 1.0 / nb FROM pairs)
      |SELECT id_sub, id_super, ${q("containment", 6)} AS containment_q6
      |FROM dirs WHERE containment >= 0.5""".stripMargin

  /** Mirrors Q.decontamination + Decontamination.contaminationPairs:
    * distinct 3-gram shingles per doc, benchmark = doc_id % 37 subset,
    * coverage = overlap / benchmark shingle count. */
  val decontamination: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(l) AS tk, generate_subscripts(l, 1) AS i
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                           x -> x <> '') AS l
      |        FROM documents)),
      |sh0 AS (
      |  SELECT doc_id,
      |         tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w
      |           AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(tk, 2) OVER w IS NOT NULL),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      |bench AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 37 = 0),
      |bsize AS (SELECT doc_id, count(*) AS n FROM bench GROUP BY 1),
      |common AS (
      |  SELECT c.doc_id AS cid, b.doc_id AS bid, count(*) AS ov
      |  FROM sh c JOIN bench b ON c.shingle = b.shingle
      |  GROUP BY 1, 2)
      |SELECT cid AS "corpusId", bid AS "benchId", ov AS overlap,
      |       n AS "benchShingles", ${q("ov * 1.0 / n", 6)} AS coverage_q6
      |FROM common JOIN bsize ON bsize.doc_id = bid
      |WHERE cid <> bid AND ov * 1.0 / n >= 0.6""".stripMargin

  /** Mirrors Q.tfidfTopTerms + TextAnalysis.tfIdfTopTerms: smoothed
    * sklearn idf, top-3 per doc by (tfidf desc, term asc). */
  val tfidfTopTerms: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                            x -> x <> '')) AS term
      |  FROM documents),
      |tc AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT tc.doc_id, tc.term, tc.tf, dfreq.df,
      |         tc.tf * (ln((n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS tfidf
      |  FROM tc JOIN dfreq USING (term) CROSS JOIN nd),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |            ORDER BY tfidf DESC, term) AS rk
      |  FROM scored)
      |SELECT doc_id AS "docId", rk AS rank, term, tf, df,
      |       ${q("tfidf", 6)} AS tfidf_q6
      |FROM ranked WHERE rk <= 3""".stripMargin

  /** Mirrors Q.textQualityRules + TextAnalysis.qualityRuleFlags:
    * Gopher-style hard rules — token count in [30, 100000], mean word
    * length in [3, 10], punct ratio ≤ 0.2, en-stopword ratio ≥ 0.02,
    * alpha-token fraction ≥ 0.8 — as int flags plus the conjunction. */
  val textQualityRules: String =
    raw"""WITH b AS (
      |  SELECT doc_id, text,
      |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                    x -> x <> ''))::DOUBLE AS n_tok,
      |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> x IN ('the','of','and','to','in','is','that','it','was','for',
      |        'with','as','his','on','be','at','by','this')))::DOUBLE AS n_sw,
      |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> x <> '' AND regexp_matches(x, '[a-z]')))::DOUBLE AS n_alpha
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(n_tok BETWEEN 30 AND 100000 AS INT) AS tokens_ok,
      |    CAST(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
      |           / greatest(n_tok, 1.0) BETWEEN 3.0 AND 10.0 AS INT) AS word_len_ok,
      |    CAST(((length(text)
      |           - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::DOUBLE
      |           / greatest(length(text), 1)) <= 0.2 AS INT) AS punct_ok,
      |    CAST(n_sw / greatest(n_tok, 1.0) >= 0.02 AS INT) AS stopword_ok,
      |    CAST(n_alpha / greatest(n_tok, 1.0) >= 0.8 AS INT) AS alpha_ok
      |  FROM b)
      |SELECT doc_id, tokens_ok, word_len_ok, punct_ok, stopword_ok, alpha_ok,
      |       tokens_ok * word_len_ok * punct_ok * stopword_ok * alpha_ok
      |         AS passes
      |FROM f""".stripMargin

  /** Mirrors Q.textChunks + TextAnalysis.chunkDocuments: 12-token
    * windows advancing by 9 (3-token overlap); chunk count =
    * ceil(max(n − overlap, 1) / stride); empty docs yield no chunks. */
  val textChunks: String =
    raw"""WITH tk AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |p AS (SELECT doc_id, t,
      |             CAST(ceil(greatest(len(t) - 3, 1) / 9.0) AS BIGINT) AS nc
      |      FROM tk WHERE len(t) > 0),
      |c AS (SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
      |             array_to_string(
      |               t[(CAST(u.i AS INT)*9+1):(CAST(u.i AS INT)*9+12)], ' ')
      |               AS chunk_text
      |      FROM p, LATERAL unnest(range(0, nc)) AS u(i))
      |SELECT doc_id, chunk_idx, chunk_text,
      |       len(list_filter(string_split(chunk_text, ' '), x -> x <> ''))::BIGINT
      |         AS n_tokens
      |FROM c""".stripMargin

  /** Mirrors Q.pcaCov + plans.VectorOuterSumAgg: upper-triangle
    * covariance of the embedding corpus — sum(xᵢxⱼ)/n − (Σxᵢ/n)(Σxⱼ/n),
    * the exact arithmetic pcaFit derives from the one-pass sufficient
    * statistic. */
  val pcaCov: String =
    s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT count(*)::DOUBLE AS n FROM e),
      |idx AS (SELECT unnest(range(0, 64)) AS i),
      |m AS (SELECT i, sum(v[CAST(i AS INT)+1]) AS s
      |      FROM e CROSS JOIN idx GROUP BY i),
      |o AS (SELECT a.i AS i, b.i AS j,
      |             sum(v[CAST(a.i AS INT)+1] * v[CAST(b.i AS INT)+1]) AS so
      |      FROM e CROSS JOIN idx a CROSS JOIN idx b WHERE b.i >= a.i
      |      GROUP BY 1, 2)
      |SELECT CAST(o.i AS BIGINT) AS i, CAST(o.j AS BIGINT) AS j,
      |       ${q("o.so / n - (ma.s / n) * (mb.s / n)", 6)} AS cov_q6
      |FROM o JOIN m ma ON ma.i = o.i JOIN m mb ON mb.i = o.j CROSS JOIN n
      |""".stripMargin

  /** Mirrors Q.kmeansStep + Similarity.kmeansAssign: squared-L2 argmin
    * assignment to the (vec_id % 100 == 0) seed centroids, ties to the
    * lower cell index (list_distance is IEEE sqrt of the same
    * index-order sum, and sqrt is monotone, so the argmin agrees),
    * then the per-(cell, dim) mean and population of one Lloyd
    * update. */
  val kmeansStep: String =
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |c0 AS (SELECT id AS cent_id, v AS cv FROM e
      |       WHERE id % 100 = 0 AND id < 2000),
      |c AS (SELECT cent_id, cv,
      |             row_number() OVER (ORDER BY cent_id) - 1 AS cell FROM c0),
      |sim AS (
      |  SELECT e.id, e.v, c.cell,
      |         row_number() OVER (PARTITION BY e.id
      |           ORDER BY list_distance(e.v, c.cv) ASC, c.cell) AS rk
      |  FROM e CROSS JOIN c),
      |a AS (SELECT id, v, cell FROM sim WHERE rk = 1),
      |x AS (SELECT cell, unnest(range(0, len(v))) AS pos, unnest(v) AS val FROM a)
      |SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
      |       count(*) AS n, ${q("avg(val)", 6)} AS mean_q6
      |FROM x GROUP BY 1, 2""".stripMargin

  /** Mirrors Q.searchBm25 + Search.bm25TopK: Okapi BM25 (Lucene
    * non-negative idf), k1=1.2, b=0.75, top-10 per query, ties toward
    * the smaller doc_id. Arithmetic literals are written in the same
    * shape the operator computes them ((1.2 + 1.0), (1.0 - 0.75))
    * so both engines evaluate bit-identical doubles. */
  val searchBm25: String =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      |qs AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'spark window agg'),
      |                             (CAST(2 AS BIGINT), 'customer order query'),
      |                             (CAST(3 AS BIGINT), 'vector hash join'))
      |       AS v(query_id, qtext)),
      |qt AS (
      |  SELECT query_id, unnest(list_distinct(list_filter(
      |           string_split_regex(lower(trim(qtext)), '\s+'), x -> x <> ''))) AS term
      |  FROM qs),
      |dfreq AS (SELECT term, count(*) AS df FROM tf
      |          WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
      |scored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
      |             (tf * (1.2 + 1.0)) /
      |             (tf + (dl / avgdl * 0.75 + (1.0 - 0.75)) * 1.2)) AS score
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |          JOIN dl USING (doc_id) CROSS JOIN stats
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |            ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |SELECT query_id, rk AS rank, doc_id, ${q("score", 6)} AS score_q6
      |FROM ranked WHERE rk <= 10""".stripMargin

  /** Mirrors Q.searchRrf + Search.rrfFuse: reciprocal-rank fusion
    * (1/(60+rank) summed) of the [[searchBm25]] scorer and a
    * (k1=0.5, b=0.35) variant, top-10 per query, ties toward the
    * smaller doc_id (b kept > 0 so dl-independent exact score ties
    * cannot arise — see the determinism note in Q.searchRrf). */
  val searchRrf: String =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      |qs AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'spark window agg'),
      |                             (CAST(2 AS BIGINT), 'customer order query'),
      |                             (CAST(3 AS BIGINT), 'vector hash join'))
      |       AS v(query_id, qtext)),
      |qt AS (
      |  SELECT query_id, unnest(list_distinct(list_filter(
      |           string_split_regex(lower(trim(qtext)), '\s+'), x -> x <> ''))) AS term
      |  FROM qs),
      |dfreq AS (SELECT term, count(*) AS df FROM tf
      |          WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
      |s1 AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
      |             (tf * (1.2 + 1.0)) /
      |             (tf + (dl / avgdl * 0.75 + (1.0 - 0.75)) * 1.2)) AS score
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |          JOIN dl USING (doc_id) CROSS JOIN stats
      |  GROUP BY 1, 2),
      |r1 AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
      |         ORDER BY score DESC, doc_id) AS rk FROM s1),
      |s2 AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
      |             (tf * (0.5 + 1.0)) /
      |             (tf + (dl / avgdl * 0.35 + (1.0 - 0.35)) * 0.5)) AS score
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |          JOIN dl USING (doc_id) CROSS JOIN stats
      |  GROUP BY 1, 2),
      |r2 AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
      |         ORDER BY score DESC, doc_id) AS rk FROM s2),
      |u AS (SELECT query_id, doc_id, rk FROM r1 WHERE rk <= 10
      |      UNION ALL SELECT query_id, doc_id, rk FROM r2 WHERE rk <= 10),
      |f AS (SELECT query_id, doc_id, sum(1.0 / (rk + 60)) AS score
      |      FROM u GROUP BY 1, 2),
      |fr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |         ORDER BY score DESC, doc_id) AS rk FROM f)
      |SELECT query_id, rk AS rank, doc_id, ${q("score", 6)} AS score_q6
      |FROM fr WHERE rk <= 10""".stripMargin

  /** Mirrors Q.searchHybrid: RRF of the [[searchBm25]] lexical scorer
    * and the [[annTopK]] dense cosine scorer (query items 1–3 in the
    * shared doc/vec id space), top-10 per query. */
  val searchHybrid: String =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      |qs AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'spark window agg'),
      |                             (CAST(2 AS BIGINT), 'customer order query'),
      |                             (CAST(3 AS BIGINT), 'vector hash join'))
      |       AS v(query_id, qtext)),
      |qt AS (
      |  SELECT query_id, unnest(list_distinct(list_filter(
      |           string_split_regex(lower(trim(qtext)), '\s+'), x -> x <> ''))) AS term
      |  FROM qs),
      |dfreq AS (SELECT term, count(*) AS df FROM tf
      |          WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
      |s1 AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
      |             (tf * (1.2 + 1.0)) /
      |             (tf + (dl / avgdl * 0.75 + (1.0 - 0.75)) * 1.2)) AS score
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |          JOIN dl USING (doc_id) CROSS JOIN stats
      |  GROUP BY 1, 2),
      |r1 AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
      |         ORDER BY score DESC, doc_id) AS rk FROM s1),
      |eu AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM eu GROUP BY 1),
      |dots AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS nid, sum(q.x * e.x) AS dot
      |  FROM eu q JOIN eu e ON q.i = e.i
      |  WHERE q.vec_id IN (1, 2, 3) AND q.vec_id <> e.vec_id
      |  GROUP BY 1, 2),
      |sim AS (
      |  SELECT qid, nid, dot / (nq.nrm * ne.nrm) AS s
      |  FROM dots JOIN norms nq ON nq.vec_id = qid
      |            JOIN norms ne ON ne.vec_id = nid),
      |r2 AS (SELECT qid AS query_id, nid AS doc_id,
      |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS rk
      |       FROM sim),
      |u AS (SELECT query_id, doc_id, rk FROM r1 WHERE rk <= 10
      |      UNION ALL SELECT query_id, doc_id, rk FROM r2 WHERE rk <= 10),
      |f AS (SELECT query_id, doc_id, sum(1.0 / (rk + 60)) AS score
      |      FROM u GROUP BY 1, 2),
      |fr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |         ORDER BY score DESC, doc_id) AS rk FROM f)
      |SELECT query_id, rk AS rank, doc_id, ${q("score", 6)} AS score_q6
      |FROM fr WHERE rk <= 10""".stripMargin

  /** Mirrors Q.textCooccurrence + TextAnalysis.termCooccurrence:
    * document-presence term pairs with PMI, stop cap df > 0.9·N, fat
    * docs > 1000 surviving terms excluded, pairs in ≥ 5 docs. */
  /** Mirrors Q.textScripts / TextAnalysis.scriptRatios: code-point
    * range fractions over non-space characters. */
  val textScripts: String = {
    def frac(pat: String) =
      s"CASE WHEN t = 0 THEN 0.0 ELSE " +
        s"len(regexp_extract_all(text, '$pat'))::DOUBLE / t END"
    raw"""WITH b AS (
      |  SELECT doc_id, text,
      |    length(regexp_replace(text, '\s', '', 'g')) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  ${q(frac("[A-Za-z\\x{00C0}-\\x{024F}]"), 6)} AS latin_q6,
      |  ${q(frac("[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]"), 6)} AS cjk_q6,
      |  ${q(frac("[\\x{0400}-\\x{04FF}]"), 6)} AS cyrillic_q6,
      |  ${q(frac("[0-9]"), 6)} AS digit_q6
      |FROM b""".stripMargin
  }

  /** Mirrors Q.dedupClusterHistogram: closure component sizes →
    * histogram. */
  val dedupClusterHistogram: String = minhashClosurePrefix +
    raw""",
      |lab AS (SELECT src, min(dst) AS comp FROM reach GROUP BY 1),
      |sz AS (SELECT comp, count(*) AS cluster_size FROM lab GROUP BY 1)
      |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
      |       count(*) AS n_clusters
      |FROM sz GROUP BY 1""".stripMargin

  /** Mirrors Q.mixRepeats / Mixing.sampleToMixWithRepeats: full
    * epochs + md5-thinned partial epoch per scarce source. */
  val mixRepeats: String =
    raw"""WITH d AS (
      |  SELECT doc_id, source,
      |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |        x -> x <> ''))::BIGINT AS tokens
      |  FROM documents),
      |a AS (SELECT source, sum(tokens) AS avail FROM d GROUP BY 1),
      |w(source, wt) AS (VALUES ('src0', 0.6), ('src1', 0.4)),
      |p AS (
      |  SELECT a.source,
      |    wt * 5000 / avail AS ratio,
      |    CAST(least(floor(wt * 5000 / avail), 10.0) AS INT) AS f
      |  FROM a JOIN w USING (source)),
      |p2 AS (
      |  SELECT source, f,
      |    CASE WHEN f >= 10 THEN 0.0 ELSE ratio - f END AS frac
      |  FROM p),
      |c AS (
      |  SELECT d.doc_id, d.source, d.tokens,
      |    p2.f + CASE WHEN
      |      (('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':rep'),
      |                          1, 8))::BIGINT) / 4294967296.0 < p2.frac
      |      THEN 1 ELSE 0 END AS copies
      |  FROM d JOIN p2 USING (source))
      |SELECT doc_id, source, tokens,
      |       unnest(generate_series(1, copies))::BIGINT AS copy
      |FROM c WHERE copies > 0""".stripMargin

  /** Mirrors Q.dedupExactNormalized: exact dedup on the CCNet-style
    * normalised text (min doc_id per normalised digest). */
  val dedupExactNormalized: String =
    raw"""WITH n AS (
      |  SELECT doc_id, n_chars,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |           '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM documents),
      |w AS (SELECT md5(norm) AS d, min(doc_id) AS doc_id
      |      FROM n GROUP BY 1)
      |SELECT n.doc_id, n.n_chars
      |FROM n JOIN w ON md5(n.norm) = w.d AND n.doc_id = w.doc_id""".stripMargin

  /** Mirrors Q.upsertSnapshotDiff / Upsert.snapshotDiff: md5-digest
    * full-outer keyed diff. */
  val upsertSnapshotDiff: String =
    """WITH o AS (
      |  SELECT doc_id, md5(coalesce(text, chr(0) || 'null')) AS d
      |  FROM documents WHERE doc_id % 10 <> 0),
      |n AS (
      |  SELECT doc_id,
      |    md5(coalesce(CASE WHEN doc_id % 5 = 0 THEN upper(text)
      |                      ELSE text END, chr(0) || 'null')) AS d
      |  FROM documents WHERE doc_id % 10 <> 3)
      |SELECT doc_id,
      |  CASE WHEN o.d IS NULL THEN 'added'
      |       WHEN n.d IS NULL THEN 'removed'
      |       WHEN o.d <> n.d THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM o FULL OUTER JOIN n USING (doc_id)""".stripMargin

  /** Mirrors Q.packEpochShuffle / Packing.epochShuffle: md5-keyed
    * epoch-3 permutation into 8 shards. */
  val packEpochShuffle: String =
    """WITH k AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5('3:' || CAST(doc_id AS VARCHAR)),
      |                       1, 8))::BIGINT AS key
      |  FROM documents)
      |SELECT doc_id, CAST(key % 8 AS BIGINT) AS shard,
      |  CAST(row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id)
      |       AS BIGINT) AS pos
      |FROM k""".stripMargin

  /** Mirrors Q.mixQuantileNorm / Mixing.quantileNormalize: SQL
    * percent_rank within source over n_chars. */
  val mixQuantileNorm: String =
    """SELECT doc_id, source, n_chars,
      |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars)
      |    AS score_pctl
      |FROM documents""".stripMargin

  /** Mirrors TextAnalysis.bigramLogProbScores: add-0.1 bigram LM,
    * per-bigram log-probs quantised to nano-nats before the per-doc
    * integer sum. */
  val textBigramLp: String =
    raw"""WITH base AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                x -> x <> '') AS tk
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(tk)),
      |                          i -> tk[i] || ' ' || tk[i + 1])) AS b
      |  FROM base),
      |c12 AS (SELECT b, count(*) AS c12 FROM bg GROUP BY 1),
      |c1 AS (SELECT split_part(b, ' ', 1) AS w1, count(*) AS c1
      |       FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT t.token) AS v FROM
      |        (SELECT unnest(tk) AS token FROM base) t),
      |summed AS (
      |  SELECT bg.doc_id,
      |    sum(CAST(round((ln(c12 + 0.1) - ln(c1 + 0.1 * v)) * 1e9)
      |             AS BIGINT)) AS lp
      |  FROM bg
      |  JOIN c12 USING (b)
      |  JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w1
      |  CROSS JOIN v
      |  GROUP BY 1),
      |cnt AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(s.lp, 0) AS BIGINT) AS lp_nano,
      |  CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_bigrams
      |FROM documents d
      |LEFT JOIN summed s USING (doc_id)
      |LEFT JOIN cnt USING (doc_id)""".stripMargin

  /** Mirrors Q.dsirSelect / ImportanceSampling: hashed unigram+bigram
    * buckets (first 32 md5 bits mod 4096), add-1-smoothed
    * target/corpus log-ratio quantised to integer nano-nats, per-doc
    * integer sum, Gumbel-top-k on the md5-uniform draw. */
  val dsirSelect: String =
    raw"""WITH base AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                x -> x <> '') AS tk
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, lang, unnest(tk) AS g FROM base
      |  UNION ALL
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, len(tk)),
      |                          i -> tk[i] || ' ' || tk[i + 1])) AS g
      |  FROM base),
      |bk AS (SELECT doc_id, lang,
      |         ('0x' || substring(md5(g), 1, 8))::BIGINT % 4096 AS bucket
      |       FROM grams),
      |ct AS (SELECT bucket, count(*) AS ct FROM bk WHERE lang = 'en'
      |       GROUP BY 1),
      |cc AS (SELECT bucket, count(*) AS cc FROM bk GROUP BY 1),
      |tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM ct) AS nt,
      |               (SELECT coalesce(sum(cc), 0) FROM cc) AS nc),
      |model AS (
      |  SELECT bucket,
      |    CAST(round((ln((coalesce(ct, 0) + 1.0) / (nt + 4096.0)) -
      |                ln((coalesce(cc, 0) + 1.0) / (nc + 4096.0))) * 1e9)
      |         AS BIGINT) AS lr
      |  FROM ct FULL OUTER JOIN cc USING (bucket) CROSS JOIN tot),
      |scores AS (
      |  SELECT b.doc_id, CAST(coalesce(s.lw, 0) AS BIGINT) AS logw_nano
      |  FROM (SELECT DISTINCT doc_id FROM base) b
      |  LEFT JOIN (SELECT doc_id, sum(lr) AS lw
      |             FROM bk JOIN model USING (bucket) GROUP BY 1) s
      |  USING (doc_id)),
      |keyed AS (
      |  SELECT doc_id, logw_nano,
      |    logw_nano / 1e9 -
      |    ln(-ln((('0x' || substring(md5('42:' || CAST(doc_id AS VARCHAR)),
      |                               1, 8))::BIGINT + 0.5) / 4294967296.0))
      |      AS gk
      |  FROM scores)
      |SELECT d.doc_id, d.lang, k.logw_nano, ${q("k.gk", 6)} AS gumbel_q6
      |FROM keyed k JOIN documents d USING (doc_id)
      |ORDER BY k.gk DESC, k.doc_id LIMIT 100""".stripMargin

  /** Mirrors Q.textClusterTerms / TextAnalysis.clusterTopTerms:
    * c-TF-IDF = (ctf/csize)·ln(1 + avg_cluster_size/f_t), top-5 per
    * source, ctf ≥ 2, ties (score desc, term asc). */
  val textClusterTerms: String =
    s"""WITH toks AS (
      |  SELECT source AS cluster,
      |         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                            x -> x <> '')) AS term
      |  FROM documents),
      |ctf AS (SELECT cluster, term, count(*) AS ctf FROM toks GROUP BY 1, 2),
      |csize AS (SELECT cluster, CAST(sum(ctf) AS BIGINT) AS csize
      |          FROM ctf GROUP BY 1),
      |ft AS (SELECT term, CAST(sum(ctf) AS BIGINT) AS f_t FROM ctf GROUP BY 1),
      |a AS (SELECT avg(csize) AS avg_size FROM csize),
      |scored AS (
      |  SELECT c.cluster, c.term, c.ctf, ft.f_t,
      |         c.ctf / cs.csize * ln(1 + a.avg_size / ft.f_t) AS score
      |  FROM ctf c JOIN ft USING (term) JOIN csize cs USING (cluster)
      |  CROSS JOIN a
      |  WHERE c.ctf >= 2)
      |SELECT cluster, CAST(row_number() OVER w AS BIGINT) AS rank, term,
      |       ctf, f_t, ${q("score", 6)} AS score_q6
      |FROM scored WINDOW w AS (PARTITION BY cluster ORDER BY score DESC, term)
      |QUALIFY row_number() OVER w <= 5""".stripMargin

  val textCooccurrence: String =
    raw"""WITH dt AS (
      |  SELECT DISTINCT doc_id AS doc,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |           x -> x <> '')) AS term
      |  FROM documents),
      |n AS (SELECT count(DISTINCT doc)::DOUBLE AS n FROM dt),
      |dfreq AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
      |stop AS (SELECT term FROM dfreq CROSS JOIN n WHERE df > n * 0.9),
      |kept AS (SELECT * FROM dt WHERE term NOT IN (SELECT term FROM stop)),
      |fat AS (SELECT doc FROM kept GROUP BY doc HAVING count(*) > 1000),
      |lean AS (SELECT * FROM kept WHERE doc NOT IN (SELECT doc FROM fat)),
      |pairs AS (
      |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_pairs
      |  FROM lean a JOIN lean b ON a.doc = b.doc AND a.term < b.term
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT term_a, term_b, n_pairs, da.df AS df_a, db.df AS df_b,
      |       ${q("ln(n_pairs * n / (da.df * db.df))", 6)} AS pmi_q6
      |FROM pairs JOIN dfreq da ON da.term = term_a
      |           JOIN dfreq db ON db.term = term_b
      |CROSS JOIN n""".stripMargin

  /** Mirrors Q.dedupSpans + Dedup.spanDedup: 10-token non-overlapping
    * blocks; every occurrence of a block value after its first (by
    * (doc_id, block index) order, corpus-wide) is removed; the rank
    * over the raw block string equals the operator's md5-digest
    * grouping. */
  val dedupSpans: String =
    raw"""WITH tk AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, CAST(u.i AS INT) AS idx,
      |         array_to_string(
      |           t[(CAST(u.i AS INT)*10+1):(CAST(u.i AS INT)*10+10)], ' ') AS block
      |  FROM tk, LATERAL unnest(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY block ORDER BY doc_id, idx) AS rk
      |  FROM occ),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         string_agg(block, ' ' ORDER BY idx) AS clean_text
      |  FROM ranked WHERE rk = 1 GROUP BY doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_blocks FROM occ GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text,
      |       coalesce(tot.n_blocks, 0) AS n_blocks,
      |       coalesce(tot.n_blocks, 0) - coalesce(agg.n_kept, 0) AS n_removed
      |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN agg USING (doc_id)
      |""".stripMargin

  /** Mirrors Q.semanticDedup + Similarity.semanticDupPairs: cosine
    * argmax assignment to the vec_id % 100 seed centroids (ties to the
    * smallest centroid id), within-cell pairs at cosine ≥ 0.4. */
  val semanticDedup: String =
    s"""WITH e AS (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT id AS cent_id, v AS cv FROM e WHERE id % 100 = 0),
      |sim AS (
      |  SELECT e.id, e.v, c.cent_id,
      |         row_number() OVER (PARTITION BY e.id
      |           ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
      |           AS rk
      |  FROM e CROSS JOIN c),
      |a AS (SELECT id, v, cent_id AS cell FROM sim WHERE rk = 1)
      |SELECT a.cell AS cell, a.id AS "idA", b.id AS "idB",
      |       ${q("list_cosine_similarity(a.v, b.v)", 6)} AS sim_q6
      |FROM a JOIN a b ON a.cell = b.cell AND a.id < b.id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.4""".stripMargin

  /** Mirrors Q.upsertOrders / Upsert.applyDelta: latest-wins CDC merge
    * with delete semantics and op-precedence tie-breaks. */
  val upsertOrders: String =
    s"""WITH delta AS (
       |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
       |         o_orderstatus, 1 AS seq, 'U' AS op
       |  FROM orders WHERE o_orderkey % 10 < 2
       |  UNION ALL
       |  SELECT o_orderkey, o_totalprice + 5000.0, o_orderstatus, 2, 'U'
       |  FROM orders WHERE o_orderkey % 10 = 0
       |  UNION ALL
       |  SELECT o_orderkey, o_totalprice, o_orderstatus, 1, 'D'
       |  FROM orders WHERE o_orderkey % 10 = 2
       |  UNION ALL
       |  SELECT -o_orderkey, o_totalprice, o_orderstatus, 1, 'I'
       |  FROM orders WHERE o_orderkey % 10 = 3),
       |latest AS (
       |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |    ORDER BY seq DESC, CASE WHEN op = 'D' THEN 2 ELSE 1 END DESC) AS rk
       |  FROM delta)
       |SELECT o_orderkey, ${q("o_totalprice", 2)} AS price_q2, o_orderstatus
       |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
       |UNION ALL
       |SELECT o_orderkey, ${q("o_totalprice", 2)} AS price_q2, o_orderstatus
       |FROM latest WHERE rk = 1 AND op <> 'D'""".stripMargin

  /** Mirrors Q.topkWindow: per-10-minute-bucket top-3 users, ties to
    * the smaller user id. */
  val topkWindow: String =
    """WITH c AS (
      |  SELECT epoch_us(ts) // 600000000 AS bucket, user_id,
      |         count(*)::BIGINT AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY bucket
      |    ORDER BY n DESC, user_id) AS rk
      |  FROM c)
      |SELECT bucket, user_id, n, CAST(rk AS BIGINT) AS rank
      |FROM r WHERE rk <= 3""".stripMargin

  /** Mirrors Q.textLangId / TextAnalysis.languageId: stopword-ratio
    * argmax over {en,es,fr,de}, ties to the lexicographically larger
    * code, 'und' when no stopwords hit at all. */
  val textLangId: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                x -> x <> '') AS ts
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    len(list_filter(ts, x -> x IN ('the','of','and','to','in','is','that','it',
       |      'was','for','with','as','his','on','be','at','by','this')))::DOUBLE
       |      / greatest(len(ts), 1) AS en,
       |    len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','un','los','se',
       |      'del','las','por','con','una','para','es','al','como')))::DOUBLE
       |      / greatest(len(ts), 1) AS es,
       |    len(list_filter(ts, x -> x IN ('le','la','de','et','les','des','est','un',
       |      'une','du','dans','qui','que','pour','sur','au','pas','plus')))::DOUBLE
       |      / greatest(len(ts), 1) AS fr,
       |    len(list_filter(ts, x -> x IN ('der','die','und','das','von','zu','den',
       |      'mit','ist','des','im','nicht','ein','eine','auf','als','auch','es')))::DOUBLE
       |      / greatest(len(ts), 1) AS de
       |  FROM toks)
       |SELECT doc_id,
       |  CASE WHEN greatest(en, es, fr, de) > 0 THEN
       |    CASE WHEN fr = greatest(en, es, fr, de) THEN 'fr'
       |         WHEN es = greatest(en, es, fr, de) THEN 'es'
       |         WHEN en = greatest(en, es, fr, de) THEN 'en'
       |         ELSE 'de' END
       |  ELSE 'und' END AS language,
       |  ${q("en", 6)} AS en_ratio_q6,
       |  ${q("de", 6)} AS de_ratio_q6
       |FROM r""".stripMargin

  /** Mirrors Q.textQuality / TextAnalysis.qualityScore: the weighted
    * length/punctuation/stopword/word-length composite, replayed
    * signal by signal. */
  val textQuality: String =
    s"""WITH b AS (
       |  SELECT doc_id, text,
       |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                    x -> x <> ''))::DOUBLE AS n_tok,
       |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> x IN ('the','of','and','to','in','is','that','it','was','for',
       |        'with','as','his','on','be','at','by','this')))::DOUBLE AS n_sw
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    least(n_tok / 100.0, 1.0) AS length_score,
       |    1.0 - least(((length(text)
       |        - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
       |        / greatest(length(text), 1)) * 5.0, 1.0) AS punct_score,
       |    least((n_sw / greatest(n_tok, 1.0)) * 5.0, 1.0) AS sw_score,
       |    CASE WHEN length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
       |              / greatest(n_tok, 1.0) BETWEEN 3.0 AND 12.0
       |         THEN 1.0 ELSE 0.3 END AS wordlen_score
       |  FROM b)
       |SELECT doc_id,
       |  ${q("round(length_score * 0.3 + punct_score * 0.3 + sw_score * 0.2 + wordlen_score * 0.2, 6)", 6)}
       |    AS quality_q6
       |FROM c""".stripMargin

  /** Mirrors Q.textTokens: whitespace and BPE-ish (letter runs /
    * single digits / punctuation marks) token counts. */
  val textTokens: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                       x -> x <> '')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
      |       AS BIGINT) AS n_bpeish_tokens
      |FROM documents""".stripMargin

  val textStats: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                       x -> x <> '')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |        x -> x IN ('the','of','and','to','in','is','that','it'))) AS BIGINT)
      |    AS n_stopwords
      |FROM documents""".stripMargin

  /** Mirrors Q.textUnigramLp / TextAnalysis.unigramLogProbScores:
    * per-doc mean ln of corpus-relative token probability. */
  val textUnigramLp: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                       x -> x <> '')) AS token
       |  FROM documents),
       |c AS (SELECT token, count(*)::BIGINT AS tf FROM tok GROUP BY 1),
       |n AS (SELECT count(*)::DOUBLE AS n FROM tok)
       |SELECT t.doc_id,
       |       ${q("avg(ln(c.tf / n.n))", 6)} AS unigram_lp_q6,
       |       count(*)::BIGINT AS n_tokens
       |FROM tok t JOIN c USING (token) CROSS JOIN n
       |GROUP BY t.doc_id""".stripMargin

  /** Mirrors Q.textRepetition / TextAnalysis.ngramRepetitionSignals:
    * top-bigram occurrence fraction + duplicate-trigram fraction per
    * doc; docs with <2 tokens absent, <3-token trigram stats null. */
  val textRepetition: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                     x -> x <> '') AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, 2 AS n,
       |         unnest(list_transform(range(1, len(t)),
       |                i -> t[i] || ' ' || t[i+1])) AS gram
       |  FROM toks WHERE len(t) >= 2
       |  UNION ALL
       |  SELECT doc_id, 3 AS n,
       |         unnest(list_transform(range(1, len(t) - 1),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
       |  FROM toks WHERE len(t) >= 3),
       |c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3)
       |SELECT doc_id,
       |  CAST(sum(cnt) FILTER (WHERE n = 2) AS BIGINT) AS n_bigrams,
       |  ${q("(max(cnt) FILTER (WHERE n = 2))::DOUBLE / sum(cnt) FILTER (WHERE n = 2)", 6)}
       |    AS top_bigram_frac_q6,
       |  ${q("coalesce(sum(cnt) FILTER (WHERE n = 3 AND cnt > 1), 0)::DOUBLE / sum(cnt) FILTER (WHERE n = 3)", 6)}
       |    AS dup_trigram_frac_q6
       |FROM c GROUP BY doc_id""".stripMargin

  /** Mirrors Q.textOov / TextAnalysis.oovRates: per-doc OOV fraction
    * against the corpus top-100 vocabulary, ties by (tf desc, token). */
  val textOov: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                       x -> x <> '')) AS token
       |  FROM documents),
       |v AS (
       |  SELECT token FROM (SELECT token, count(*) AS tf FROM tok GROUP BY 1)
       |  QUALIFY row_number() OVER (ORDER BY tf DESC, token) <= 100)
       |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       |       ${q("1.0 - count(v.token)::DOUBLE / count(*)", 6)} AS oov_frac_q6
       |FROM tok t LEFT JOIN v ON t.token = v.token
       |GROUP BY t.doc_id""".stripMargin

  /** Mirrors Q.textPii / PiiRedaction.report: inject id-derived PII
    * into every third doc, then count + redact with the same RE2
    * patterns (email → IPv4 → phone order). */
  val textPii: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      text || ' contact user' || doc_id || '@example.com or 555-' ||
      |      lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
      |      ' at 10.0.' || (doc_id % 256)::VARCHAR || '.7'
      |    ELSE text END AS text
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, text,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS red
      |  FROM d)
      |SELECT doc_id,
      |  len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
      |  len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
      |  len(regexp_extract_all(text, '\b\d{3}-\d{4}\b'))::BIGINT AS n_phones,
      |  len(red)::BIGINT AS redacted_len,
      |  md5(red) AS redacted_md5
      |FROM r""".stripMargin

  /** Mirrors Q.mixSplit / Mixing.assignSplit: salted md5-uniform
    * train/val/test assignment, same replay as [[mixSample]]. */
  val mixSplit: String =
    """SELECT doc_id, source,
      |  CASE WHEN u < 0.1 THEN 'val'
      |       WHEN u < 0.2 THEN 'test'
      |       ELSE 'train' END AS split
      |FROM (
      |  SELECT doc_id, source,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::BIGINT
      |      / 4294967296.0 AS u
      |  FROM documents)""".stripMargin

  /** Mirrors Q.packShards + Packing.packByBudget: the two-level
    * distributed prefix sum equals a plain global window cumsum. */
  val packShards: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                         x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
      |  FROM tok)
      |SELECT doc_id, n_tokens,
      |       CAST(FLOOR(pre / 2000.0) AS BIGINT) AS "shardId",
      |       n_tokens > 2000 AS oversize
      |FROM c""".stripMargin

  val fingerprintSummary: String =
    """SELECT count(*) AS n_docs,
      |       count(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |         AS n_distinct
      |FROM documents""".stripMargin

  val annTopK: String =
    s"""WITH eu AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM eu GROUP BY 1),
      |dots AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS nid, sum(q.x * e.x) AS dot
      |  FROM eu q JOIN eu e ON q.i = e.i
      |  WHERE q.vec_id < 5 AND q.vec_id <> e.vec_id
      |  GROUP BY 1, 2),
      |sim AS (
      |  SELECT qid, nid, dot / (nq.nrm * ne.nrm) AS s
      |  FROM dots JOIN norms nq ON nq.vec_id = qid
      |            JOIN norms ne ON ne.vec_id = nid)
      |SELECT qid AS "queryId", nid AS "neighbourId",
      |       CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid)
      |            AS BIGINT) AS rank,
      |       ${q("s", 4)} AS sim_q4
      |FROM sim
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) <= 5""".stripMargin

  /** CTE chain replaying Spark's `xxhash64(col, lit(42))` — i.e.
    * XXH64.hashLong(42, XXH64.hashLong(l, 42)) — in HUGEINT mod-2⁶⁴
    * arithmetic (validated bit-exact against
    * o.a.s.sql.catalyst.expressions.XXH64 on long inputs). 64-bit
    * unsigned multiply splits the left operand at 2³²
    * (al·b + ((ah·b) mod 2³²)·2³² keeps every intermediate < 2⁹⁷,
    * inside signed int128); rotations are shift-sums of disjoint bit
    * ranges; the second round's data word is the CONSTANT seed 42, so
    * its first three steps fold to the literal 1279370338401826588.
    *
    * `src` must expose the non-negative HUGEINT input as `l` plus the
    * `keep` columns; the emitted fragment (to be spliced into a WITH
    * list) ends with CTE `out`(keep, h) where h is the SIGNED 64-bit
    * hash as HUGEINT. CTE names are prefixed with `out` for
    * uniqueness.
    *
    * `kc` is the second round's folded data-word constant
    * mulmod(rotl(mulmod(seedWord, P2), 31), P1); the default is the
    * literal for seed word 42 (Spark's `xxhash64(col, lit(42))`).
    * Pass [[kcExpr]] of a column expression (resolvable from `keep`)
    * to replay per-row seed words — e.g. the per-subspace 42+s seeds
    * of the PQ codebook trainers. */
  private def xxh64Seed42(src: String, keep: String, out: String,
                          kc: String = "1279370338401826588::HUGEINT"): String = {
    val p = out
    s"""${p}_s1 AS (SELECT $keep, ${mul("l", "14029467366897019727")} AS t1 FROM $src),
      |${p}_s2 AS (SELECT $keep, (t1 * 2147483648) % 18446744073709551616 + t1 // 8589934592 AS t2 FROM ${p}_s1),
      |${p}_s3 AS (SELECT $keep, xor(2870177450012600311::HUGEINT, ${mul("t2", "11400714785074694791")}) AS h1 FROM ${p}_s2),
      |${p}_s4 AS (SELECT $keep, (h1 * 134217728) % 18446744073709551616 + h1 // 137438953472 AS t4 FROM ${p}_s3),
      |${p}_s5 AS (SELECT $keep, (${mul("t4", "11400714785074694791")} + 9650029242287828579) % 18446744073709551616 AS h2 FROM ${p}_s4),
      |${p}_s6 AS (SELECT $keep, xor(h2, h2 // 8589934592) AS f1 FROM ${p}_s5),
      |${p}_s7 AS (SELECT $keep, ${mul("f1", "14029467366897019727")} AS f2 FROM ${p}_s6),
      |${p}_s8 AS (SELECT $keep, xor(f2, f2 // 536870912) AS f3 FROM ${p}_s7),
      |${p}_s9 AS (SELECT $keep, ${mul("f3", "1609587929392839161")} AS f4 FROM ${p}_s8),
      |${p}_s10 AS (SELECT $keep, xor(f4, f4 // 4294967296) AS f5 FROM ${p}_s9),
      |${p}_r1 AS (SELECT $keep, xor((f5 + 2870177450012600269) % 18446744073709551616, $kc) AS g1 FROM ${p}_s10),
      |${p}_r2 AS (SELECT $keep, (g1 * 134217728) % 18446744073709551616 + g1 // 137438953472 AS t4b FROM ${p}_r1),
      |${p}_r3 AS (SELECT $keep, (${mul("t4b", "11400714785074694791")} + 9650029242287828579) % 18446744073709551616 AS g2 FROM ${p}_r2),
      |${p}_r4 AS (SELECT $keep, xor(g2, g2 // 8589934592) AS e1 FROM ${p}_r3),
      |${p}_r5 AS (SELECT $keep, ${mul("e1", "14029467366897019727")} AS e2 FROM ${p}_r4),
      |${p}_r6 AS (SELECT $keep, xor(e2, e2 // 536870912) AS e3 FROM ${p}_r5),
      |${p}_r7 AS (SELECT $keep, ${mul("e3", "1609587929392839161")} AS e4 FROM ${p}_r6),
      |${p}_r8 AS (SELECT $keep, xor(e4, e4 // 4294967296) AS e5 FROM ${p}_r7),
      |$out AS (SELECT $keep,
      |  CASE WHEN e5 >= 9223372036854775808::HUGEINT
      |       THEN e5 - 18446744073709551616 ELSE e5 END AS h FROM ${p}_r8)""".stripMargin
  }

  /** Mirrors Q.annLsh / Similarity.lshTopK + plans.RhpTableKeys:
    * plane component c(p,i) = xxhash64(p·131071+i, 42) / 2⁶³−1 as
    * DOUBLE; sign projections fold integer nano-quantised addends
    * (floor(x·c·1e9 + 0.5) summed as BIGINT — order-free, so exact
    * across engines); per-table 3-bit keys; candidates share any
    * table key; cosine re-rank to top-5. 16 tables × 3 planes. */
  val annLsh: String = mat {
    s"""WITH e AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) - 1 AS i
      |  FROM embeddings),
      |pi AS (
      |  SELECT p, i, (p * 131071 + i)::HUGEINT AS l
      |  FROM (SELECT unnest(range(48)) AS p), (SELECT DISTINCT i FROM e)),
      |${xxh64Seed42("pi", "p, i", "ph")},
      |comp AS (
      |  SELECT p, i,
      |         CAST(h AS DOUBLE) / CAST(9223372036854775807 AS DOUBLE) AS c
      |  FROM ph),
      |bits AS (
      |  SELECT e.vec_id, comp.p,
      |         CASE WHEN sum(CAST(floor(e.x * comp.c * 1e9 + 0.5) AS BIGINT)) > 0
      |              THEN 1 ELSE 0 END AS b
      |  FROM e JOIN comp ON e.i = comp.i GROUP BY 1, 2),
      |tkeys AS (
      |  SELECT vec_id, p // 3 AS tbl,
      |         sum(b * CASE p % 3 WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END) AS key
      |  FROM bits GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT tq.vec_id AS qid, tc.vec_id AS nid
      |  FROM tkeys tq JOIN tkeys tc ON tq.tbl = tc.tbl AND tq.key = tc.key
      |  WHERE tq.vec_id < 5 AND tq.vec_id <> tc.vec_id),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |sim AS (
      |  SELECT qid, nid, list_cosine_similarity(a.v, b.v) AS s
      |  FROM cand JOIN v a ON a.vec_id = cand.qid JOIN v b ON b.vec_id = cand.nid)
      |SELECT qid AS "queryId", nid AS "neighbourId",
      |       CAST(row_number() OVER w AS BIGINT) AS rank,
      |       ${q("s", 4)} AS sim_q4
      |FROM sim WINDOW w AS (PARTITION BY qid ORDER BY s DESC, nid)
      |QUALIFY row_number() OVER w <= 5""".stripMargin
  }

  /** Force every CTE in a generated WITH-chain to MATERIALIZED:
    * DuckDB inlines plain CTEs, so a chain like d2₁ → … → d2₁₅ whose
    * levels are each referenced 3× re-executes the whole prefix
    * exponentially (observed as a 20k-open-files blowup re-scanning
    * the parquet). Window clauses (`AS (PARTITION …`) are left
    * alone. */
  private def mat(sql: String): String =
    sql.replaceAll("AS \\((?!PARTITION|ORDER)", "AS MATERIALIZED (")

  /** 64-bit unsigned multiply mod 2⁶⁴ in HUGEINT: split the left
    * operand at 2³² so every intermediate stays under 2⁹⁷ (signed
    * int128 overflows at (2⁶⁴−1)² otherwise). */
  private def mul(a: String, b: String) =
    s"(($a % 4294967296) * $b + (($a // 4294967296) * $b % 4294967296)" +
      s" * 4294967296) % 18446744073709551616"

  /** SQL for mulmod(rotl(mulmod(sw, P2), 31), P1) — the xxhash64
    * second-round folded constant for seed word `sw` (a non-negative
    * HUGEINT column expression). */
  private def kcExpr(sw: String): String = {
    val m1 = s"(${mul(sw, "14029467366897019727")})"
    val r = s"($m1 * 2147483648 % 18446744073709551616 + $m1 // 8589934592)"
    mul(r, "11400714785074694791")
  }

  private val M64 = "18446744073709551616"
  private val XP1 = "11400714785074694791"
  private val XP2 = "14029467366897019727"
  private val XP3 = "1609587929392839161"
  private val XP4 = "9650029242287828579"
  private val XP5 = "2870177450012600261"

  /** rotl for a non-negative HUGEINT `x` < 2⁶⁴: shift-sum of disjoint
    * bit ranges. */
  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(2).pow(r)}) % $M64 + ($x) // ${BigInt(2).pow(64 - r)})"

  /** CTE chain replaying Spark's `xxhash64(strCol)` (seed 42) over a
    * VARCHAR column — XXH64.hashUnsafeBytes on the UTF-8 bytes,
    * validated bit-exact against catalyst XXH64 on empty / short /
    * word-aligned / 32-byte-stripe / multibyte inputs. Bytes come
    * from hex(encode(str)) (DuckDB has no byte accessor on BLOBs);
    * the variable-length loops run as list_reduce folds with the
    * state list_prepend-ed (32-byte stripes carry the [v1..v4]
    * accumulator as a HUGEINT list; the 8-byte-word and tail-byte
    * loops fold a scalar). `src` must expose `keep` plus the string
    * as `str`; emits CTE `out`(keep, h) with h the SIGNED hash. */
  private def xxh64StrCte(src: String, keep: String, out: String): String = {
    val p = out
    def word(o: String, nb: Int): String =
      "(" + (0 until nb).map(k =>
        s"bl[($o) + ${k + 1}] * ${BigInt(256).pow(k)}").mkString(" + ") + ")"
    val two64 = BigInt(2).pow(64)
    val v1 = (BigInt(42) + BigInt(XP1) + BigInt(XP2)).mod(two64)
    val v2 = (BigInt(42) + BigInt(XP2)).mod(two64)
    val v4 = (BigInt(42) - BigInt(XP1)).mod(two64)
    val hSmall = (BigInt(42) + BigInt(XP5)).mod(two64)
    val stripeStep =
      s"list_transform(range(4), kk -> ${
        mul(rotl(s"(acc[kk+1] + ${mul("w[kk+1]", XP2)}) % $M64", 31), XP1)})"
    val stripeWords =
      s"list_transform(range(n // 32), si -> " +
        s"list_transform(range(4), kk -> ${word("si*32 + kk*8", 8)}))"
    def mergeOne(h: String, k: Int): String = {
      val inner = mul(rotl(mul(s"sv[$k]", XP2), 31), XP1)
      s"CASE WHEN n >= 32 THEN (${mul(s"xor($h, $inner)", XP1)} + $XP4) % $M64 END"
    }
    val w8inner = mul(rotl(mul("w", XP2), 31), XP1)
    val w8step = s"(${mul(rotl(s"xor(h, $w8inner)", 27), XP1)} + $XP4) % $M64"
    val byteStep = mul(rotl(s"xor(h, (c * $XP5) % $M64)", 11), XP1)
    s"""${p}_b0 AS (SELECT $keep, hex(encode(str)) AS hx,
      |  octet_length(encode(str))::BIGINT AS n FROM $src),
      |${p}_b1 AS (SELECT $keep, n, list_transform(range(n), k ->
      |    (strpos('123456789ABCDEF', substring(hx, 2*k+1, 1)) * 16
      |   + strpos('123456789ABCDEF', substring(hx, 2*k+2, 1)))::HUGEINT) AS bl
      |  FROM ${p}_b0),
      |${p}_b2 AS (SELECT $keep, n, bl, CASE WHEN n >= 32 THEN
      |    list_reduce(list_prepend([$v1,$v2,42,$v4]::HUGEINT[], $stripeWords),
      |      (acc, w) -> $stripeStep) END AS sv FROM ${p}_b1),
      |${p}_b3 AS (SELECT $keep, n, bl, sv, CASE WHEN n >= 32 THEN
      |    (${rotl("sv[1]", 1)} + ${rotl("sv[2]", 7)} +
      |     ${rotl("sv[3]", 12)} + ${rotl("sv[4]", 18)}) % $M64 END AS m0
      |  FROM ${p}_b2),
      |${p}_b4 AS (SELECT $keep, n, bl, sv, ${mergeOne("m0", 1)} AS m1 FROM ${p}_b3),
      |${p}_b5 AS (SELECT $keep, n, bl, sv, ${mergeOne("m1", 2)} AS m2 FROM ${p}_b4),
      |${p}_b6 AS (SELECT $keep, n, bl, sv, ${mergeOne("m2", 3)} AS m3 FROM ${p}_b5),
      |${p}_b7 AS (SELECT $keep, n, bl, ${mergeOne("m3", 4)} AS m4 FROM ${p}_b6),
      |${p}_b8 AS (SELECT $keep, n, bl, (COALESCE(m4, $hSmall) + n) % $M64 AS h1,
      |    CASE WHEN n >= 32 THEN (n // 32) * 32 ELSE 0 END AS toff FROM ${p}_b7),
      |${p}_b9 AS (SELECT $keep, n, bl, h1, toff, (n - toff) // 8 AS nw FROM ${p}_b8),
      |${p}_b10 AS (SELECT $keep, n, bl, toff, nw,
      |    list_reduce(list_prepend(h1,
      |      list_transform(range(nw), wi -> ${word("toff + wi*8", 8)})),
      |      (h, w) -> $w8step) AS h2 FROM ${p}_b9),
      |${p}_b11 AS (SELECT $keep, n, bl, toff + nw*8 AS o4, h2 FROM ${p}_b10),
      |${p}_b12 AS (SELECT $keep, n, bl,
      |    CASE WHEN n - o4 >= 4 THEN
      |      (${mul(rotl(s"xor(h2, (${word("o4", 4)} * $XP1) % $M64)", 23), XP2)}
      |       + $XP3) % $M64
      |    ELSE h2 END AS h3,
      |    o4 + CASE WHEN n - o4 >= 4 THEN 4 ELSE 0 END AS ob FROM ${p}_b11),
      |${p}_b13 AS (SELECT $keep,
      |    list_reduce(list_prepend(h3, bl[ob+1:n]), (h, c) -> $byteStep) AS hm
      |  FROM ${p}_b12),
      |${p}_f1 AS (SELECT $keep, xor(hm, hm // 8589934592) AS f1 FROM ${p}_b13),
      |${p}_f2 AS (SELECT $keep, ${mul("f1", XP2)} AS f2 FROM ${p}_f1),
      |${p}_f3 AS (SELECT $keep, xor(f2, f2 // 536870912) AS f3 FROM ${p}_f2),
      |${p}_f4 AS (SELECT $keep, ${mul("f3", XP3)} AS f4 FROM ${p}_f3),
      |${p}_f5 AS (SELECT $keep, xor(f4, f4 // 4294967296) AS f5 FROM ${p}_f4),
      |$out AS (SELECT $keep,
      |  CASE WHEN f5 >= 9223372036854775808::HUGEINT THEN f5 - $M64
      |       ELSE f5 END AS h FROM ${p}_f5)""".stripMargin
  }

  /** Exact squared-L2 between a point list and a centroid list:
    * list_reduce folds the per-dim squares in ascending order —
    * the same (0 + t₁) + t₂ + … association as the engine's
    * `dist += df·df` loop, so the doubles are bit-identical. */
  private def sqlDist(pv: String, cv: String): String =
    s"list_reduce(list_transform(range(len($cv)), ki -> " +
      s"($pv[ki+1] - $cv[ki+1]) * ($pv[ki+1] - $cv[ki+1])), (a, b) -> a + b)"

  /** Exact inner product of two lists — the engine's ascending
    * DotProduct fold. */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(len($b)), ki -> " +
      s"$a[ki+1] * $b[ki+1]), (x, y) -> x + y)"

  /** Unrolled SQL replay of Similarity.lloydLocal, GROUPED by an `s`
    * column so independent trainers (the m PQ subspace codebooks, or
    * a single coarse quantiser with s = 0) run data-parallel in one
    * CTE chain instead of m unrolled copies. Expects input CTEs:
    * `sv`(s, p, v DOUBLE[]) sample vectors ordered by the hash rank
    * p; `spq`(s, p, i, xq) nano-quantised coords; `uj`(s, j, u)
    * hash-uniform draws (j = 0 init, 1..k−1 targets, 1e6 + it·k + c
    * reseeds); `nn`(n) sample size. Emits `${pfx}cents$iters`
    * (s, cell, cv). All arithmetic mirrors the engine exactly:
    * BIGINT D² weights and prefix sums (order-free), exact double
    * argmin distances via [[sqlDist]], centroid means in the
    * (sum/1e9)/cnt op order, LEAST-clamped hash picks. Assumes
    * n ≥ k (the engine's kk = min(k, n) truncation is not
    * replayed). */
  private def lloydSql(pfx: String, sv: String, spq: String, uj: String,
                       nn: String, k: Int, iters: Int): String = {
    val init =
      s"""${pfx}pk0 AS (
        |  SELECT s, LEAST(CAST(FLOOR(u * n) AS BIGINT), n - 1) AS pick
        |  FROM $uj, $nn WHERE j = 0),
        |${pfx}cc0 AS (
        |  SELECT pk.s, 0 AS cell, sv.v AS cv
        |  FROM ${pfx}pk0 pk JOIN $sv sv ON sv.s = pk.s AND sv.p = pk.pick),
        |${pfx}d2_1 AS (
        |  SELECT sv.s, sv.p,
        |         CAST(floor(${sqlDist("sv.v", "cc.cv")} * 1e9 + 0.5) AS BIGINT) AS dn
        |  FROM $sv sv JOIN ${pfx}cc0 cc ON cc.s = sv.s)""".stripMargin
    val picks = (1 until k).map { c =>
      s"""${pfx}tg$c AS (
        |  SELECT u.s, u.u * CAST(t.tt AS DOUBLE) AS target
        |  FROM (SELECT s, sum(dn) AS tt FROM ${pfx}d2_$c GROUP BY s) t
        |  JOIN $uj u ON u.s = t.s AND u.j = $c),
        |${pfx}cum$c AS (
        |  SELECT s, p, sum(dn) OVER (PARTITION BY s ORDER BY p) AS cum
        |  FROM ${pfx}d2_$c),
        |${pfx}pk$c AS (
        |  SELECT cm.s, LEAST(
        |    count(*) FILTER (WHERE CAST(cm.cum AS DOUBLE) < tg.target),
        |    min(nn.n) - 1) AS pick
        |  FROM ${pfx}cum$c cm JOIN ${pfx}tg$c tg ON tg.s = cm.s, $nn nn
        |  GROUP BY cm.s),
        |${pfx}cc$c AS (
        |  SELECT pk.s, $c AS cell, sv.v AS cv
        |  FROM ${pfx}pk$c pk JOIN $sv sv ON sv.s = pk.s AND sv.p = pk.pick)""".stripMargin +
      (if (c < k - 1)
        s""",
          |${pfx}d2_${c + 1} AS (
          |  SELECT d.s, d.p, LEAST(d.dn,
          |    CAST(floor(${sqlDist("sv.v", "cc.cv")} * 1e9 + 0.5) AS BIGINT)) AS dn
          |  FROM ${pfx}d2_$c d
          |  JOIN $sv sv ON sv.s = d.s AND sv.p = d.p
          |  JOIN ${pfx}cc$c cc ON cc.s = d.s)""".stripMargin
      else "")
    }.mkString(",\n")
    val cents0 =
      s"${pfx}cents0 AS (" +
        (0 until k).map(c => s"SELECT * FROM ${pfx}cc$c").mkString(" UNION ALL ") + ")"
    val lloyd = (0 until iters).map { t =>
      s"""${pfx}asg$t AS (
        |  SELECT s, p, cell FROM (
        |    SELECT sv.s, sv.p, ct.cell,
        |           row_number() OVER (PARTITION BY sv.s, sv.p
        |             ORDER BY ${sqlDist("sv.v", "ct.cv")}, ct.cell) AS rk
        |    FROM $sv sv JOIN ${pfx}cents$t ct ON ct.s = sv.s) WHERE rk = 1),
        |${pfx}cm$t AS (
        |  SELECT s, cell, list((CAST(sq AS DOUBLE) / 1e9) / cnt ORDER BY i) AS cv
        |  FROM (
        |    SELECT a.s, a.cell, q.i, sum(q.xq) AS sq, count(*) AS cnt
        |    FROM ${pfx}asg$t a JOIN $spq q ON q.s = a.s AND q.p = a.p
        |    GROUP BY 1, 2, 3)
        |  GROUP BY s, cell),
        |${pfx}rs$t AS (
        |  SELECT g.s, g.cell, sv.v AS cv
        |  FROM (SELECT u.s, r.cell, u.u
        |        FROM (SELECT unnest(range($k)) AS cell) r
        |        JOIN $uj u ON u.j = 1000000 + $t * $k + r.cell) g
        |  JOIN $nn nn ON true
        |  JOIN $sv sv ON sv.s = g.s
        |    AND sv.p = LEAST(CAST(FLOOR(g.u * nn.n) AS BIGINT), nn.n - 1)
        |  WHERE NOT EXISTS (SELECT 1 FROM ${pfx}cm$t c
        |                    WHERE c.s = g.s AND c.cell = g.cell)),
        |${pfx}cents${t + 1} AS (
        |  SELECT * FROM ${pfx}cm$t UNION ALL SELECT * FROM ${pfx}rs$t)""".stripMargin
    }.mkString(",\n")
    s"$init,\n$picks,\n$cents0,\n$lloyd"
  }

  /** Mirrors Q.annIvf / Similarity.ivfTopK + lloydLocal +
    * sampleVectors + plans.NearestCells, end to end. The trainer is
    * replayed as unrolled SQL blocks: hash-ordered 4096-sample
    * (xxhash64 kernel), k-means++ init (k − 1 D²-weighted picks with
    * integer nano-quantised weights: BIGINT prefix sums are
    * order-free, so the pick index is exact), 5 Lloyd rounds
    * (assignment argmin on exact double distances via [[sqlDist]];
    * centroid means from BIGINT nano-sums in the engine's
    * (sum/1e9)/cnt op order; hash-uniform empty-cell reseeds), then
    * nProbe cell assignment, bucket join and cosine top-5. */
  val annIvf: String = mat {
    val K = 16; val ITERS = 5; val NPROBE = 4
    s"""WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |e AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) - 1 AS i
      |  FROM embeddings),
      |hin AS (
      |  SELECT vec_id, CASE WHEN vec_id < 0
      |    THEN vec_id::HUGEINT + 18446744073709551616
      |    ELSE vec_id::HUGEINT END AS l FROM ev),
      |${xxh64Seed42("hin", "vec_id", "sh")},
      |samp AS (
      |  SELECT vec_id, row_number() OVER (ORDER BY h) - 1 AS p
      |  FROM sh QUALIFY row_number() OVER (ORDER BY h) <= 4096),
      |sv AS (SELECT 0 AS s, p, v FROM samp JOIN ev USING (vec_id)),
      |spq AS (
      |  SELECT 0 AS s, p, i, CAST(floor(x * 1e9 + 0.5) AS BIGINT) AS xq
      |  FROM samp JOIN e USING (vec_id)),
      |nn AS (SELECT count(*) AS n FROM samp),
      |jd AS (SELECT unnest(range($K)) AS j
      |       UNION ALL SELECT 1000000 + unnest(range(${ITERS * K})) AS j),
      |jin AS (SELECT 0 AS s, j, j::HUGEINT AS l FROM jd),
      |${xxh64Seed42("jin", "s, j", "jh")},
      |uj AS (SELECT s, j,
      |  ((CAST(h AS DOUBLE) / CAST(9223372036854775807 AS DOUBLE)) + 1.0) / 2.0 AS u
      |  FROM jh),
      |${lloydSql("co_", "sv", "spq", "uj", "nn", K, ITERS)},
      |cellc AS (
      |  SELECT vec_id AS nid, v, cell FROM (
      |    SELECT ev.vec_id, ev.v, ct.cell,
      |           row_number() OVER (PARTITION BY ev.vec_id
      |             ORDER BY ${sqlDist("ev.v", "ct.cv")}, ct.cell) AS rk
      |    FROM ev CROSS JOIN co_cents$ITERS ct) WHERE rk = 1),
      |cellq AS (
      |  SELECT vec_id AS qid, v, cell FROM (
      |    SELECT ev.vec_id, ev.v, ct.cell,
      |           row_number() OVER (PARTITION BY ev.vec_id
      |             ORDER BY ${sqlDist("ev.v", "ct.cv")}, ct.cell) AS rk
      |    FROM ev CROSS JOIN co_cents$ITERS ct WHERE ev.vec_id < 5)
      |  WHERE rk <= $NPROBE),
      |cand AS (
      |  SELECT DISTINCT cellq.qid, cellc.nid
      |  FROM cellq JOIN cellc USING (cell) WHERE cellq.qid <> cellc.nid),
      |sim AS (
      |  SELECT qid, nid, list_cosine_similarity(a.v, b.v) AS s
      |  FROM cand JOIN ev a ON a.vec_id = cand.qid
      |            JOIN ev b ON b.vec_id = cand.nid)
      |SELECT qid AS "queryId", nid AS "neighbourId",
      |       CAST(row_number() OVER w AS BIGINT) AS rank,
      |       ${q("s", 4)} AS sim_q4
      |FROM sim WINDOW w AS (PARTITION BY qid ORDER BY s DESC, nid)
      |QUALIFY row_number() OVER w <= 5""".stripMargin
  }

  /** Mirrors Q.annPq / Similarity.pqTopK end to end: unit vectors,
    * the coarse quantiser (deterministic lloydLocal — see [[annIvf]]),
    * residual samples, all 16 subspace codebooks trained
    * data-parallel in one grouped [[lloydSql]] chain (per-subspace
    * seed words 42+s replayed via [[kcExpr]]), PqCodes argmin
    * encoding, per-query PqLut tables, the s-ascending ADC fold
    * (list_reduce over an s-major LUT list — the engine's exact
    * association), the k·refineFactor ADC shortlist and the
    * exact-dot refine. Every float is bit-identical: ordered list
    * folds for distances/dots, BIGINT trainer weights, engine op
    * order for centroid means. */
  val annPq: String = mat {
    val K = 16; val ITERS = 5; val NPROBE = 6; val SHORT = 40
    s"""WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |un AS (
      |  SELECT vec_id, list_transform(v, x -> x / nrm) AS uv
      |  FROM (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM ev)),
      |ue AS (
      |  SELECT vec_id, unnest(uv) AS x,
      |         generate_subscripts(uv, 1) - 1 AS i FROM un),
      |hin AS (
      |  SELECT vec_id, CASE WHEN vec_id < 0
      |    THEN vec_id::HUGEINT + 18446744073709551616
      |    ELSE vec_id::HUGEINT END AS l FROM ev),
      |${xxh64Seed42("hin", "vec_id", "sh")},
      |samp AS (
      |  SELECT vec_id, row_number() OVER (ORDER BY h) - 1 AS p
      |  FROM sh QUALIFY row_number() OVER (ORDER BY h) <= 4096),
      |sv AS (SELECT 0 AS s, p, uv AS v FROM samp JOIN un USING (vec_id)),
      |spq AS (
      |  SELECT 0 AS s, p, i, CAST(floor(x * 1e9 + 0.5) AS BIGINT) AS xq
      |  FROM samp JOIN ue USING (vec_id)),
      |nn AS (SELECT count(*) AS n FROM samp),
      |jd AS (SELECT unnest(range($K)) AS j
      |       UNION ALL SELECT 1000000 + unnest(range(${ITERS * K})) AS j),
      |jin AS (SELECT 0 AS s, j, j::HUGEINT AS l FROM jd),
      |${xxh64Seed42("jin", "s, j", "jh")},
      |uj AS (SELECT s, j,
      |  ((CAST(h AS DOUBLE) / CAST(9223372036854775807 AS DOUBLE)) + 1.0) / 2.0 AS u
      |  FROM jh),
      |${lloydSql("co_", "sv", "spq", "uj", "nn", K, ITERS)},
      |coars AS (SELECT cell, cv FROM co_cents$ITERS),
      |sd AS (SELECT len(v) // 16 AS sd FROM ev LIMIT 1),
      |rbest AS (
      |  SELECT p, cell FROM (
      |    SELECT sv.p, ct.cell,
      |           row_number() OVER (PARTITION BY sv.p
      |             ORDER BY ${sqlDist("sv.v", "ct.cv")}, ct.cell) AS rk
      |    FROM sv CROSS JOIN coars ct) WHERE rk = 1),
      |rsv AS (
      |  SELECT sv.p,
      |         list_transform(range(len(sv.v)), ki -> sv.v[ki+1] - ct.cv[ki+1]) AS rv
      |  FROM sv JOIN rbest USING (p) JOIN coars ct ON ct.cell = rbest.cell),
      |svb AS (
      |  SELECT sdom.s, rsv.p,
      |         rv[(sdom.s * sd.sd + 1):((sdom.s + 1) * sd.sd)] AS v
      |  FROM rsv, (SELECT unnest(range(16)) AS s) sdom, sd),
      |spqb AS (
      |  SELECT gi // sd.sd AS s, p, gi % sd.sd AS i,
      |         CAST(floor(x * 1e9 + 0.5) AS BIGINT) AS xq
      |  FROM (SELECT p, unnest(rv) AS x,
      |               generate_subscripts(rv, 1) - 1 AS gi FROM rsv), sd),
      |jdb AS (SELECT sdom.s, jd.j
      |        FROM (SELECT unnest(range(16)) AS s) sdom, jd),
      |jinb AS (SELECT s, j, j::HUGEINT AS l FROM jdb),
      |${xxh64Seed42("jinb", "s, j", "jhb", kcExpr("((42 + s)::HUGEINT)"))},
      |ujb AS (SELECT s, j,
      |  ((CAST(h AS DOUBLE) / CAST(9223372036854775807 AS DOUBLE)) + 1.0) / 2.0 AS u
      |  FROM jhb),
      |${lloydSql("bk_", "svb", "spqb", "ujb", "nn", K, ITERS)},
      |books AS (SELECT s, cell, cv FROM bk_cents$ITERS),
      |casg AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT un.vec_id, ct.cell,
      |           row_number() OVER (PARTITION BY un.vec_id
      |             ORDER BY ${sqlDist("un.uv", "ct.cv")}, ct.cell) AS rk
      |    FROM un CROSS JOIN coars ct) WHERE rk = 1),
      |cres AS (
      |  SELECT un.vec_id,
      |         list_transform(range(len(uv)), ki -> uv[ki+1] - ct.cv[ki+1]) AS rv
      |  FROM un JOIN casg USING (vec_id) JOIN coars ct ON ct.cell = casg.cell),
      |codes AS (
      |  SELECT vec_id, s, code FROM (
      |    SELECT cres.vec_id, bc.s, bc.cell AS code,
      |           row_number() OVER (PARTITION BY cres.vec_id, bc.s
      |             ORDER BY ${sqlDist("cres.rv[(bc.s * sd.sd + 1):((bc.s + 1) * sd.sd)]", "bc.cv")},
      |                      bc.cell) AS rk
      |    FROM cres CROSS JOIN books bc, sd) WHERE rk = 1),
      |codesl AS (
      |  SELECT vec_id AS nid, list(code ORDER BY s) AS cl
      |  FROM codes GROUP BY vec_id),
      |qn AS (SELECT vec_id AS qid, uv FROM un WHERE vec_id < 5),
      |qcell AS (
      |  SELECT qid, cell, cd FROM (
      |    SELECT qn.qid, ct.cell, ${sqlDot("qn.uv", "ct.cv")} AS cd,
      |           row_number() OVER (PARTITION BY qn.qid
      |             ORDER BY ${sqlDist("qn.uv", "ct.cv")}, ct.cell) AS rk
      |    FROM qn CROSS JOIN coars ct) WHERE rk <= $NPROBE),
      |qlut AS (
      |  SELECT qn.qid, bc.s, bc.cell AS c,
      |         ${sqlDot("qn.uv[(bc.s * sd.sd + 1):((bc.s + 1) * sd.sd)]", "bc.cv")} AS lv
      |  FROM qn CROSS JOIN books bc, sd),
      |qlutl AS (
      |  SELECT qid, list(lv ORDER BY s, c) AS ll FROM qlut GROUP BY qid),
      |sc AS (
      |  SELECT qc.qid, ca.vec_id AS nid,
      |         qc.cd + list_reduce(list_transform(range(16),
      |           si -> ll[si * 16 + cl[si + 1] + 1]), (a, b) -> a + b) AS score
      |  FROM qcell qc
      |  JOIN casg ca ON ca.cell = qc.cell AND ca.vec_id <> qc.qid
      |  JOIN codesl ON codesl.nid = ca.vec_id
      |  JOIN qlutl ON qlutl.qid = qc.qid),
      |short AS (
      |  SELECT qid, nid FROM (
      |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
      |      ORDER BY score DESC, nid) AS rk FROM sc) WHERE rk <= $SHORT),
      |ref AS (
      |  SELECT short.qid, short.nid, ${sqlDot("qu.uv", "cu.uv")} AS score
      |  FROM short JOIN un cu ON cu.vec_id = short.nid
      |             JOIN qn qu ON qu.qid = short.qid)
      |SELECT qid AS "queryId", nid AS "neighbourId",
      |       CAST(row_number() OVER w AS BIGINT) AS rank,
      |       ${q("score", 4)} AS score_q4
      |FROM ref WINDOW w AS (PARTITION BY qid ORDER BY score DESC, nid)
      |QUALIFY row_number() OVER w <= 5""".stripMargin
  }

  /** Mirrors Q.annSq8 / Similarity.sqTrain/sqEncode/sqTopK: unit
    * vectors → per-dim min/max model → uint8 codes → asymmetric
    * score Σ qᵢ·mnᵢ + Σ (qᵢ·scaleᵢ)·cᵢ, replaying the engine's
    * expression order exactly. */
  val annSq8: String =
    s"""WITH eu AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM eu GROUP BY 1),
      |u AS (SELECT eu.vec_id, i, x / nrm AS u
      |      FROM eu JOIN norms USING (vec_id)),
      |model AS (SELECT i, min(u) AS mn, max(u) AS mx FROM u GROUP BY 1),
      |codes AS (
      |  SELECT u.vec_id, u.i,
      |         CASE WHEN mx - mn = 0 THEN 0
      |              ELSE GREATEST(0, LEAST(255,
      |                CAST(floor((u - mn) / (mx - mn) * 255.0 + 0.5)
      |                     AS INTEGER))) END AS c
      |  FROM u JOIN model USING (i)),
      |qconst AS (
      |  SELECT u.vec_id AS qid, sum(u * mn) AS cst
      |  FROM u JOIN model USING (i) WHERE u.vec_id < 5 GROUP BY 1),
      |dots AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |         sum((q.u * ((mx - mn) / 255.0)) * c.c) AS dt
      |  FROM u q JOIN model m ON q.i = m.i JOIN codes c ON c.i = q.i
      |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
      |  GROUP BY 1, 2),
      |sim AS (SELECT qid, nid, cst + dt AS s FROM dots JOIN qconst USING (qid))
      |SELECT qid AS "queryId", nid AS "neighbourId",
      |       CAST(row_number() OVER w AS BIGINT) AS rank,
      |       ${q("s", 4)} AS score_q4
      |FROM sim WINDOW w AS (PARTITION BY qid ORDER BY s DESC, nid)
      |QUALIFY row_number() OVER w <= 5""".stripMargin

  /** Mirrors Q.simPooled / Similarity.poolEmbeddings: per (group,
    * dim) the mean replays the engine's fixed-point path exactly —
    * per-element floor(x·1e9 + 0.5) nano-quantisation summed as
    * BIGINT (associative ⇒ partitioning-independent), then
    * (ns/1e9)/n in the engine's operation order. */
  val simPooled: String =
    s"""WITH e AS (
      |  SELECT vec_id % 50 AS group_id, unnest(embedding)::DOUBLE AS x,
      |         generate_subscripts(embedding, 1) AS ord
      |  FROM embeddings),
      |s AS (
      |  SELECT group_id, ord - 1 AS dim,
      |         sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS ns,
      |         count(*) AS n, max(x) AS mx
      |  FROM e GROUP BY 1, 2)
      |SELECT group_id, dim, ${q("(ns / 1e9) / n", 6)} AS mean_q6,
      |       ${q("mx", 6)} AS max_q6
      |FROM s""".stripMargin

  /** Mirrors Q.simHardNegatives / Similarity.hardNegatives: cosine
    * top-20 per query (the k·factor over-fetch), drop neighbours in
    * the query's 0.4-cosine closure component, re-rank to 5. */
  val simHardNegatives: String =
    s"""WITH RECURSIVE e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS pa, b.vec_id AS pb
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
      |edges AS (SELECT pa AS a, pb AS b FROM p
      |          UNION SELECT pb, pa FROM p),
      |reach(src, dst) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT r.src, g.b FROM reach r JOIN edges g ON r.dst = g.a),
      |lab AS (SELECT src AS id, min(dst) AS comp FROM reach GROUP BY 1),
      |sim AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |         list_cosine_similarity(q.v, c.v) AS s
      |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 5),
      |pre AS (
      |  SELECT qid, nid, s,
      |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid)
      |           AS r0
      |  FROM sim),
      |kept AS (
      |  SELECT pre.qid, pre.nid, pre.s
      |  FROM pre
      |  LEFT JOIN lab lq ON lq.id = pre.qid
      |  LEFT JOIN lab ln ON ln.id = pre.nid
      |  WHERE pre.r0 <= 20
      |    AND (lq.comp IS NULL OR ln.comp IS NULL OR lq.comp <> ln.comp))
      |SELECT qid AS "queryId", nid AS "neighbourId",
      |       CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid)
      |            AS BIGINT) AS rank,
      |       ${q("s", 4)} AS sim_q4
      |FROM kept
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid)
      |        <= 5""".stripMargin

  val blobMeta: String =
    """SELECT CAST(doc_id AS BIGINT) AS id, 'image' AS kind,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS "nBytes"
      |FROM documents""".stripMargin

  /** Replays Multimodal.decode's byte-fold h ← h·31 + byte exactly:
    * HUGEINT arithmetic mod 2⁶⁴, reinterpreted signed, then Java
    * floorMod / arithmetic-shift (= floor-division) for the fake
    * dimensions. Text is ASCII in the testdata, so ord(char) = the
    * UTF-8 byte the Scala side folds. */
  /** Mirrors Q.multimodalResize: the decode-stub hash fold, then the
    * fit-within-256 resize plan. */
  val mmResize: String =
    s"""WITH h AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(25214903917::HUGEINT,
      |        list_transform(range(1, length(text) + 1),
      |                       i -> ord(substring(text, i, 1))::HUGEINT)),
      |      (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS hu
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         CASE WHEN hu >= 9223372036854775808::HUGEINT
      |              THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS hs
      |  FROM h),
      |d AS (
      |  SELECT doc_id,
      |    64 + ((hs % 960 + 960) % 960) AS w,
      |    64 + ((((hs - (hs % 1024 + 1024) % 1024) // 1024) % 960 + 960) % 960) AS ht
      |  FROM s),
      |r AS (
      |  SELECT doc_id, w, ht,
      |    least(1.0, 256.0 / greatest(w::DOUBLE, ht::DOUBLE)) AS sc
      |  FROM d)
      |SELECT CAST(doc_id AS BIGINT) AS id,
      |       CAST(w AS INTEGER) AS width, CAST(ht AS INTEGER) AS height,
      |       CAST(greatest(1, floor(w::DOUBLE * sc + 0.5)) AS BIGINT) AS "outWidth",
      |       CAST(greatest(1, floor(ht::DOUBLE * sc + 0.5)) AS BIGINT) AS "outHeight",
      |       ${q("sc", 6)} AS scale_q6
      |FROM r""".stripMargin

  val mmDecode: String =
    s"""WITH h AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(25214903917::HUGEINT,
      |        list_transform(range(1, length(text) + 1),
      |                       i -> ord(substring(text, i, 1))::HUGEINT)),
      |      (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS hu
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         CASE WHEN hu >= 9223372036854775808::HUGEINT
      |              THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS hs
      |  FROM h),
      |d AS (
      |  SELECT doc_id, hs,
      |    64 + ((hs % 960 + 960) % 960) AS w,
      |    64 + ((((hs - (hs % 1024 + 1024) % 1024) // 1024) % 960 + 960) % 960) AS ht
      |  FROM s)
      |SELECT CAST(doc_id AS BIGINT) AS id, 'image' AS kind,
      |       CAST(w AS INTEGER) AS width, CAST(ht AS INTEGER) AS height,
      |       3 AS channels, CAST(hs AS BIGINT) AS checksum,
      |       ${q("CAST(w AS DOUBLE) / ht", 4)} AS aspect_q4,
      |       ${q("CAST(w AS DOUBLE) * ht / 1e6", 4)} AS mega_q4
      |FROM d""".stripMargin

  /** Mirrors Multimodal.sampleFrames over toBlobTable(documents,
    * kind=video): payload byte-fold (same as mmDecode), frame count =
    * 1 + nBytes % 16, sampled indices 0,2,..  capped at 4 frames
    * (fidx < stride·maxFrames = 8), per-frame hash = (fold·31 + fidx)
    * wrapped to a signed 64-bit value. */
  val mmFrames: String =
    """WITH h AS (
      |  SELECT doc_id, text,
      |    list_reduce(
      |      list_prepend(25214903917::HUGEINT,
      |        list_transform(range(1, length(text) + 1),
      |                       i -> ord(substring(text, i, 1))::HUGEINT)),
      |      (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS hu
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, hu, 1 + (length(text) % 16) AS nframes FROM h),
      |f AS (
      |  SELECT doc_id, hu, unnest(range(0, nframes, 2)) AS fidx FROM n),
      |w AS (
      |  SELECT doc_id, fidx,
      |         (hu * 31 + fidx) % 18446744073709551616::HUGEINT AS fhu
      |  FROM f WHERE fidx < 8),
      |sgn AS (
      |  SELECT doc_id, fidx,
      |         CASE WHEN fhu >= 9223372036854775808::HUGEINT
      |              THEN fhu - 18446744073709551616::HUGEINT ELSE fhu END AS fhs
      |  FROM w)
      |SELECT CAST(doc_id AS BIGINT) AS id, CAST(fidx AS INTEGER) AS "frameIdx",
      |       CAST(64 + ((fhs % 960 + 960) % 960) AS INTEGER) AS width,
      |       CAST(64 + ((((fhs - (fhs % 1024 + 1024) % 1024) // 1024) % 960 + 960) % 960)
      |            AS INTEGER) AS height,
      |       CAST(fhs AS BIGINT) AS checksum
      |FROM sgn""".stripMargin

  /** Mirrors Dedup.minhashDupPairsMd5: 3-shingles → 32-bit md5 base
    * hash → 64 affine rehashes (min each) → 16 plain-string band keys
    * → bucket self-join → component-match similarity ≥ 0.5. */
  /** Mirrors Q.minhashPairs / Dedup.minhashDupPairs +
    * plans.MinHashSignature — the PRODUCTION xxhash64 path, replayed
    * end to end with [[xxh64StrCte]]: shingles (window 3-grams plus
    * the engine's joined-tokens fallback for docs under 3 tokens),
    * upper-32-bit base hash, the 64 affine rehash minima, band keys
    * joined on the band's component STRING (the engine joins on
    * xxhash64 of that string — identical pairs absent a 64-bit
    * collision), signature similarity k/64 (exact in binary). The
    * hot-bucket cap (100000) is a documented no-op on this corpus. */
  val dedupMinhashXx: String = mat {
    s"""WITH base AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                     x -> x <> '') AS l
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, unnest(l) AS tk, generate_subscripts(l, 1) AS i
      |  FROM base),
      |shs AS (
      |  SELECT doc_id,
      |         tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w AS str
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(tk, 2) OVER w IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, array_to_string(l, ' ') AS str FROM base WHERE len(l) < 3),
      |${xxh64StrCte("shs", "doc_id", "shh")},
      |shx AS (SELECT doc_id,
      |  CAST((CASE WHEN h < 0 THEN h + $M64 ELSE h END) // 4294967296 AS BIGINT) AS x
      |  FROM shh),
      |comps AS (
      |  SELECT doc_id, r.h,
      |         min(((2 * r.h + 1) * x + r.h * 2654435761) % 4294967296) AS comp
      |  FROM shx, range(64) r(h) GROUP BY doc_id, r.h),
      |bandkeys AS (
      |  SELECT doc_id, h // 4 AS band,
      |         string_agg(comp::VARCHAR, ',' ORDER BY h) AS key
      |  FROM comps GROUP BY doc_id, h // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      |  FROM bandkeys a JOIN bandkeys b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |simil AS (
      |  SELECT ia, ib,
      |         count(*) FILTER (WHERE ca.comp = cb.comp) / 64.0 AS s
      |  FROM cand
      |  JOIN comps ca ON ca.doc_id = ia
      |  JOIN comps cb ON cb.doc_id = ib AND cb.h = ca.h
      |  GROUP BY ia, ib)
      |SELECT ia AS "idA", ib AS "idB", s AS similarity
      |FROM simil WHERE s >= 0.5""".stripMargin
  }

  /** Mirrors Q.simhashPairs / Dedup.simhashDupPairs +
    * plans.SimHash64 — the PRODUCTION xxhash64 path: per-token
    * 64-bit hashes via [[xxh64StrCte]] (multiplicity preserved),
    * ±1 bit counts, sign-packed signature (empty-token docs pack to
    * 0, like the engine), 16-bit quarter blocking, exact Hamming
    * filter ≤ 3 via two's-complement bit_count. */
  val dedupSimhashXx: String = mat {
    val pows = (0 until 64).map(i => BigInt(2).pow(i)).mkString("[", ",", "]")
    s"""WITH base AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                     x -> x <> '') AS l
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, unnest(l) AS str, generate_subscripts(l, 1) AS i
      |  FROM base),
      |${xxh64StrCte("toks", "doc_id, i", "th")},
      |tb AS (SELECT doc_id, i,
      |  CASE WHEN h < 0 THEN h + $M64 ELSE h END AS hu FROM th),
      |pows AS (SELECT bi, ($pows::HUGEINT[])[bi + 1] AS pv
      |         FROM range(64) r(bi)),
      |cnts AS (
      |  SELECT doc_id, pw.bi, pw.pv,
      |         sum(CASE WHEN (hu // pw.pv) % 2 = 1 THEN 1 ELSE -1 END) AS c
      |  FROM tb, pows pw GROUP BY 1, 2, 3),
      |sh AS (
      |  SELECT doc_id, sum(CASE WHEN c > 0 THEN pv ELSE 0::HUGEINT END) AS shu
      |  FROM cnts GROUP BY doc_id
      |  UNION ALL
      |  SELECT doc_id, 0::HUGEINT FROM base WHERE len(l) = 0),
      |qs AS (
      |  SELECT doc_id, shu, r.qq,
      |         (shu // ([1,65536,4294967296,281474976710656]::HUGEINT[])[r.qq + 1])
      |           % 65536 AS qh
      |  FROM sh, range(4) r(qq)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS ia, a.shu AS sa, b.doc_id AS ib, b.shu AS sb
      |  FROM qs a JOIN qs b
      |    ON a.qq = b.qq AND a.qh = b.qh AND a.doc_id < b.doc_id)
      |SELECT * FROM (
      |  SELECT ia AS "idA", ib AS "idB", CAST(bit_count(CAST(
      |    CASE WHEN xor(sa, sb) >= 9223372036854775808::HUGEINT
      |         THEN xor(sa, sb) - $M64 ELSE xor(sa, sb) END AS BIGINT)) AS INTEGER)
      |    AS hamming
      |  FROM cand)
      |WHERE hamming <= 3""".stripMargin
  }

  val minhashMd5: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(l) AS tk, generate_subscripts(l, 1) AS i
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                           x -> x <> '') AS l
      |        FROM documents)),
      |sh AS (
      |  SELECT doc_id,
      |         ('0x' || substring(md5(
      |            tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w
      |          ), 1, 8))::BIGINT AS x
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(tk, 2) OVER w IS NOT NULL),
      |comps AS (
      |  SELECT doc_id, h, min(((2 * h + 1) * x + h * 2654435761) % 4294967296) AS comp
      |  FROM sh, range(64) r(h)
      |  GROUP BY doc_id, h),
      |bandkeys AS (
      |  SELECT doc_id, h // 4 AS band,
      |         string_agg(comp::VARCHAR, ',' ORDER BY h) AS key
      |  FROM comps GROUP BY doc_id, h // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      |  FROM bandkeys a JOIN bandkeys b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |simil AS (
      |  SELECT ia, ib,
      |         count(*) FILTER (WHERE ca.comp = cb.comp) / 64.0 AS s
      |  FROM cand
      |  JOIN comps ca ON ca.doc_id = ia
      |  JOIN comps cb ON cb.doc_id = ib AND cb.h = ca.h
      |  GROUP BY ia, ib)
      |SELECT ia AS "idA", ib AS "idB", ${q("s", 6)} AS sim_q6
      |FROM simil WHERE s >= 0.5""".stripMargin

  /** Mirrors Q.dedupIncrementalMinhash — the PRODUCTION-hash
    * incremental operator: the full-corpus [[dedupMinhashXx]] pair
    * set restricted to pairs with at least one arrival side (the
    * same semantics contract the md5 twin pinned). */
  val dedupIncrMinhashXx: String =
    s"""SELECT "idA", "idB", ${q("similarity", 6)} AS sim_q6
      |FROM ($dedupMinhashXx)
      |WHERE ("idA" % 5 = 0 OR "idB" % 5 = 0)""".stripMargin

  /** Mirrors Q.dedupIncrementalExact: arrivals (doc_id % 5 = 0) that
    * are digest-new to the corpus (% 5 <> 0) and min-id within the
    * batch. */
  val dedupIncrExact: String =
    """WITH arr AS (
      |  SELECT doc_id, lang, n_chars, md5(text) AS digest
      |  FROM documents WHERE doc_id % 5 = 0),
      |winners AS (
      |  SELECT digest, min(doc_id) AS doc_id FROM arr GROUP BY 1)
      |SELECT a.doc_id, a.lang, a.n_chars
      |FROM arr a
      |JOIN winners w ON w.digest = a.digest AND w.doc_id = a.doc_id
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM documents c
      |  WHERE c.doc_id % 5 <> 0 AND md5(c.text) = a.digest)""".stripMargin

  /** Mirrors Q.dedupIncrementalMinhashMd5: the full-corpus
    * [[minhashMd5]] pair set restricted to pairs with at least one
    * arrival (doc_id % 5 = 0) side — the incremental operator's
    * semantics contract. */
  val dedupIncrMinhashMd5: String =
    s"""SELECT * FROM ($minhashMd5)
      |WHERE ("idA" % 5 = 0 OR "idB" % 5 = 0)""".stripMargin

  /** Mirrors Q.profileDocuments / Profiler.profile (exact-distinct
    * mode): per-column null/distinct/range/mean stats in long format.
    * Numeric columns measure the value, string columns its length —
    * the SQL is generated per (column, kind) to mirror the Scala
    * metric builder one-for-one. */
  val profileDocuments: String = {
    val cols = Seq("doc_id" -> true, "lang" -> false,
      "source" -> false, "n_chars" -> true)
    val blocks = cols.flatMap { case (c, numeric) =>
      val m = if (numeric) s"CAST($c AS DOUBLE)" else s"CAST(length($c) AS DOUBLE)"
      Seq(
        s"SELECT '$c' AS col_name, 'n_nonnull' AS metric, CAST(count($c) AS DOUBLE) AS v FROM documents",
        s"SELECT '$c', 'n_null', CAST(count(*) FILTER ($c IS NULL) AS DOUBLE) FROM documents",
        s"SELECT '$c', 'n_distinct', CAST(count(DISTINCT $c) AS DOUBLE) FROM documents",
        s"SELECT '$c', 'min', min($m) FROM documents",
        s"SELECT '$c', 'max', max($m) FROM documents",
        s"SELECT '$c', 'mean', avg($m) FROM documents")
    }
    s"""SELECT col_name, metric, ${q("v", 6)} AS value_q6
      |FROM (${blocks.mkString("\n UNION ALL ")})""".stripMargin
  }

  /** Mirrors Q.profileHistogram / Profiler.histogram: 20 equi-width
    * bins of l_extendedprice over [0, 100000), outliers clamped to the
    * edge bins, nulls dropped. */
  val profileHistogram: String =
    s"""WITH b AS (
      |  SELECT CAST(least(greatest(floor(CAST(l_extendedprice AS DOUBLE)
      |           / 5000.0), 0), 19) AS BIGINT) AS bin
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
      |SELECT bin, ${q("bin * 5000.0", 2)} AS lo_q2,
      |       ${q("(bin + 1) * 5000.0", 2)} AS hi_q2, count(*) AS n
      |FROM b GROUP BY 1""".stripMargin

  /** Mirrors Q.zorderCells / core.ZOrder.zvalue: 16-bit two-dimension
    * Morton interleave (l_partkey bits at even positions, l_suppkey at
    * odd), coarse cells via >> 12. Generated per bit to mirror the
    * Scala unrolled expression one-for-one. */
  val zorderCells: String = {
    def dim(c: String, j: Int): String = (0 until 16).map(i =>
      s"(((CAST($c AS BIGINT) >> $i) & 1) << ${2 * i + j})").mkString(" | ")
    s"""WITH z AS (
      |  SELECT (${dim("l_partkey", 0)}) | (${dim("l_suppkey", 1)}) AS z
      |  FROM lineitem)
      |SELECT z >> 12 AS cell, count(*) AS n FROM z GROUP BY 1""".stripMargin
  }

  /** Mirrors Q.mixSample / Mixing.sampleToMix: whitespace token
    * counts, per-source availability, capped acceptance fraction
    * target·budget/avail, md5-uniform acceptance on the decimal id. */
  val mixSample: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                         x -> x <> ''))::BIGINT AS tokens
      |  FROM documents),
      |w(source, wt) AS (
      |  VALUES ('src0', 0.05), ('src1', 0.15), ('src2', 0.3), ('src3', 0.8)),
      |f AS (
      |  SELECT d.source, least(1.0, w.wt * 2000 / sum(d.tokens)) AS frac
      |  FROM d JOIN w USING (source)
      |  GROUP BY d.source, w.wt)
      |SELECT d.doc_id, d.source, d.tokens
      |FROM d JOIN f USING (source)
      |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        / 4294967296.0 < f.frac""".stripMargin

  /** Mirrors Q.mixTemperature / Mixing.temperatureMix: p^0.5-flattened
    * source shares, 1e-12-integer-quantised partition function (exact
    * sum on both engines), 1500-token budget, md5-uniform thinning. */
  val mixTemperature: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                         x -> x <> ''))::BIGINT AS tokens
      |  FROM documents),
      |a AS (SELECT source, CAST(sum(tokens) AS BIGINT) AS avail FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(avail) AS BIGINT) AS tot FROM a),
      |sh AS (
      |  SELECT source, avail,
      |         CAST(FLOOR(pow(avail / tot, 0.5) * 1e12 + 0.500000001) AS BIGINT)
      |           AS shareq
      |  FROM a CROSS JOIN t),
      |z AS (SELECT CAST(sum(shareq) AS BIGINT) AS zq FROM sh),
      |f AS (
      |  SELECT source, least(1.0, shareq / zq * 1500 / avail) AS frac
      |  FROM sh CROSS JOIN z)
      |SELECT d.doc_id, d.source, d.tokens
      |FROM d JOIN f USING (source)
      |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        / 4294967296.0 < f.frac""".stripMargin

  /** Mirrors Q.mixCurriculum / Mixing.curriculumBins: per-source
    * quality quartiles — ntile(4) over (round-6 quality, doc_id); the
    * quality formula is the [[textQuality]] composite. */
  val mixCurriculum: String =
    s"""WITH b AS (
       |  SELECT doc_id, source, text,
       |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                    x -> x <> ''))::DOUBLE AS n_tok,
       |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> x IN ('the','of','and','to','in','is','that','it','was','for',
       |        'with','as','his','on','be','at','by','this')))::DOUBLE AS n_sw
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |    round(least(n_tok / 100.0, 1.0) * 0.3 +
       |      (1.0 - least(((length(text)
       |          - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
       |          / greatest(length(text), 1)) * 5.0, 1.0)) * 0.3 +
       |      least((n_sw / greatest(n_tok, 1.0)) * 5.0, 1.0) * 0.2 +
       |      (CASE WHEN length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
       |                 / greatest(n_tok, 1.0) BETWEEN 3.0 AND 12.0
       |            THEN 1.0 ELSE 0.3 END) * 0.2, 6) AS quality
       |  FROM b)
       |SELECT doc_id, source,
       |       CAST(ntile(4) OVER (PARTITION BY source
       |              ORDER BY quality, doc_id) AS BIGINT) AS bin
       |FROM c""".stripMargin

  /** Mirrors Q.mixStratified / Mixing.stratifiedTake: per-stratum
    * exact-N cut over the md5-uniform order, ties broken by id. */
  val mixStratified: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |                 / 4294967296.0,
      |               doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, source FROM r WHERE rk <= 10""".stripMargin

  /** Mirrors Q.dedupComponents: the [[minhashMd5]] pair derivation,
    * then connected components as a recursive reachability closure —
    * componentId = min id reachable through the (symmetric) pair
    * graph, exactly the fixed point the Spark min-label propagation
    * converges to. */
  /** Shared CTE chain deriving the minhash-md5 near-dup pair closure
    * over `documents` (mirrors Dedup.minhashDupPairsMd5 at
    * shingle=3/hashes=64/bands=16/threshold=0.5 followed by the
    * transitive closure): ends with `reach(src, dst)`. Suffixes
    * append further CTEs or the final SELECT. */
  // lazy: referenced by vals declared textually earlier in the object
  private lazy val minhashClosurePrefix: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, unnest(l) AS tk, generate_subscripts(l, 1) AS i
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                           x -> x <> '') AS l
      |        FROM documents)),
      |sh AS (
      |  SELECT doc_id,
      |         ('0x' || substring(md5(
      |            tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w
      |          ), 1, 8))::BIGINT AS x
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(tk, 2) OVER w IS NOT NULL),
      |comps AS (
      |  SELECT doc_id, h, min(((2 * h + 1) * x + h * 2654435761) % 4294967296) AS comp
      |  FROM sh, range(64) r(h)
      |  GROUP BY doc_id, h),
      |bandkeys AS (
      |  SELECT doc_id, h // 4 AS band,
      |         string_agg(comp::VARCHAR, ',' ORDER BY h) AS key
      |  FROM comps GROUP BY doc_id, h // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      |  FROM bandkeys a JOIN bandkeys b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |simil AS (
      |  SELECT ia, ib,
      |         count(*) FILTER (WHERE ca.comp = cb.comp) / 64.0 AS s
      |  FROM cand
      |  JOIN comps ca ON ca.doc_id = ia
      |  JOIN comps cb ON cb.doc_id = ib AND cb.h = ca.h
      |  GROUP BY ia, ib),
      |edges AS (
      |  SELECT ia AS a, ib AS b FROM simil WHERE s >= 0.5
      |  UNION
      |  SELECT ib, ia FROM simil WHERE s >= 0.5),
      |reach(src, dst) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)""".stripMargin

  val dedupComponents: String = minhashClosurePrefix +
    raw"""
      |SELECT CAST(src AS BIGINT) AS "docId",
      |       CAST(min(dst) AS BIGINT) AS "componentId"
      |FROM reach GROUP BY src""".stripMargin

  /** Mirrors Q.dedupKeepBest / Dedup.keepClusterBest: per closure
    * component keep the max-n_chars member (ties → min doc_id);
    * unpaired docs survive. */
  val dedupKeepBest: String = minhashClosurePrefix +
    raw""",
      |lab AS (SELECT CAST(src AS BIGINT) AS doc_id,
      |               CAST(min(dst) AS BIGINT) AS comp
      |        FROM reach GROUP BY src),
      |mem AS (SELECT d.doc_id, d.n_chars, l.comp
      |        FROM documents d JOIN lab l USING (doc_id)),
      |best AS (SELECT comp, max(n_chars) AS b FROM mem GROUP BY 1),
      |win AS (SELECT m.comp, min(m.doc_id) AS w
      |        FROM mem m JOIN best ON m.comp = best.comp
      |        WHERE m.n_chars = best.b GROUP BY 1),
      |losers AS (SELECT l.doc_id FROM lab l JOIN win ON l.comp = win.comp
      |           WHERE l.doc_id <> win.w)
      |SELECT d.doc_id, d.n_chars FROM documents d
      |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin

  /** Mirrors Q.splitLeakageSafe / Mixing.assignSplitLeakageSafe:
    * md5-uniform split drawn on the closure representative (own id
    * when unpaired). */
  val splitLeakageSafe: String = minhashClosurePrefix +
    raw""",
      |lab AS (SELECT CAST(src AS BIGINT) AS doc_id,
      |               CAST(min(dst) AS BIGINT) AS comp
      |        FROM reach GROUP BY src),
      |rep AS (SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS rep
      |        FROM documents d LEFT JOIN lab l USING (doc_id)),
      |u AS (SELECT doc_id,
      |        (('0x' || substring(md5(CAST(rep AS VARCHAR) || ':split'),
      |                            1, 8))::BIGINT) / 4294967296.0 AS u
      |      FROM rep)
      |SELECT doc_id,
      |  CASE WHEN u < 0.2 THEN 'val'
      |       WHEN u < 0.4 THEN 'test'
      |       ELSE 'train' END AS split
      |FROM u""".stripMargin

  /** Mirrors Dedup.simhashDupPairsMd5: 60-bit md5 token hash,
    * sign-sum bits over the token multiset, 15-bit quarter blocking,
    * Hamming ≤ 3 via popcount(xor). */
  val simhashMd5: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(
      |           string_split_regex(lower(trim(text)), '\s+'),
      |           x -> x <> '')) AS tk
      |  FROM documents),
      |th AS (
      |  SELECT doc_id, ('0x' || substring(md5(tk), 1, 15))::BIGINT AS x
      |  FROM toks),
      |bitsum AS (
      |  SELECT doc_id, b,
      |         CASE WHEN count(*) FILTER (WHERE (x >> b) & 1 = 1)
      |                   > count(*) FILTER (WHERE (x >> b) & 1 = 0)
      |              THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM th, range(60) r(b)
      |  GROUP BY doc_id, b),
      |sims AS (
      |  SELECT doc_id, CAST(sum(bit * (1::BIGINT << b)) AS BIGINT) AS sh
      |  FROM bitsum GROUP BY doc_id),
      |quarters AS (
      |  SELECT doc_id, sh, qi, (sh >> (15 * qi)) & 32767 AS qv
      |  FROM sims, range(4) r(qi)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
      |                  a.sh AS sa, b.sh AS sb
      |  FROM quarters a JOIN quarters b
      |    ON a.qi = b.qi AND a.qv = b.qv AND a.doc_id < b.doc_id)
      |SELECT ia AS "idA", ib AS "idB",
      |       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin

  val variantHash: String =
    """WITH v AS (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |         '1_' || l_partkey || '_' || repeat('A', CAST(l_quantity AS INT))
      |           || '_T' AS vid,
      |         CASE WHEN l_suppkey % 7 = 0 THEN NULL
      |              ELSE CAST(l_suppkey % 22 + 1 AS VARCHAR) END AS chromosome,
      |         l_partkey AS position
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |       CASE WHEN chromosome IS NULL THEN 'OTVAR_' || md5(vid)
      |            WHEN length(vid) >= 30 THEN
      |              concat_ws('_', 'OTVAR', chromosome,
      |                        CAST(position AS VARCHAR), md5(vid))
      |            ELSE vid END AS "hashedVariantId"
      |FROM v""".stripMargin

  /** name → oracle SQL, keyed identically to SparkEntry.queries. */
  /** Mirrors Q.rsidGnomadMapping +
    * GwasCatalogAssociations.mapVariantsToGnomadVariants. */
  val rsidGnomadMapping: String =
    """WITH assoc AS (
      |  SELECT 'a' || o_orderkey AS "rowId",
      |         CAST(o_custkey % 3 AS VARCHAR) AS chromosome,
      |         CAST((o_orderkey * 61) % 100000 AS INT) AS ens_pos,
      |         ['rs' || (o_orderkey % 5000)] AS rsids_gwas,
      |         ['A','C','G','T'][CAST(o_orderkey % 4 AS INT) + 1] AS risk
      |  FROM orders),
      |vi AS (
      |  SELECT 'v' || l_orderkey || '_' || l_linenumber AS "variantId",
      |         CAST(l_suppkey % 3 AS VARCHAR) AS chromosome,
      |         CAST((l_orderkey * 61) % 100000 AS INT) AS position,
      |         CASE WHEN l_partkey % 7 = 0 THEN 'AT'
      |              ELSE ['A','C','G','T'][CAST(l_partkey % 4 AS INT) + 1]
      |         END AS ref,
      |         ['A','C','G','T'][CAST(l_partkey % 3 AS INT) + 1] AS alt,
      |         ['rs' || (l_partkey % 5000)] AS rsids_gnomad,
      |         (l_orderkey * 8 + l_linenumber) / 1e9 AS maxmaf
      |  FROM lineitem),
      |vi2 AS (
      |  SELECT *, CASE WHEN length(ref) > 1 OR length(alt) > 1
      |                 THEN position + 1 ELSE position END AS ens_pos
      |  FROM vi),
      |cand AS (
      |  SELECT a."rowId", a.risk, a.rsids_gwas,
      |         v."variantId", v.position, v.ref, v.alt, v.rsids_gnomad, v.maxmaf
      |  FROM assoc a LEFT JOIN vi2 v USING (chromosome, ens_pos)),
      |flagged AS (
      |  SELECT *,
      |    len(list_intersect(coalesce(rsids_gnomad, []), rsids_gwas)) > 0 AS rs_ok,
      |    CASE WHEN risk = ref OR risk = alt THEN true
      |         WHEN reverse(translate(risk, 'ACTG', 'TGAC')) = ref
      |           OR reverse(translate(risk, 'ACTG', 'TGAC')) = alt THEN true
      |         WHEN risk = '?' THEN true
      |         WHEN ref IS NULL THEN true
      |         ELSE false END AS conc_ok
      |  FROM cand),
      |retained AS (
      |  SELECT *,
      |    NOT (bool_or(rs_ok) OVER (PARTITION BY "rowId") AND NOT rs_ok)
      |      AS rs_filter,
      |    NOT (bool_or(conc_ok) OVER (PARTITION BY "rowId") AND NOT conc_ok)
      |      AS conc_filter
      |  FROM flagged),
      |best AS (
      |  SELECT "rowId", "variantId", CAST(position AS BIGINT) AS position
      |  FROM retained WHERE rs_filter OR conc_filter
      |  QUALIFY row_number() OVER
      |    (PARTITION BY "rowId" ORDER BY maxmaf DESC NULLS LAST) = 1)
      |SELECT a."rowId", b."variantId", b.position
      |FROM assoc a LEFT JOIN best b USING ("rowId")""".stripMargin

  /** Mirrors Q.ldAnnotateQuery + LDAnnotator.ldAnnotate. The engine
    * resolves the major population by sorting the (unsorted) literal
    * population arrays with the nfe tie rule; the oracle hard-codes
    * the independently-computed expected majors (s0 nfe, s1 afr,
    * s2 tie→nfe, s3 eas, s4 afr) and replays the per-tag r² scoring,
    * threshold filter, self-tag force-1.0 and the unresolved/rescue
    * branch relationally on the flattened output. */
  val ldAnnotate: String =
    s"""WITH base AS (
      |  SELECT DISTINCT l_partkey % 500 AS vkey,
      |         's' || (l_orderkey % 5) AS "studyId",
      |         CAST(l_suppkey % 3 AS VARCHAR) AS chromosome
      |  FROM lineitem),
      |major AS (
      |  SELECT * FROM (VALUES ('s0','nfe'),('s1','afr'),('s2','nfe'),
      |                        ('s3','eas'),('s4','afr')) AS m("studyId", pop)),
      |ldvar AS (
      |  SELECT DISTINCT vkey, chromosome FROM base WHERE vkey % 11 <> 0),
      |tags AS (
      |  SELECT vkey, chromosome,
      |         CASE WHEN vkey % 7 = 0 THEN 'v' || vkey
      |              ELSE 'v' || (vkey + 1) END AS tag,
      |         (vkey*7 % 100)/100.0 AS r_nfe,
      |         (vkey*13 % 100)/100.0 AS r_afr
      |  FROM ldvar
      |  UNION ALL
      |  SELECT vkey, chromosome, 'v' || (vkey + 2),
      |         CASE WHEN vkey % 5 = 0 THEN NULL
      |              ELSE (vkey*17 % 100)/100.0 END,
      |         CASE WHEN vkey % 5 = 0 THEN (vkey*17 % 100)/100.0
      |              ELSE (vkey*19 % 100)/100.0 END
      |  FROM ldvar),
      |scored AS (
      |  SELECT b."studyId", b.chromosome, b.vkey, t.tag,
      |         coalesce(CASE m.pop WHEN 'nfe' THEN t.r_nfe * t.r_nfe
      |                             WHEN 'afr' THEN t.r_afr * t.r_afr
      |                             ELSE NULL END, 0.0) AS r2
      |  FROM base b
      |  JOIN major m USING ("studyId")
      |  JOIN tags t ON t.vkey = b.vkey AND t.chromosome = b.chromosome),
      |resolved AS (
      |  SELECT "studyId", chromosome, vkey, tag,
      |         CASE WHEN tag = 'v' || vkey THEN 1.0 ELSE r2 END AS r2
      |  FROM scored WHERE r2 >= 0.5),
      |cnt AS (
      |  SELECT "studyId", chromosome, vkey, count(*) AS n
      |  FROM resolved GROUP BY 1, 2, 3)
      |SELECT b."studyId", b.chromosome, 'v' || b.vkey AS "variantId",
      |       TRUE AS unresolved, 'v' || b.vkey AS "tagVariantId",
      |       ${q("1.0", 6)} AS r2_q6
      |FROM base b LEFT JOIN cnt c
      |  ON c."studyId" = b."studyId" AND c.chromosome = b.chromosome
      |     AND c.vkey = b.vkey
      |WHERE coalesce(c.n, 0) = 0
      |UNION ALL
      |SELECT r."studyId", r.chromosome, 'v' || r.vkey, FALSE, r.tag,
      |       ${q("r.r2", 6)}
      |FROM resolved r""".stripMargin

  /** Mirrors Q.effectNormQuery + VariantOps.normalisedEffectScore /
    * mostSevereConsequence. The scale arithmetic is written op-for-op
    * (e.g. GERP's divisor as 6.17 - (-3.0)) so both engines evaluate
    * identical doubles; severities are injective per variant so the
    * argmax needs no tie rule. */
  val effectNorm: String =
    s"""WITH base AS (
      |  SELECT p_partkey,
      |         ['AlphaMissense','CADD','SIFT','PolyPhen','GERP','FoldX',
      |          'Pangolin','LOFTEE','NoSuchMethod'
      |         ][CAST(p_partkey % 9 + 1 AS INT)] AS method,
      |         ((p_partkey % 47) - 5.0) / 10.0 AS s
      |  FROM part),
      |norm AS (
      |  SELECT p_partkey, method,
      |         CASE method
      |           WHEN 'AlphaMissense' THEN least(greatest((s - 0.0) / (1.0 - 0.0), 0.0), 1.0)
      |           WHEN 'CADD' THEN least(greatest((s - 0.0) / (40.0 - 0.0), 0.0), 1.0)
      |           WHEN 'SIFT' THEN 1.0 - least(greatest((s - 0.0) / (1.0 - 0.0), 0.0), 1.0)
      |           WHEN 'PolyPhen' THEN least(greatest((s - 0.0) / (1.0 - 0.0), 0.0), 1.0)
      |           WHEN 'GERP' THEN least(greatest((s - (-3.0)) / (6.17 - (-3.0)), 0.0), 1.0)
      |           WHEN 'FoldX' THEN least(greatest((s - 0.0) / (10.0 - 0.0), 0.0), 1.0)
      |           WHEN 'Pangolin' THEN least(greatest((s - 0.0) / (1.0 - 0.0), 0.0), 1.0)
      |           WHEN 'LOFTEE' THEN CASE WHEN s >= 1.0 THEN 1.0 ELSE 0.0 END
      |           ELSE NULL END AS n
      |  FROM base),
      |tr AS (
      |  SELECT p_partkey, i,
      |         ['missense_variant','stop_gained','synonymous_variant',
      |          'intron_variant'][CAST((p_partkey + i) % 4 + 1 AS INT)] AS term
      |  FROM part, UNNEST(generate_series(1, CAST(p_partkey % 3 + 1 AS INT))) AS u(i)),
      |worst AS (
      |  SELECT p_partkey, term
      |  FROM (SELECT p_partkey, term,
      |               CASE term WHEN 'stop_gained' THEN 4.0
      |                         WHEN 'missense_variant' THEN 3.0
      |                         WHEN 'synonymous_variant' THEN 2.0
      |                         ELSE 1.0 END AS sev
      |        FROM tr)
      |  QUALIFY row_number() OVER (PARTITION BY p_partkey ORDER BY sev DESC) = 1)
      |SELECT n.p_partkey, n.method, ${q("n.n", 6)} AS norm_q6,
      |       w.term AS worst_term
      |FROM norm n JOIN worst w USING (p_partkey)""".stripMargin

  /** Mirrors Q.liftoverQuery + Liftover.liftPositions: the broadcast
    * binary-search conversion replayed as a block-containment join
    * (blocks are sorted and non-overlapping, so "last srcStart ≤ pos,
    * then pos < srcEnd" ≡ containment) with the 1→0-based shift and
    * the strand-flip arithmetic inline. Unindexed chromosomes and gap
    * positions drop on both engines. */
  val liftover: String =
    """WITH blocks(src_chrom, src_start, src_end, tgt_start, tgt_chrom,
      |            flipped, tgt_size) AS (
      |  VALUES ('1', 0, 1000, 10000, '1', FALSE, 50000),
      |         ('1', 2000, 3000, 500, '5', FALSE, 50000),
      |         ('1', 5000, 8000, 20000, '1', TRUE, 50000),
      |         ('2', 100, 4000, 7, '2', FALSE, 100000)),
      |rows AS (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |         CAST(l_suppkey % 3 AS VARCHAR) AS chrom,
      |         (l_partkey * 37) % 10000 AS p0
      |  FROM lineitem)
      |SELECT r.l_orderkey, r.l_linenumber, b.tgt_chrom AS chromosome,
      |       CAST(CASE WHEN b.flipped
      |              THEN b.tgt_size - 1 - (b.tgt_start + (r.p0 - b.src_start))
      |              ELSE b.tgt_start + (r.p0 - b.src_start) END
      |            + 1 AS BIGINT) AS position
      |FROM rows r
      |JOIN blocks b ON b.src_chrom = r.chrom
      |  AND r.p0 >= b.src_start AND r.p0 < b.src_end""".stripMargin

  /** Mirrors Q.ontologyClosureQuery + BiosampleOntology.graphTraversal:
    * the engine's broadcast-adjacency DFS closure replayed as a
    * recursive CTE; roots surface as the (node, NULL) row
    * explode_outer emits for their empty ancestor set. */
  val ontologyClosure: String =
    """WITH RECURSIVE nodes AS (
      |  SELECT DISTINCT l_partkey % 300 AS k FROM lineitem),
      |edges AS (
      |  SELECT k AS child, CAST(floor(k/3.0) AS INT) AS parent
      |  FROM nodes WHERE k > 0
      |  UNION
      |  SELECT k, CAST(floor(k/3.0) AS INT) + 1
      |  FROM nodes WHERE k % 4 = 0 AND k >= 2),
      |anc AS (
      |  SELECT child AS node, parent AS anc FROM edges
      |  UNION
      |  SELECT a.node, e.parent FROM anc a JOIN edges e ON e.child = a.anc)
      |SELECT 'n' || n.k AS "biosampleId", 'n' || a.anc AS "ancestorId"
      |FROM nodes n LEFT JOIN anc a ON a.node = n.k""".stripMargin

  /** Mirrors Q.variantMergeQuery + VariantOps.mergeAnnotations.
    * safeArrayUnion's ordered dedup is replayed as a relational
    * DISTINCT union (the engine explodes the merged array, so only
    * set content is compared); a side whose array was nulled (%11 /
    * %13) contributes nothing, and a variant with no contributing
    * side yields the single (NULL src, NULL n_src) row explode_outer
    * emits. */
  val variantMerge: String =
    s"""WITH lrows AS (
      |  SELECT l_partkey % 800 AS vkey,
      |         'src' || (l_suppkey % 10) AS src, l_quantity
      |  FROM lineitem WHERE (l_partkey % 800) % 3 <> 0),
      |lagg AS (
      |  SELECT vkey,
      |         CASE WHEN vkey % 5 = 0 THEN NULL
      |              ELSE max(l_quantity) END AS maf
      |  FROM lrows GROUP BY vkey),
      |lpairs AS (
      |  SELECT DISTINCT vkey, src FROM lrows WHERE vkey % 11 <> 0),
      |rrows AS (
      |  SELECT p_partkey % 800 AS vkey, 'src' || (p_size % 13) AS src
      |  FROM part WHERE (p_partkey % 800) % 2 = 0),
      |ragg AS (
      |  SELECT vkey,
      |         CASE WHEN vkey % 7 = 0 THEN NULL
      |              ELSE vkey / 1000.0 END AS maf
      |  FROM rrows GROUP BY vkey),
      |rpairs AS (
      |  SELECT DISTINCT vkey, src FROM rrows WHERE vkey % 13 <> 0),
      |allv AS (
      |  SELECT vkey FROM lagg UNION SELECT vkey FROM ragg),
      |pairs AS (
      |  SELECT vkey, src FROM lpairs UNION SELECT vkey, src FROM rpairs),
      |cnt AS (SELECT vkey, count(*) AS n FROM pairs GROUP BY vkey),
      |merged AS (
      |  SELECT a.vkey, coalesce(l.maf, r.maf) AS maf, c.n
      |  FROM allv a
      |  LEFT JOIN lagg l ON l.vkey = a.vkey
      |  LEFT JOIN ragg r ON r.vkey = a.vkey
      |  LEFT JOIN cnt c ON c.vkey = a.vkey)
      |SELECT 'v' || m.vkey AS "variantId", ${q("m.maf", 3)} AS maf_q3,
      |       m.n AS n_src, p.src
      |FROM merged m LEFT JOIN pairs p ON p.vkey = m.vkey""".stripMargin

  /** Mirrors Q.ldClump + LDClumping.clump. The oracle keeps the
    * reference's declarative window shape (running collect_set
    * intersected with {lead} ∪ ldSet tags); the engine computes the
    * same relation with the linear aggregate/explode/equi-join plan —
    * equivalence is exactly what the hash compare certifies (p-values
    * are injective in the synthesis, so ties cannot split them). */
  val ldClump: String =
    """WITH grouped AS (
      |  SELECT l_partkey % 2000 AS vkey, 's' || (l_orderkey % 5) AS "studyId",
      |         CAST(l_suppkey % 3 AS VARCHAR) AS chromosome
      |  FROM lineitem GROUP BY 1, 2, 3),
      |assoc AS (
      |  SELECT 'v' || vkey AS "variantId", "studyId", chromosome,
      |         CAST(vkey / 2000.0 + 1.0 AS REAL) AS mant,
      |         CAST(-(vkey % 12) - 4 AS INT) AS expo,
      |         'v' || (vkey + 1) AS tag
      |  FROM grouped)
      |SELECT "studyId", chromosome, "variantId",
      |  len(list_intersect(
      |    list("variantId") OVER (PARTITION BY "studyId", chromosome
      |      ORDER BY expo, mant
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    ["variantId", tag])) > 1 AS "ldClumped"
      |FROM assoc""".stripMargin

  /** Mirrors Q.locusBreaker + LocusBreakerClumping.clump with
    * (1e-4, 20000, 1e-8, 5000). Significance-filter constants are
    * computed in Scala so both engines compare against the exact same
    * doubles. */
  val locusBreaker: String = {
    val e0 = math.floor(math.log10(1e-4)).toInt
    val m0 = 1e-4 / math.pow(10.0, e0)
    val negLogCutoff = -math.log10(1e-8)
    s"""WITH $synthSumstatsCte,
      |sig AS (
      |  SELECT * FROM ss WHERE expo < $e0 OR (expo = $e0 AND mant <= $m0)),
      |d AS (
      |  SELECT *, -(log10(mant) + expo) AS neglogp,
      |    position - lag(position) OVER w AS dist
      |  FROM sig
      |  WINDOW w AS (PARTITION BY "studyId", chromosome
      |               ORDER BY position, l_orderkey, l_linenumber)),
      |b AS (
      |  SELECT *, CASE WHEN dist > 20000 OR dist IS NULL
      |                 THEN position END AS boundary
      |  FROM d),
      |f AS (
      |  SELECT *, last_value(boundary - 5000 IGNORE NULLS) OVER
      |    (PARTITION BY "studyId", chromosome
      |     ORDER BY position, l_orderkey, l_linenumber
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runstart
      |  FROM b),
      |g AS (
      |  SELECT *, CASE WHEN runstart > 0 THEN runstart ELSE 0 END
      |    AS locus_start
      |  FROM f),
      |h AS (
      |  SELECT *, max(position + 5000) OVER
      |    (PARTITION BY "studyId", chromosome, locus_start) AS locus_end
      |  FROM g),
      |r AS (
      |  SELECT *, rank() OVER
      |    (PARTITION BY "studyId", chromosome, locus_start, locus_end
      |     ORDER BY neglogp DESC) AS rnk
      |  FROM h)
      |SELECT "studyId", chromosome, CAST(position AS BIGINT) AS position,
      |       "variantId", mant AS "pValueMantissa", expo AS "pValueExponent",
      |       beta, se AS "standardError", l_orderkey, l_linenumber,
      |       CAST(locus_start AS BIGINT) AS "locusStart",
      |       CAST(locus_end AS BIGINT) AS "locusEnd",
      |       md5("studyId" || "variantId") AS "studyLocusId"
      |FROM r WHERE rnk = 1 AND neglogp > $negLogCutoff""".stripMargin
  }

  /** Mirrors Q.studyValidation + the Validators battery. */
  val studyValidation: String =
    """WITH st AS (SELECT o_orderkey % 300 AS sk FROM orders),
      |studies AS (
      |  SELECT 's' || sk AS "studyId",
      |         ['gwas','eqtl','pqtl','weird'][CAST(sk % 4 AS INT) + 1]
      |           AS "studyType",
      |         CASE WHEN sk % 5 = 0 THEN 'gX'
      |              ELSE 'g' || (sk % 50) END AS "geneId",
      |         'b' || (sk % 20) AS "biosampleFromSourceId",
      |         sk % 20 >= 10 AS bio_unknown,
      |         row_number() OVER (PARTITION BY sk) > 1 AS is_dup
      |  FROM st),
      |flagged AS (
      |  SELECT *,
      |    CASE WHEN is_dup
      |         THEN 'The identifier of this study is not unique' END AS f1,
      |    CASE WHEN NOT ("studyType" = 'gwas' OR "studyType" LIKE '%qtl')
      |         THEN 'This type of study is not supported' END AS f2,
      |    CASE WHEN "studyType" <> 'gwas' AND "geneId" = 'gX'
      |         THEN 'Target/gene identifier could not match to reference'
      |    END AS f3,
      |    CASE WHEN "studyType" <> 'gwas' AND bio_unknown
      |         THEN 'Biosample identifier was not found in the reference'
      |    END AS f4
      |  FROM studies)
      |SELECT "studyId", "studyType", "geneId", "biosampleFromSourceId",
      |  coalesce(array_to_string(list_sort(
      |    list_filter([f1, f2, f3, f4], x -> x IS NOT NULL)), ','), '')
      |    AS "qcFlags"
      |FROM flagged""".stripMargin

  /** Mirrors Q.ancestryAggregation +
    * StudyIndexOps.aggregateAndMapAncestries. */
  val ancestryAggregation: String =
    s"""WITH src AS (
      |  SELECT o_custkey % 100 AS "studyKey",
      |         ['nfe','fin','eas','sas','afr','nfe']
      |           [CAST(o_orderkey % 6 AS INT) + 1] AS pop,
      |         o_totalprice / 100 AS ss
      |  FROM orders),
      |agg AS (
      |  SELECT "studyKey", pop, sum(ss) AS pop_ss FROM src GROUP BY 1, 2),
      |tot AS (
      |  SELECT *, sum(pop_ss) OVER (PARTITION BY "studyKey") AS total
      |  FROM agg)
      |SELECT "studyKey", pop AS "ldPopulation",
      |       ${q("pop_ss / total", 6)} AS rel_q6
      |FROM tot""".stripMargin

  /** Mirrors Q.l2gDistanceFeatures + L2GFeatures.distanceFeatures. */
  val l2gDistanceFeatures: String = {
    def feat(expr: String, name: String): String =
      s"""CASE WHEN coalesce($expr, 0) <= 0 THEN NULL
         |     ELSE ${q(s"log10($expr) / log10(500001)", 6)} END
         |  AS "$name"""".stripMargin
    s"""WITH cs AS (
      |  SELECT 'L' || l_orderkey AS slid,
      |         'v' || min(l_partkey) AS lead_v
      |  FROM lineitem GROUP BY 1),
      |tags AS (
      |  SELECT 'L' || l_orderkey AS slid, 'v' || l_partkey AS tv,
      |         l_discount * 10 AS pp
      |  FROM lineitem),
      |dist AS (
      |  SELECT 'v' || p_partkey AS tv, 'g' || (p_partkey % 50) AS gene,
      |         (p_partkey * 37) % 400000 AS dtss,
      |         (p_partkey * 53) % 400000 AS dfp
      |  FROM part),
      |joined AS (
      |  SELECT t.slid, d.gene, t.pp, d.dtss, d.dfp,
      |         t.tv = c.lead_v AS is_lead
      |  FROM tags t JOIN dist d USING (tv) JOIN cs c ON t.slid = c.slid)
      |SELECT slid AS "studyLocusId", gene AS "geneId",
      |  ${feat("sum((500000 - dtss + 1) * pp)", "distanceTssMean_q6")},
      |  ${feat("max(CASE WHEN is_lead THEN 500000 - dtss + 1 END)",
          "distanceSentinelTss_q6")},
      |  ${feat("sum((500000 - dfp + 1) * pp)", "distanceFootprintMean_q6")},
      |  ${feat("max(CASE WHEN is_lead THEN 500000 - dfp + 1 END)",
          "distanceSentinelFootprint_q6")}
      |FROM joined GROUP BY 1, 2""".stripMargin
  }

  /** Mirrors Q.ecaviarFusedE2E: the same deduped tag synthesis as
    * [[overlapsColocE2E]] feeding the fused eCAVIAR kernel — CLPP and
    * the beta-sign average aggregated straight off the tag self-join
    * (every addend an exact decimal, so the sums are
    * order-independent across engines). */
  val ecaviarFusedE2E: String =
    s"""WITH t0 AS (
      |  SELECT l_orderkey, l_partkey,
      |         min(l_extendedprice) AS price, min(l_discount) AS disc,
      |         min(l_tax) AS tax
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT 'L' || l_orderkey AS slid,
      |         CASE WHEN l_orderkey % 2 = 0 THEN 'gwas' ELSE 'eqtl' END
      |           AS stype,
      |         CAST(l_partkey % 24 AS VARCHAR) AS chromosome,
      |         'v' || l_partkey || '_' || (l_orderkey % 2) AS tv,
      |         disc * 10 AS pp,
      |         tax AS beta
      |  FROM t0),
      |m AS (
      |  SELECT l.chromosome, l.slid AS lslid, r.slid AS rslid,
      |         r.stype AS rtype,
      |         l.pp AS lpp, r.pp AS rpp,
      |         l.beta AS l_beta, r.beta AS r_beta
      |  FROM t l JOIN t r
      |    ON l.chromosome = r.chromosome AND l.tv = r.tv
      |   AND (r.stype <> 'gwas' OR l.slid > r.slid)
      |   AND l.stype = 'gwas')
      |SELECT lslid AS "leftStudyLocusId", rslid AS "rightStudyLocusId",
      |       rtype AS "rightStudyType", chromosome,
      |       count(*) AS "numberColocalisingVariants",
      |       ${q("sum(lpp * rpp)", 6)} AS clpp_q6,
      |       ${q("avg(CASE WHEN l_beta IS NOT NULL AND r_beta IS NOT NULL" +
            " AND l_beta <> 0 AND r_beta <> 0" +
            " THEN sign(l_beta / r_beta) END)", 6)} AS beta_ratio_q6
      |FROM m GROUP BY 1, 2, 3, 4""".stripMargin

  /** Mirrors Q.overlapsColocE2E: deduped tag synthesis feeding the
    * FUSED COLOC decomposition (per-locus logsumexps + intersection
    * aggregates off the tag self-join — same math the engine's
    * Coloc.colocaliseFused computes, mirrored term by term). */
  val overlapsColocE2E: String =
    s"""WITH t0 AS (
      |  SELECT l_orderkey, l_partkey,
      |         min(l_extendedprice) AS price, min(l_discount) AS disc,
      |         min(l_tax) AS tax
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT 'L' || l_orderkey AS slid,
      |         CASE WHEN l_orderkey % 2 = 0 THEN 'gwas' ELSE 'eqtl' END
      |           AS stype,
      |         CAST(l_partkey % 24 AS VARCHAR) AS chromosome,
      |         'v' || l_partkey || '_' || (l_orderkey % 2) AS tv,
      |         price / 1000 AS logbf,
      |         disc * 10 AS pp,
      |         tax AS beta
      |  FROM t0),
      |t1 AS (
      |  SELECT *, max(logbf) OVER (PARTITION BY chromosome, slid) AS mxl
      |  FROM t),
      |la AS (
      |  SELECT chromosome, slid, count(*) AS nloc,
      |         max(mxl) + ln(sum(exp(logbf - mxl))) AS lse
      |  FROM t1 GROUP BY 1, 2),
      |m AS (
      |  SELECT l.chromosome, l.slid AS lslid, r.slid AS rslid,
      |         r.stype AS rtype,
      |         l.logbf AS lbf, r.logbf AS rbf,
      |         l.pp AS lpp, r.pp AS rpp,
      |         l.beta AS l_beta, r.beta AS r_beta
      |  FROM t l JOIN t r
      |    ON l.chromosome = r.chromosome AND l.tv = r.tv
      |   AND (r.stype <> 'gwas' OR l.slid > r.slid)
      |   AND l.stype = 'gwas'),
      |m1 AS (
      |  SELECT *, max(lbf) OVER w AS mx1, max(rbf) OVER w AS mx2,
      |         max(lbf + rbf) OVER w AS mx12
      |  FROM m
      |  WINDOW w AS (PARTITION BY chromosome, lslid, rslid, rtype)),
      |pa AS (
      |  SELECT chromosome, lslid, rslid, rtype,
      |         count(*) AS nab,
      |         max(mx1) + ln(sum(exp(lbf - mx1))) AS lseaab,
      |         max(mx2) + ln(sum(exp(rbf - mx2))) AS lsebab,
      |         max(mx12) + ln(sum(exp(lbf + rbf - mx12))) AS lse12ab,
      |         max(CASE WHEN lpp > 0.5 AND rpp > 0.5
      |                  THEN 1 ELSE 0 END) AS anyhigh,
      |         avg(CASE WHEN l_beta IS NOT NULL AND r_beta IS NOT NULL
      |                   AND l_beta <> 0 AND r_beta <> 0
      |                  THEN sign(l_beta / r_beta) END) AS bra
      |  FROM m1 GROUP BY 1, 2, 3, 4),
      |j AS (
      |  SELECT pa.*, a.nloc AS na, a.lse AS lsea,
      |         b.nloc AS nb, b.lse AS lseb
      |  FROM pa
      |  JOIN la a ON pa.chromosome = a.chromosome AND pa.lslid = a.slid
      |  JOIN la b ON pa.chromosome = b.chromosome AND pa.rslid = b.slid),
      |j2 AS (
      |  SELECT *,
      |         CASE WHEN na - nab > 0 THEN
      |           CASE WHEN lsea <= lseaab THEN ln(1e-10)
      |                ELSE lsea + ln(1 - exp(lseaab - lsea)) END
      |         END AS ta,
      |         CASE WHEN nb - nab > 0 THEN
      |           CASE WHEN lseb <= lsebab THEN ln(1e-10)
      |                ELSE lseb + ln(1 - exp(lsebab - lseb)) END
      |         END AS tb
      |  FROM j),
      |j3 AS (
      |  SELECT *, greatest(lse12ab, coalesce(ta, lse12ab),
      |                     coalesce(tb, lse12ab)) AS mxf
      |  FROM j2),
      |g AS (
      |  SELECT chromosome, lslid, rslid, rtype,
      |         nab AS n, anyhigh, bra,
      |         CASE WHEN nb - nab = 0 THEN lsea
      |              ELSE greatest(lsea, ln(nb - nab))
      |                   + ln(exp(lsea - greatest(lsea, ln(nb - nab)))
      |                        + exp(ln(nb - nab)
      |                              - greatest(lsea, ln(nb - nab))))
      |         END AS ls1,
      |         CASE WHEN na - nab = 0 THEN lseb
      |              ELSE greatest(lseb, ln(na - nab))
      |                   + ln(exp(lseb - greatest(lseb, ln(na - nab)))
      |                        + exp(ln(na - nab)
      |                              - greatest(lseb, ln(na - nab))))
      |         END AS ls2,
      |         mxf + ln(exp(lse12ab - mxf)
      |                  + coalesce(exp(ta - mxf), 0)
      |                  + coalesce(exp(tb - mxf), 0)) AS ls12
      |  FROM j3),
      |h AS (
      |  SELECT *,
      |         CASE WHEN ls1 + ls2 = ls12 THEN 1e-10
      |              ELSE greatest(ls1 + ls2, ls12)
      |                   + ln(exp(ls1 + ls2 - greatest(ls1 + ls2, ls12))
      |                        - exp(ls12 - greatest(ls1 + ls2, ls12)))
      |         END AS logdiff
      |  FROM g WHERE n > 5 OR anyhigh = 1),
      |bf AS (
      |  SELECT *, 0.0 AS lh0, ln(1e-4) + ls1 AS lh1, ln(1e-4) + ls2 AS lh2,
      |         ln(1e-4) + ln(1e-4) + logdiff AS lh3, ln(1e-5) + ls12 AS lh4
      |  FROM h),
      |post AS (
      |  SELECT *, greatest(lh0, lh1, lh2, lh3, lh4) AS hmax,
      |         exp(lh0 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh1 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh2 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh3 - greatest(lh0, lh1, lh2, lh3, lh4))
      |         + exp(lh4 - greatest(lh0, lh1, lh2, lh3, lh4)) AS denom
      |  FROM bf)
      |SELECT lslid AS "leftStudyLocusId", rslid AS "rightStudyLocusId",
      |       rtype AS "rightStudyType", chromosome,
      |       CAST(n AS BIGINT) AS "numberColocalisingVariants",
      |       ${q("exp(lh0 - hmax) / denom", 4)} AS h0_q4,
      |       ${q("exp(lh1 - hmax) / denom", 4)} AS h1_q4,
      |       ${q("exp(lh2 - hmax) / denom", 4)} AS h2_q4,
      |       ${q("exp(lh3 - hmax) / denom", 4)} AS h3_q4,
      |       ${q("exp(lh4 - hmax) / denom", 4)} AS h4_q4,
      |       ${q("bra", 6)} AS beta_ratio_q6
      |FROM post""".stripMargin

  /** Mirrors Q.l2gGoldStandard + ml.L2GGoldStandard.fromOtgCuration:
    * curated positives → window negatives → overlap-dedup →
    * interaction false-negative cleanup. */
  val l2gGoldStandard: String =
    """WITH cur AS (
      |  SELECT 'GCST' || CAST(o_orderkey % 300 AS VARCHAR) AS studyid,
      |         'g' || CAST(o_custkey % 60 AS VARCHAR) AS geneid,
      |         CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T'
      |           AS variantid,
      |         CASE WHEN o_orderkey % 2 = 0 THEN 'ProGeM' ELSE 'OTG' END
      |           AS source,
      |         CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'High'
      |              WHEN 1 THEN 'Medium' ELSE 'Low' END AS conf
      |  FROM orders),
      |pos AS (
      |  SELECT md5(studyid || '_' || variantid) AS slid, studyid,
      |         variantid, geneid,
      |         list_sort(list_distinct(list(source))) AS sources
      |  FROM cur WHERE conf IN ('High', 'Medium')
      |  GROUP BY 1, 2, 3, 4),
      |dist AS (
      |  SELECT CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T'
      |           AS variantid,
      |         'g' || CAST(o_custkey % 60 AS VARCHAR) AS targetid,
      |         o_orderkey * 13 % 800000 AS dtss
      |  FROM orders
      |  UNION ALL
      |  SELECT CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T',
      |         'g' || CAST((o_custkey + 7) % 60 AS VARCHAR),
      |         o_orderkey * 17 % 800000
      |  FROM orders
      |  UNION ALL
      |  SELECT CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T',
      |         'g' || CAST((o_custkey + 21) % 60 AS VARCHAR),
      |         o_orderkey * 23 % 800000
      |  FROM orders),
      |gs AS (
      |  SELECT p.slid, p.studyid, p.variantid,
      |         CASE WHEN p.geneid = d.targetid OR d.targetid IS NULL
      |              THEN p.geneid ELSE d.targetid END AS geneid,
      |         CASE WHEN p.geneid = d.targetid OR d.targetid IS NULL
      |              THEN 'positive' ELSE 'negative' END AS label,
      |         p.sources
      |  FROM pos p
      |  LEFT JOIN (SELECT * FROM dist WHERE dtss <= 500000) d
      |    USING (variantid)),
      |sq AS (
      |  SELECT md5('GCST' || CAST(o_orderkey % 300 AS VARCHAR) || '_' ||
      |           CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T')
      |           AS slid,
      |         CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T' AS tv
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION
      |  SELECT 'x' || CAST(o_orderkey AS VARCHAR),
      |         CAST(o_custkey % 5 AS VARCHAR) || '_' ||
      |           CAST(o_orderkey * 7 % 100000 AS VARCHAR) || '_A_T'
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |multi AS (
      |  SELECT geneid FROM gs GROUP BY 1
      |  HAVING count(DISTINCT slid) > 1),
      |fu AS (
      |  SELECT * FROM gs g
      |  WHERE NOT (
      |    EXISTS (SELECT 1 FROM sq
      |            WHERE sq.slid = g.slid AND sq.tv = g.variantid)
      |    AND EXISTS (SELECT 1 FROM multi m WHERE m.geneid = g.geneid))),
      |inter AS (
      |  SELECT 'g' || CAST(p_partkey % 60 AS VARCHAR) AS a,
      |         'g' || CAST((p_partkey * 7 + 1) % 60 AS VARCHAR) AS b,
      |         max((p_partkey % 100) / 100.0) AS sc
      |  FROM part GROUP BY 1, 2),
      |sqi AS (
      |  SELECT a, b FROM
      |    (SELECT a, b, sc FROM inter
      |     UNION ALL SELECT b, a, sc FROM inter)
      |  WHERE sc > 0.7),
      |rfn AS (
      |  SELECT DISTINCT f.slid, f.studyid, f.variantid, f.geneid,
      |         f.label, f.sources
      |  FROM fu f
      |  LEFT JOIN sqi ON f.geneid = sqi.a
      |  LEFT JOIN (SELECT DISTINCT geneid AS ig, label AS il FROM fu) s2
      |    ON sqi.b = s2.ig
      |  WHERE (f.geneid <> sqi.b OR sqi.b IS NULL)
      |    AND ((NOT (f.label = 'negative') AND s2.il = 'positive')
      |         OR sqi.b IS NULL))
      |SELECT slid AS "studyLocusId", studyid AS "studyId",
      |       variantid AS "variantId", geneid AS "geneId",
      |       label AS "goldStandardSet",
      |       array_to_string(sources, ',') AS sources_str
      |FROM rfn""".stripMargin

  /** Mirrors Q.gwasCatalogStudyParse +
    * GwasCatalogStudyIndex.parseStudyTable/annotateDiscoverySampleSizes. */
  val gwasCatalogStudyParse: String =
    """WITH raw AS (
      |  SELECT 'GCST' || CAST(o_orderkey AS VARCHAR) AS sid,
      |         CAST(o_custkey % 100000 AS VARCHAR) AS pubmed,
      |         CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |              ELSE 'trait ' || CAST(o_orderkey % 100 AS VARCHAR) END
      |           AS trait,
      |         CASE WHEN o_orderkey % 3 = 0 THEN
      |                '1,' || CAST(o_custkey % 900 + 100 AS VARCHAR)
      |                || ' European cases, '
      |                || CAST(o_orderkey % 5000 AS VARCHAR)
      |                || ' European controls'
      |              WHEN o_orderkey % 3 = 1 THEN
      |                CAST(o_custkey % 10000 AS VARCHAR)
      |                || ' European individuals'
      |              ELSE 'unknown ancestry individuals' END AS iss,
      |         CASE WHEN o_orderkey % 4 <> 0 THEN
      |                'http://www.ebi.ac.uk/efo/EFO_'
      |                || CAST(o_orderkey % 500 AS VARCHAR)
      |                || ',http://purl.obolibrary.org/obo/MONDO_'
      |                || CAST(o_custkey % 300 AS VARCHAR) END AS uri,
      |         CASE WHEN o_orderkey % 5 <> 0 THEN
      |                'UKB|FHS|GERA|UKB|C' || CAST(o_custkey % 9 AS VARCHAR)
      |              END AS cohort
      |  FROM orders),
      |frag AS (
      |  SELECT sid, unnest(string_split_regex(iss, ',\s+')) AS samples
      |  FROM raw),
      |sz AS (
      |  SELECT sid,
      |         TRY_CAST(NULLIF(regexp_extract(
      |           regexp_replace(samples, ',', '', 'g'), '[0-9]+', 0), '')
      |           AS INT) AS n,
      |         samples LIKE '%cases%' AS isc,
      |         samples LIKE '%controls%' AS isk
      |  FROM frag),
      |agg AS (
      |  SELECT sid,
      |         CAST(sum(CASE WHEN isc THEN n ELSE 0 END) AS BIGINT) AS ncases,
      |         CAST(sum(CASE WHEN isk THEN n ELSE 0 END) AS BIGINT)
      |           AS ncontrols,
      |         CAST(sum(n) AS BIGINT) AS nsamples
      |  FROM sz GROUP BY 1)
      |SELECT raw.sid AS "studyId", raw.pubmed AS "pubmedId",
      |       coalesce(raw.trait, 'Unreported') AS "traitFromSource",
      |       coalesce(CASE WHEN raw.uri IS NOT NULL THEN
      |         array_to_string(list_sort(list_transform(
      |           string_split(raw.uri, ','),
      |           x -> regexp_extract(x, '([A-Z]+_[0-9]+)', 1))), ',')
      |         END, '') AS efos_str,
      |       coalesce(CASE WHEN raw.cohort IS NOT NULL
      |                      AND raw.cohort <> '' THEN
      |         array_to_string(list_sort(list_distinct(
      |           string_split(raw.cohort, '|'))), ',') END, '')
      |         AS cohorts_str,
      |       agg.ncases AS "nCases", agg.ncontrols AS "nControls",
      |       agg.nsamples AS "nSamples"
      |FROM raw JOIN agg ON raw.sid = agg.sid""".stripMargin

  /** Mirrors Q.embeddingDup + Similarity.bruteForceDupPairs. */
  val embeddingDup: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings)
      |SELECT a.vec_id AS "idA", b.vec_id AS "idB",
      |       ${q("list_cosine_similarity(a.v, b.v)", 6)} AS sim_q6
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.4""".stripMargin

  /** Mirrors Q.studyDeconvolution + StudyIndexOps.deconvolveStudies. */
  val studyDeconvolution: String =
    """WITH src AS (
      |  SELECT 's' || (o_custkey % 200) AS sid, o_orderpriority AS pid,
      |         CASE WHEN o_orderstatus = 'F' THEN 'FLAG_F' END AS flag,
      |         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |              THEN length(o_orderpriority) * 1000 END AS ns
      |  FROM orders)
      |SELECT sid AS "studyId",
      |       min(pid) AS "projectId",
      |       coalesce(array_to_string(list_sort(list_distinct(
      |         list_filter(list(flag), x -> x IS NOT NULL))), ','), '')
      |         AS "qualityControls",
      |       CAST(min_by(ns, CASE WHEN ns IS NOT NULL THEN pid END) AS INT)
      |         AS "nSamples"
      |FROM src GROUP BY 1""".stripMargin

  /** Mirrors Q.l2gFullFeatures + L2GFeatures.computeFeatureMatrix:
    * all four feature families, their neighbourhood variants, the
    * coloc zero-extension, and the outer-join matrix with zero fill. */
  val l2gFullFeatures: String = {
    // log-scaled distance feature with the Spark null-on-nonpositive
    // log semantics
    def dfeat(expr: String, name: String): String =
      s"CASE WHEN coalesce($expr, 0) <= 0 THEN NULL ELSE log10($expr) / log10(500001) END AS $name"
    // neighbourhood ratio over the per-locus regional max
    def ratio(f: String): String =
      s"""CASE WHEN max($f) OVER (PARTITION BY slid) IS NOT NULL
         | AND max($f) OVER (PARTITION BY slid) <> 0
         |THEN coalesce($f, 0) / max($f) OVER (PARTITION BY slid)
         |ELSE 0 END AS ${f}N""".stripMargin
    val distF = Seq("dtm", "dst", "dfm", "dsf")
    val colocF = Seq("ecl", "eh4", "pcl", "ph4", "scl", "sh4")
    val vepF = Seq("vmx", "vmn")
    s"""WITH cs AS (
      |  SELECT 'L' || l_orderkey AS slid, 'v' || min(l_partkey) AS lead_v,
      |         CAST(min(l_suppkey % 3) AS VARCHAR) AS chrom,
      |         min((l_partkey * 97) % 1000000) AS pos
      |  FROM lineitem GROUP BY 1),
      |tags AS (
      |  SELECT 'L' || l_orderkey AS slid, 'v' || l_partkey AS tv,
      |         l_discount * 10 AS pp
      |  FROM lineitem),
      |genes AS (
      |  SELECT 'g' || gid AS gene, gid % 2 = 0 AS is_pc,
      |         CAST(gid % 3 AS VARCHAR) AS gchrom,
      |         (gid * 19777) % 1000000 AS tss
      |  FROM range(50) t(gid)),
      |vi AS (
      |  SELECT 'v' || p_partkey AS tv, 'g' || (p_partkey % 50) AS gene,
      |         (p_partkey % 10) / 10.0 AS score,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'protein_coding'
      |              ELSE 'lncRNA' END AS biotype,
      |         (p_partkey * 13) % 600000 AS dfp
      |  FROM part
      |  UNION ALL
      |  SELECT 'v' || p_partkey, 'g' || ((p_partkey + 1) % 50),
      |         (p_partkey % 7) / 10.0, 'protein_coding',
      |         (p_partkey * 29) % 600000
      |  FROM part),
      |dist AS (
      |  SELECT 'v' || p_partkey AS tv, 'g' || (p_partkey % 50) AS gene,
      |         (p_partkey * 37) % 400000 AS dtss,
      |         (p_partkey * 53) % 400000 AS dfpd
      |  FROM part),
      |dl AS (
      |  SELECT t.slid, d.gene,
      |    ${dfeat("sum((500000 - dtss + 1) * pp)", "dtm")},
      |    ${dfeat("max(CASE WHEN t.tv = c.lead_v THEN 500000 - dtss + 1 END)",
            "dst")},
      |    ${dfeat("sum((500000 - dfpd + 1) * pp)", "dfm")},
      |    ${dfeat("max(CASE WHEN t.tv = c.lead_v THEN 500000 - dfpd + 1 END)",
            "dsf")}
      |  FROM tags t JOIN dist d USING (tv) JOIN cs c ON t.slid = c.slid
      |  GROUP BY 1, 2),
      |dn AS (
      |  SELECT slid, gene, ${distF.map(ratio).mkString(",\n")}
      |  FROM dl JOIN genes USING (gene) WHERE is_pc),
      |qtl AS (
      |  SELECT 'R' || (o_orderkey % 500) AS rslid,
      |         'qtl_s' || min(o_custkey % 50) AS sid
      |  FROM orders GROUP BY 1),
      |rgene AS (
      |  SELECT rslid,
      |         'g' || (CAST(regexp_extract(sid, '(\\d+)$$', 1) AS INT) % 50)
      |           AS gene,
      |         ['eqtl','pqtl','sqtl']
      |           [CAST(regexp_extract(sid, '(\\d+)$$', 1) AS INT) % 3 + 1]
      |           AS qtype
      |  FROM qtl),
      |co AS (
      |  SELECT 'L' || o_orderkey AS slid, 'R' || (o_custkey % 500) AS rslid,
      |         CASE WHEN o_orderkey % 2 = 0 THEN 'ecaviar' ELSE 'coloc' END
      |           AS method,
      |         (o_orderkey % 100) / 100.0 AS clpp,
      |         (o_custkey % 100) / 100.0 AS h4
      |  FROM orders),
      |cl AS (
      |  SELECT co.slid, r.gene,
      |    -- left-semi on the annotated study loci: orders without
      |    -- lineitems have no credible set
      |    max(CASE WHEN method = 'ecaviar' AND qtype = 'eqtl' THEN clpp END) AS ecl,
      |    max(CASE WHEN method = 'coloc' AND qtype = 'eqtl' THEN h4 END) AS eh4,
      |    max(CASE WHEN method = 'ecaviar' AND qtype = 'pqtl' THEN clpp END) AS pcl,
      |    max(CASE WHEN method = 'coloc' AND qtype = 'pqtl' THEN h4 END) AS ph4,
      |    max(CASE WHEN method = 'ecaviar' AND qtype = 'sqtl' THEN clpp END) AS scl,
      |    max(CASE WHEN method = 'coloc' AND qtype = 'sqtl' THEN h4 END) AS sh4
      |  FROM co
      |  JOIN rgene r USING (rslid)
      |  JOIN cs ON co.slid = cs.slid
      |  GROUP BY 1, 2),
      |lwv AS (
      |  SELECT cl.slid, cl.gene, cs.lead_v FROM cl JOIN cs USING (slid)),
      |lut AS (
      |  SELECT DISTINCT v.gene, v.tv
      |  FROM vi v JOIN genes g USING (gene) WHERE g.is_pc),
      |missing AS (
      |  SELECT w.slid, l.gene
      |  FROM lut l
      |  JOIN (SELECT DISTINCT slid, lead_v FROM lwv) w ON l.tv = w.lead_v
      |  WHERE NOT EXISTS (SELECT 1 FROM lwv x
      |                    WHERE x.lead_v = l.tv AND x.gene = l.gene)),
      |ext AS (
      |  SELECT slid, gene, ecl, eh4, pcl, ph4, scl, sh4 FROM cl
      |  UNION ALL
      |  SELECT slid, gene, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0 FROM missing),
      |cn AS (
      |  SELECT slid, gene, ${colocF.map(ratio).mkString(",\n")}
      |  FROM ext JOIN genes USING (gene) WHERE is_pc),
      |vl AS (
      |  SELECT t.slid, v.gene, max(v.score) AS vmx,
      |         avg(v.score * t.pp) AS vmn
      |  FROM tags t JOIN vi v USING (tv)
      |  GROUP BY 1, 2),
      |vn AS (
      |  SELECT slid, gene, ${vepF.map(ratio).mkString(",\n")}
      |  FROM vl JOIN genes USING (gene) WHERE is_pc),
      |pc AS (
      |  SELECT t.slid, v.gene,
      |         max(CASE WHEN v.biotype = 'protein_coding' THEN 1.0 ELSE 0.0
      |             END) AS ipc
      |  FROM tags t JOIN vi v USING (tv) WHERE v.dfp <= 500000
      |  GROUP BY 1, 2),
      |gcp AS (
      |  SELECT DISTINCT c.slid, g.gene, g.is_pc
      |  FROM cs c JOIN genes g
      |    ON c.chrom = g.gchrom
      |   AND g.tss BETWEEN c.pos - 250000 AND c.pos + 250000),
      |gc AS (
      |  SELECT slid, gene,
      |         count(*) OVER (PARTITION BY slid) AS gcnt,
      |         count(*) FILTER (is_pc) OVER (PARTITION BY slid) AS pcnt
      |  FROM gcp),
      |spine AS (
      |  SELECT DISTINCT slid, gene FROM (
      |    SELECT slid, gene FROM dl UNION ALL SELECT slid, gene FROM dn
      |    UNION ALL SELECT slid, gene FROM ext
      |    UNION ALL SELECT slid, gene FROM cn
      |    UNION ALL SELECT slid, gene FROM vl
      |    UNION ALL SELECT slid, gene FROM vn
      |    UNION ALL SELECT slid, gene FROM pc
      |    UNION ALL SELECT slid, gene FROM gc))
      |SELECT s.slid AS "studyLocusId", s.gene AS "geneId",
      |  ${q("coalesce(dtm, 0)", 6)} AS "distanceTssMean_q6",
      |  ${q("coalesce(dst, 0)", 6)} AS "distanceSentinelTss_q6",
      |  ${q("coalesce(dfm, 0)", 6)} AS "distanceFootprintMean_q6",
      |  ${q("coalesce(dsf, 0)", 6)} AS "distanceSentinelFootprint_q6",
      |  ${q("coalesce(dtmN, 0)", 6)} AS "distanceTssMeanNeighbourhood_q6",
      |  ${q("coalesce(dstN, 0)", 6)} AS "distanceSentinelTssNeighbourhood_q6",
      |  ${q("coalesce(dfmN, 0)", 6)} AS "distanceFootprintMeanNeighbourhood_q6",
      |  ${q("coalesce(dsfN, 0)", 6)}
      |    AS "distanceSentinelFootprintNeighbourhood_q6",
      |  ${q("coalesce(ecl, 0)", 6)} AS "eQtlColocClppMaximum_q6",
      |  ${q("coalesce(eh4, 0)", 6)} AS "eQtlColocH4Maximum_q6",
      |  ${q("coalesce(pcl, 0)", 6)} AS "pQtlColocClppMaximum_q6",
      |  ${q("coalesce(ph4, 0)", 6)} AS "pQtlColocH4Maximum_q6",
      |  ${q("coalesce(scl, 0)", 6)} AS "sQtlColocClppMaximum_q6",
      |  ${q("coalesce(sh4, 0)", 6)} AS "sQtlColocH4Maximum_q6",
      |  ${q("coalesce(eclN, 0)", 6)} AS "eQtlColocClppMaximumNeighbourhood_q6",
      |  ${q("coalesce(eh4N, 0)", 6)} AS "eQtlColocH4MaximumNeighbourhood_q6",
      |  ${q("coalesce(pclN, 0)", 6)} AS "pQtlColocClppMaximumNeighbourhood_q6",
      |  ${q("coalesce(ph4N, 0)", 6)} AS "pQtlColocH4MaximumNeighbourhood_q6",
      |  ${q("coalesce(sclN, 0)", 6)} AS "sQtlColocClppMaximumNeighbourhood_q6",
      |  ${q("coalesce(sh4N, 0)", 6)} AS "sQtlColocH4MaximumNeighbourhood_q6",
      |  ${q("coalesce(vmx, 0)", 6)} AS "vepMaximum_q6",
      |  ${q("coalesce(vmn, 0)", 6)} AS "vepMean_q6",
      |  ${q("coalesce(vmxN, 0)", 6)} AS "vepMaximumNeighbourhood_q6",
      |  ${q("coalesce(vmnN, 0)", 6)} AS "vepMeanNeighbourhood_q6",
      |  ${q("coalesce(ipc, 0)", 6)} AS "isProteinCoding_q6",
      |  coalesce(gcnt, 0) AS "geneCount500kb",
      |  coalesce(pcnt, 0) AS "proteinGeneCount500kb"
      |FROM spine s
      |LEFT JOIN dl USING (slid, gene)
      |LEFT JOIN dn USING (slid, gene)
      |LEFT JOIN ext USING (slid, gene)
      |LEFT JOIN cn USING (slid, gene)
      |LEFT JOIN vl USING (slid, gene)
      |LEFT JOIN vn USING (slid, gene)
      |LEFT JOIN pc USING (slid, gene)
      |LEFT JOIN gc USING (slid, gene)""".stripMargin
  }

  /** Mirrors Q.windowClumpFull + WindowBasedClumping.clump/leads: the
    * greedy lead-selection kernel runs as a recursive CTE accumulating
    * the accepted-lead list per cluster in p-value order. */
  val windowClumpFull: String =
    s"""WITH RECURSIVE $synthSumstatsCte,
      |cl AS (
      |  SELECT *, CASE WHEN position - lag(position) OVER w IS NULL
      |                  OR position - lag(position) OVER w > 100
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM ss
      |  WINDOW w AS (PARTITION BY "studyId", chromosome
      |               ORDER BY position, l_orderkey, l_linenumber)),
      |cl2 AS (
      |  SELECT *, CAST(sum(is_new) OVER
      |    (PARTITION BY "studyId", chromosome
      |     ORDER BY position, l_orderkey, l_linenumber
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cluster
      |  FROM cl),
      |ranked AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY "studyId", chromosome, cluster
      |     ORDER BY expo, mant, position, l_orderkey, l_linenumber) AS rnk
      |  FROM cl2),
      |g AS (
      |  SELECT "studyId", chromosome, cluster, rnk, [position] AS leads
      |  FROM ranked WHERE rnk = 1
      |  UNION ALL
      |  SELECT r."studyId", r.chromosome, r.cluster, r.rnk,
      |    CASE WHEN len(list_filter(g.leads,
      |                  l -> abs(l - r.position) < 100)) = 0
      |         THEN list_append(g.leads, r.position) ELSE g.leads END
      |  FROM g JOIN ranked r
      |    ON r."studyId" = g."studyId" AND r.chromosome = g.chromosome
      |   AND r.cluster = g.cluster AND r.rnk = g.rnk + 1),
      |fl AS (
      |  SELECT "studyId", chromosome, cluster, max_by(leads, rnk) AS leads
      |  FROM g GROUP BY 1, 2, 3)
      |SELECT s."studyId", s.chromosome, CAST(s.position AS BIGINT) AS position,
      |       s."variantId", md5(s."studyId" || s."variantId") AS "studyLocusId"
      |FROM cl2 s
      |JOIN fl f ON s."studyId" = f."studyId" AND s.chromosome = f.chromosome
      |  AND s.cluster = f.cluster
      |WHERE list_contains(f.leads, s.position)""".stripMargin

  /** Mirrors Q.intraStudyOverlaps + Overlaps.overlappingPeaks(intra). */
  val intraStudyOverlaps: String =
    """WITH t AS (
      |  SELECT 'L' || l_orderkey AS slid, 's' || (l_orderkey % 40) AS study,
      |         'gwas' AS stype,
      |         CAST(l_partkey % 24 AS VARCHAR) AS chromosome,
      |         'r' || (l_orderkey % 3) AS region,
      |         'v' || l_partkey || '_' || (l_orderkey % 2) AS tv
      |  FROM lineitem)
      |SELECT DISTINCT l.slid AS "leftStudyLocusId",
      |       r.slid AS "rightStudyLocusId",
      |       r.stype AS "rightStudyType", l.chromosome
      |FROM t l JOIN t r
      |  ON l.study = r.study AND l.chromosome = r.chromosome
      | AND l.tv = r.tv AND l.slid > r.slid AND l.region <> r.region""".stripMargin

  val locusExtraction: String =
    """WITH sumstats AS (
      |  SELECT DISTINCT
      |    concat(CASE WHEN l_partkey % 2 = 0 THEN 'g' ELSE 'e' END,
      |           CAST((l_orderkey // 2) % 10 AS VARCHAR)) AS "studyId",
      |    ((l_orderkey // 2) // 10) % 3 AS chromosome,
      |    l_orderkey * 4 AS position,
      |    -((l_orderkey // 2) % 12) - 4 AS pexp
      |  FROM lineitem WHERE l_orderkey % 2 = 0),
      |leads AS (
      |  SELECT "studyId" AS l_study, chromosome AS l_chrom,
      |         position AS lead_pos
      |  FROM sumstats WHERE position % 1000 = 0 AND pexp <= -10),
      |lb AS (
      |  SELECT l_study, l_chrom, lead_pos, lead_pos // 2500 + d AS b
      |  FROM leads CROSS JOIN (VALUES (-1), (0), (1)) t(d))
      |SELECT s."studyId", s.chromosome, lb.lead_pos,
      |       s.position AS tag_pos
      |FROM sumstats s
      |JOIN lb ON s."studyId" = lb.l_study AND s.chromosome = lb.l_chrom
      |       AND s.position // 2500 = lb.b
      |WHERE abs(s.position - lb.lead_pos) <= 1250""".stripMargin

  val all: Map[String, String] = Map(
    "q_gx_locus_extract" -> locusExtraction,
    "q_gx_intra_overlaps" -> intraStudyOverlaps,
    "q_ml_l2g_gold_standard" -> l2gGoldStandard,
    "q_dedup_embedding" -> embeddingDup,
    "q_gx_study_parse" -> gwasCatalogStudyParse,
    "q_gx_window_clump" -> windowClumpFull,
    "q_ml_l2g_features" -> l2gFullFeatures,
    "q_gx_study_deconvolution" -> studyDeconvolution,
    "q_gx_overlaps_coloc_e2e" -> overlapsColocE2E,
    "q_gx_ecaviar_fused_e2e" -> ecaviarFusedE2E,
    "q_gx_ancestry_agg" -> ancestryAggregation,
    "q_ml_l2g_distance" -> l2gDistanceFeatures,
    "q_gx_study_validation" -> studyValidation,
    "q_gx_rsid_gnomad_map" -> rsidGnomadMapping,
    "q_gx_ld_clump" -> ldClump,
    // same SQL: the Spark side differs only in physical path (gated
    // window vs production join), both must hash to the same result
    "q_gx_ld_clump_join" -> ldClump,
    "q_gx_locus_breaker" -> locusBreaker,
    "q_f_variant_hash" -> variantHash,
    "q_s2_scan_prune" -> scanPrune,
    "q_p1_pvalue_filter" -> pvalueFilter,
    "q_p4_region_filter" -> regionFilter,
    "q_j1_self_join_pairs" -> selfJoinPairs,
    "q_j2_outer_align" -> outerAlign,
    "q_j3_range_join" -> rangeJoin,
    "q_j4_interval_band_join" -> intervalBandJoin,
    "q_j_skew_salted" -> skewJoin,
    "q_a11_rollup" -> rollupStats,
    "q_j5_semi_join" -> semiJoin,
    "q_j6_ld_annotate" -> ldAnnotate,
    "q_j9_variant_merge" -> variantMerge,
    "q_s14_ontology_closure" -> ontologyClosure,
    "q_f23_liftover" -> liftover,
    "q_f25_effect_norm" -> effectNorm,
    "q_j7_star_join" -> starJoin,
    "q_j8_validation_join" -> validationJoin,
    "q_a1_collect_sorted" -> collectSorted,
    "q_a2_sum_products" -> sumProducts,
    "q_a3_sign_avg" -> signAvg,
    "q_a5_stats_battery" -> statsBattery,
    "q_a9_pivot" -> pivotEvents,
    "q_a10_melt" -> meltLineitem,
    "q_w1_top1_per_group" -> top1PerGroup,
    "q_w3_sessionize" -> sessionize,
    "q_w4_rank_scan" -> rankScan,
    "q_w5_running_frame" -> runningFrame,
    "q_w7_medians" -> medians,
    "q_set_union_distinct" -> setOps,
    "q_f9_harmonic_sum" -> harmonicSum,
    "q_f20_cumsum_flags" -> cumsumFlags,
    "q_f3_pvalue_codec" -> pvalueCodec,
    "q_gx_coloc" -> coloc,
    "q_gx_ecaviar" -> ecaviar,
    "q_gx_credset_extraction" -> credsetExtraction,
    "q_gx_pics_relational" -> picsRelational,
    "q_gx_cluster_top1" -> clusterTop1,
    "q_gx_qc_metrics" -> qcMetrics,
    "q_p2_sanity_filter" -> sanityFilter,
    "q_dedup_exact" -> dedupExact,
    "q_dedup_ngram_jaccard" -> ngramJaccard,
    "q_dedup_containment" -> dedupContainment,
    "q_dedup_spans" -> dedupSpans,
    "q_search_bm25" -> searchBm25,
    "q_search_rrf" -> searchRrf,
    "q_search_hybrid" -> searchHybrid,
    "q_text_cooccurrence" -> textCooccurrence,
    "q_dsir_select" -> dsirSelect,
    "q_text_bigram_lp" -> textBigramLp,
    "q_dedup_keep_best" -> dedupKeepBest,
    "q_split_leakage_safe" -> splitLeakageSafe,
    "q_mix_quantile_norm" -> mixQuantileNorm,
    "q_sim_hard_negatives" -> simHardNegatives,
    "q_sim_pooled" -> simPooled,
    "q_text_cluster_terms" -> textClusterTerms,
    "q_ann_sq8" -> annSq8,
    "q_ann_lsh" -> annLsh,
    "q_ann_ivf" -> annIvf,
    "q_ann_pq" -> annPq,
    "q_dedup_minhash" -> dedupMinhashXx,
    "q_dedup_simhash" -> dedupSimhashXx,
    "q_pack_epoch_shuffle" -> packEpochShuffle,
    "q_upsert_snapshot_diff" -> upsertSnapshotDiff,
    "q_dedup_exact_normalized" -> dedupExactNormalized,
    "q_mix_repeats" -> mixRepeats,
    "q_dedup_cluster_histogram" -> dedupClusterHistogram,
    "q_text_scripts" -> textScripts,
    "q_kmeans_step" -> kmeansStep,
    "q_pca_cov" -> pcaCov,
    "q_mix_temperature" -> mixTemperature,
    "q_mix_curriculum" -> mixCurriculum,
    "q_text_chunks" -> textChunks,
    "q_text_quality_rules" -> textQualityRules,
    "q_dedup_decontaminate" -> decontamination,
    // the Bloom prefilter is exact-equivalent (no false negatives +
    // exact confirm join), so the bloom variant shares the oracle
    "q_dedup_decontaminate_bloom" -> decontamination,
    "q_text_tfidf" -> tfidfTopTerms,
    "q_dedup_semantic" -> semanticDedup,
    "q_text_stats" -> textStats,
    "q_text_langid" -> textLangId,
    "q_upsert_orders" -> upsertOrders,
    "q_text_quality" -> textQuality,
    "q_text_tokens" -> textTokens,
    "q_w_topk_window" -> topkWindow,
    "q_text_unigram_lp" -> textUnigramLp,
    "q_text_repetition" -> textRepetition,
    "q_text_oov" -> textOov,
    "q_text_pii" -> textPii,
    "q_mix_split" -> mixSplit,
    "q_text_fingerprint_summary" -> fingerprintSummary,
    "q_pack_shards" -> packShards,
    "q_ann_topk" -> annTopK,
    "q_ann_topk_agg" -> annTopK,
    "q_mm_blob_meta" -> blobMeta,
    "q_mm_decode" -> mmDecode,
    "q_mm_resize" -> mmResize,
    "q_mm_frames" -> mmFrames,
    "q_dedup_minhash_md5" -> minhashMd5,
    "q_dedup_incr_exact" -> dedupIncrExact,
    "q_profile_documents" -> profileDocuments,
    "q_zorder_cells" -> zorderCells,
    "q_profile_hist" -> profileHistogram,
    "q_dedup_incr_minhash_md5" -> dedupIncrMinhashMd5,
    "q_dedup_incr_minhash" -> dedupIncrMinhashXx,
    "q_dedup_components" -> dedupComponents,
    "q_mix_sample" -> mixSample,
    "q_mix_stratified" -> mixStratified,
    "q_dedup_simhash_md5" -> simhashMd5)
}
