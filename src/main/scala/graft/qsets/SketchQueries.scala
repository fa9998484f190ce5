package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sketch.Sketches

/** Sketch + layout extensions — approximate-distinct, cross-source
  * overlap sizing, and Z-order data-skipping, all ORACLE-EXACT (the
  * portable md5 hash family and exact integer/single-rounding double
  * arithmetic make every stage DuckDB-reproducible; see
  * [[graft.sketch.Sketches]] for the cross-engine determinism argument).
  */
object SketchQueries extends QuerySet {

  import Sketches.{HllNumerator, KmvK, W52}

  /** Exact double literals shared verbatim with the oracle SQL —
    * `Double.toString` round-trips, and its E-notation form parses as
    * DOUBLE (not DECIMAL) in DuckDB. */
  private val numLit = java.lang.Double.toString(HllNumerator)
  private val kmvNumLit = java.lang.Double.toString((KmvK - 1).toDouble * W52)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HyperLogLog distinct customers per order status: the direct
    // register path and an explicitly sharded merge tree must agree to
    // the bit (and with the oracle's replay of the same register math).
    "sk_hll_distinct" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val exact = orders.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("exact_nd"))
      val direct = Sketches.hllEstimate(orders, Seq("o_orderstatus"), col("o_custkey"))
      val merged = Sketches.hllEstimateSharded(orders, Seq("o_orderstatus"),
        col("o_custkey"), shards = 8)
      exact.join(direct, "o_orderstatus").join(merged, "o_orderstatus")
        .orderBy("o_orderstatus")
    }),

    // KMV bottom-64 overlap estimates between the customer sets of each
    // order-priority pair (10 pairs, genuinely PARTIAL overlap — each
    // priority covers ~86% of customers, pairwise Jaccard ≈ 0.75) —
    // union size, Jaccard, and intersection from the k-bounded sketches
    // alone, with the exact intersection alongside so the estimator's
    // error is a visible per-round artifact.
    "sk_kmv_overlap" -> ((s, dir) => {
      val li = t(s, dir, "orders")
      val sk = Sketches.kmvSketch(li, col("o_orderpriority"), col("o_custkey"))
      val est = Sketches.kmvOverlap(sk)
      val d = li.select(col("o_orderpriority").as("s"), col("o_custkey").as("v")).distinct()
      val exact = d.as("a").join(d.as("b"),
          col("a.v") === col("b.v") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("set_a"), col("b.s").as("set_b"))
        .agg(count(lit(1)).as("exact_intersect"))
      est.join(exact, Seq("set_a", "set_b"))
        .orderBy("set_a", "set_b")
    }),

    // Count-Min frequency estimates for the corpus's top-20 tokens —
    // the d×4096 counter table replaces an unbounded token group-by,
    // and because CMS is all-integer the ESTIMATES themselves are
    // oracle-exact (est ≥ exact always; the overcount column makes the
    // collision cost a visible per-round artifact).
    "sk_cms_freq" -> ((s, dir) => {
      import graft.text.TextFunctions.wsTokens
      val toks = t(s, dir, "documents")
        .select(explode(wsTokens(col("text"))).as("tok"))
      val counters = Sketches.cmsCounters(toks, col("tok"))
      val probes = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(20)
      Sketches.cmsPointEstimates(counters, probes, "tok")
        .withColumn("overcount", (col("est_n") - col("exact_n")).cast("long"))
        .orderBy(col("exact_n").desc, col("tok"))
    }),

    // Z-order vs natural layout, identical box predicate: per-layout
    // file-level min/max skipping arithmetic (the parquet-footer pruning
    // test) over 64 simulated equal-size files. The Z-ordered layout
    // must scan a fraction of the files the natural order does — the
    // whole point of multi-dimension clustering at 100 TB.
    "lay_zorder_skip" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val keyed = li.withColumn("zkey",
        Layout.zOrderKey(col("l_partkey"), col("l_suppkey")))
      val hi = keyed.agg(max(col("l_partkey")).as("p"), max(col("l_suppkey")).as("q")).head
      val (pHi, sHi) = (hi.getLong(0) / 4, hi.getLong(1) / 4)
      val natural = Layout.skipStats(keyed, "natural",
        Seq(col("l_orderkey"), col("l_linenumber")),
        col("l_partkey"), pHi, col("l_suppkey"), sHi)
      val zordered = Layout.skipStats(keyed, "zorder",
        Seq(col("zkey"), col("l_orderkey"), col("l_linenumber")),
        col("l_partkey"), pHi, col("l_suppkey"), sHi)
      natural.unionAll(zordered).orderBy("layout")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "sk_hll_distinct" ->
      s"""WITH w AS (
         |  SELECT o_orderstatus AS g,
         |         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 2)) AS BIGINT) AS bucket,
         |         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 3, 13)) AS BIGINT) AS wv
         |  FROM orders),
         |regs AS (
         |  SELECT g, bucket,
         |         MAX(CASE WHEN wv = 0 THEN 53 ELSE 53 - length(bin(wv)) END) AS r
         |  FROM w GROUP BY g, bucket),
         |agg AS (
         |  SELECT g, COUNT(*) AS present,
         |         SUM(CAST(1 AS BIGINT) << (53 - r)) AS s_present
         |  FROM regs GROUP BY g),
         |est AS (
         |  SELECT g, CAST(256 - present AS BIGINT) AS v_zero,
         |         CAST(s_present + (256 - present) * 9007199254740992 AS BIGINT) AS s_scaled
         |  FROM agg),
         |ex AS (
         |  SELECT o_orderstatus AS g, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_nd
         |  FROM orders GROUP BY g)
         |SELECT ex.g AS o_orderstatus, n_rows, exact_nd, v_zero, s_scaled,
         |       $numLit / CAST(s_scaled AS DOUBLE) AS est_hll,
         |       $numLit / CAST(s_scaled AS DOUBLE) AS est_merged
         |FROM ex JOIN est ON ex.g = est.g
         |ORDER BY o_orderstatus""".stripMargin,

    "sk_kmv_overlap" ->
      s"""WITH d AS (
         |  SELECT DISTINCT o_orderpriority AS s, md5(CAST(o_custkey AS VARCHAR)) AS h
         |  FROM orders),
         |mins AS (
         |  SELECT s, h FROM d
         |  QUALIFY row_number() OVER (PARTITION BY s ORDER BY h) <= $KmvK),
         |sk AS (SELECT s, list_sort(list(h)) AS mins FROM mins GROUP BY s),
         |p AS (
         |  SELECT a.s AS set_a, b.s AS set_b, a.mins AS am, b.mins AS bm
         |  FROM sk a JOIN sk b ON a.s < b.s),
         |u AS (
         |  SELECT set_a, set_b, am, bm,
         |         list_sort(list_distinct(list_concat(am, bm)))[1:$KmvK] AS uk
         |  FROM p),
         |m AS (
         |  SELECT set_a, set_b,
         |         CAST(('0x' || substr(uk[$KmvK], 1, 13)) AS BIGINT) AS w_k,
         |         CAST(len(list_filter(uk,
         |           x -> list_contains(am, x) AND list_contains(bm, x))) AS BIGINT) AS matches
         |  FROM u),
         |ex AS (
         |  SELECT a.s AS set_a, b.s AS set_b, CAST(COUNT(*) AS BIGINT) AS exact_intersect
         |  FROM d a JOIN d b ON a.h = b.h AND a.s < b.s GROUP BY 1, 2)
         |SELECT m.set_a, m.set_b, w_k, matches,
         |       $kmvNumLit / CAST(w_k AS DOUBLE) AS est_union,
         |       CAST(matches AS DOUBLE) / CAST($KmvK AS DOUBLE) AS est_jaccard,
         |       (CAST(matches AS DOUBLE) / CAST($KmvK AS DOUBLE))
         |         * ($kmvNumLit / CAST(w_k AS DOUBLE)) AS est_intersect,
         |       exact_intersect
         |FROM m JOIN ex ON m.set_a = ex.set_a AND m.set_b = ex.set_b
         |ORDER BY m.set_a, m.set_b""".stripMargin,

    "sk_cms_freq" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |rws AS (SELECT tok, i FROM toks, range(4) t(i)),
        |counters AS (
        |  SELECT i,
        |         CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 3)) AS BIGINT) AS bucket,
        |         COUNT(*) AS c
        |  FROM rws GROUP BY 1, 2),
        |exact AS (SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok),
        |probes AS (SELECT tok, exact_n FROM exact ORDER BY exact_n DESC, tok LIMIT 20),
        |pr AS (
        |  SELECT tok, exact_n, i,
        |         CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 3)) AS BIGINT) AS bucket
        |  FROM probes, range(4) t(i)),
        |est AS (
        |  SELECT tok, exact_n, MIN(c) AS est_n
        |  FROM pr JOIN counters USING (i, bucket) GROUP BY 1, 2)
        |SELECT tok, CAST(exact_n AS BIGINT) AS exact_n, CAST(est_n AS BIGINT) AS est_n,
        |       CAST(est_n - exact_n AS BIGINT) AS overcount
        |FROM est
        |ORDER BY exact_n DESC, tok""".stripMargin,

    "lay_zorder_skip" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(list_sum([ (((l_partkey >> i) & 1)::BIGINT << (2*i+1)) for i in range(0, 21) ])
        |       + list_sum([ (((l_suppkey >> i) & 1)::BIGINT << (2*i)) for i in range(0, 21) ]) AS BIGINT) AS zkey
        |  FROM lineitem),
        |tot AS (SELECT COUNT(*) AS n, MAX(l_partkey) // 4 AS p_hi, MAX(l_suppkey) // 4 AS s_hi FROM li),
        |nat AS (
        |  SELECT l_partkey, l_suppkey,
        |         ((row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) * 64) // (SELECT n FROM tot) AS b
        |  FROM li),
        |zo AS (
        |  SELECT l_partkey, l_suppkey,
        |         ((row_number() OVER (ORDER BY zkey, l_orderkey, l_linenumber) - 1) * 64) // (SELECT n FROM tot) AS b
        |  FROM li),
        |stats AS (
        |  SELECT 'natural' AS layout, b, MIN(l_partkey) AS m1, MIN(l_suppkey) AS m2,
        |         SUM(CASE WHEN l_partkey <= (SELECT p_hi FROM tot)
        |                   AND l_suppkey <= (SELECT s_hi FROM tot) THEN 1 ELSE 0 END) AS rib
        |  FROM nat GROUP BY b
        |  UNION ALL
        |  SELECT 'zorder' AS layout, b, MIN(l_partkey) AS m1, MIN(l_suppkey) AS m2,
        |         SUM(CASE WHEN l_partkey <= (SELECT p_hi FROM tot)
        |                   AND l_suppkey <= (SELECT s_hi FROM tot) THEN 1 ELSE 0 END) AS rib
        |  FROM zo GROUP BY b)
        |SELECT layout,
        |       CAST(COUNT(*) AS BIGINT) AS buckets_total,
        |       CAST(SUM(CASE WHEN m1 <= (SELECT p_hi FROM tot)
        |                      AND m2 <= (SELECT s_hi FROM tot) THEN 1 ELSE 0 END) AS BIGINT) AS buckets_scanned,
        |       CAST(SUM(rib) AS BIGINT) AS rows_in_box,
        |       CAST(COUNT(*) - SUM(CASE WHEN m1 <= (SELECT p_hi FROM tot)
        |                                 AND m2 <= (SELECT s_hi FROM tot) THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS skip_ratio
        |FROM stats GROUP BY layout
        |ORDER BY layout""".stripMargin
  )
}
