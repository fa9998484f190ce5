package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators._

/** SURVEY §2 extended relational surface: ordered PK-list fetch (S1/O5),
  * JSON/array/tuple predicates (P4-P8), conditional/assoc/self joins
  * (J1/J3/J10), iterative closure (J13), stats unions (A3), dedup-insert
  * (A12/J8/J9), pivot (X1), scalar-function suite (F1-F13). */
object RelationalExtended extends QuerySet {

  private val fetchIds = Seq(42L, 7L, 999L, 123L, 5L, 500L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/O5 — fetch by PK list, result restored to input order; the
    // position is surfaced so order semantics are oracle-checkable.
    "s1_fetch_in_order" -> ((s, dir) => {
      Pagination.fetchInOrder(t(s, dir, "orders"), "o_orderkey", fetchIds)
        .withColumn("pos", array_position(array(fetchIds.map(lit): _*), col("o_orderkey")))
        .select(col("pos"), col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // P4/P5 — JSON key-value containment (JSONB @>), OR-ed across the
    // requested dicts as the reference does.
    "p4_json_contains" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(FilterOps.jsonContainsAny(col("props"),
          Seq(Map("k" -> "42"), Map("k" -> "77"))))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // P6 — array subset (?&) + overlap (&&) over per-group collected sets.
    "p6_array_hasall" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(collect_set(col("l_returnflag")).as("flags"))
        .filter(FilterOps.hasAll(col("flags"), Seq("A", "N", "R")))
        .select(col("l_suppkey"),
                FilterOps.overlaps(col("flags"), Seq("R", "X")).as("has_any_rx"))
        .orderBy(col("l_suppkey"))
    }),

    // P7 — tuple-IN (multi-column key lookup), grouped count per tuple.
    "p7_tuple_in" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(FilterOps.tupleIn(Seq(col("l_returnflag"), col("l_linestatus")),
                                  Seq(Seq("A", "F"), Seq("N", "O"))))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P8 — mixed id-or-name filter (username/id resolution shape).
    "p8_id_or_name" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey").isin(1L, 2L, 3L) ||
                col("c_name").isin("Customer#000000100", "Customer#000000101"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // J1 — conditional equi join to a dim, built only because a dim filter
    // is present (record→specification shape); broadcast + pushed filter.
    "j1_conditional_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.join(broadcast(t(s, dir, "part").filter(col("p_brand") === "Brand#13")),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy(col("p_brand"))
    }),

    // J3 — many-to-many association join: distinct partner count through
    // the association table (record↔molecule shape). ONE exchange, not
    // countDistinct's two: hash-partitioning on the GROUP key alone
    // satisfies the clustered distribution of both the (supp, part)
    // dedup aggregate and the per-supp count, so both run exchange-free
    // on top of the single repartition. countDistinct would shuffle
    // twice for map-side partial dedup that buys nothing here — the
    // assoc pairs are near-distinct already (≈7 lineitems per order
    // scatter across parts), the profile where raw-row shuffle wins.
    "j3_assoc_distinct" -> ((s, dir) => {
      // count(1) over the deduped pairs counts a NULL l_partkey as one
      // extra partner where COUNT(DISTINCT) would not — safe here only
      // because TPC-H l_partkey is NOT NULL; on nullable data add
      // .filter(col("l_partkey").isNotNull) to keep the rewrite
      // identical to the oracle's COUNT(DISTINCT)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey"))
        .repartition(col("l_suppkey"))
        .distinct()
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("l_suppkey"))
    }),

    // J3 (assoc-table form) — traversal through a genuine association
    // table: order ↔ lineitem(assoc) ↔ part, distinct partner attribute
    // per left entity (record ↔ initial-molecules shape).
    "j3_assoc_via_table" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_orderkey"))
        .agg(countDistinct(col("p_brand")).as("n_brands"))
        .orderBy(col("o_orderkey"))
    }),

    // A1 — COUNT(*) over an arbitrary filtered subquery (get_count).
    "a1_count_subquery" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_quantity") > 25)
        .agg(count(lit(1)).as("n"))
    }),

    // J10/J11 — self-join via alias against a first-row-per-group subquery:
    // each order vs its customer's first order.
    "j10_self_join_first" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val first = AggOps.distinctOnAgg(o, Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey").as("fc"), col("o_orderkey").as("first_key"),
                col("o_orderdate").as("first_date"))
      o.join(first, col("o_custkey") === col("fc"))
        .select(col("o_orderkey"), col("o_custkey"), col("first_key"),
                datediff(col("o_orderdate"), col("first_date")).as("days_since_first"))
        .orderBy(col("o_orderkey"))
    }),

    // J13/U1/U2 — iterative parent/child closure over a unioned edge view:
    // region→nation→customer, BFS to fixpoint.
    "j13_closure" -> ((s, dir) => {
      val e1 = t(s, dir, "nation").select(
        concat(lit("r"), col("n_regionkey")).as("parent"),
        concat(lit("n"), col("n_nationkey")).as("child"))
      val e2 = t(s, dir, "customer").select(
        concat(lit("n"), col("c_nationkey")).as("parent"),
        concat(lit("c"), col("c_custkey")).as("child"))
      val roots = t(s, dir, "region").select(concat(lit("r"), col("r_regionkey")).as("root"))
      JoinOps.closure(e1.union(e2), roots, "root", "parent", "child")
        .orderBy(col("root"), col("node"))
    }),

    // A3/U4 — two grouped counts concatenated (task stats ∪ service stats).
    "a3_stats_union" -> ((s, dir) => {
      val a = t(s, dir, "orders").groupBy(col("o_orderpriority").as("key"))
        .agg(count(lit(1)).as("n")).withColumn("src", lit("orders"))
      val b = t(s, dir, "events").groupBy(col("event_type").as("key"))
        .agg(count(lit(1)).as("n")).withColumn("src", lit("events"))
      a.union(b).select(col("src"), col("key"), col("n")).orderBy(col("src"), col("key"))
    }),

    // A12/J8/J9 — dedup-by-hash insert: duplicate batch split into
    // to-insert vs already-existing by content hash, first-wins in batch.
    "a12_dedup_insert" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val hash = Hashing.md5Hash(col("p_name"), col("p_brand"), col("p_type"))
      val batch = part.union(part).withColumn("hash", hash)
      val existing = part.filter(col("p_partkey") % 3 === 0).withColumn("hash", hash)
      val (toInsert, _) = JoinOps.dedupInsert(batch, existing, Seq("hash"), "p_partkey")
      toInsert.select(col("p_partkey"), col("hash")).orderBy(col("p_partkey"))
    }),

    // X1 — compile_values pivot: rows=returnflag, cols=linestatus, exact sum.
    "x1_pivot_values" -> ((s, dir) => {
      PivotOps.compileValues(t(s, dir, "lineitem"), "l_returnflag", "l_linestatus",
          dsum(col("l_quantity")), Seq("F", "O"))
        .orderBy(col("l_returnflag"))
    }),

    // F1-F8/F13 — scalar-function suite: lower, date parts, coalesce,
    // canonical sha256, string ops, floor/mod, enum ordering rank.
    "f_scalar_suite" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 200)
      o.join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(
          col("o_orderkey"),
          lower(col("o_orderpriority")).as("prio_lower"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH").as("bucket_hour"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          coalesce(col("c_name"), lit("<none>")).as("cname"),
          sha2(col("c_name"), 256).as("name_sha"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_pfx"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          floor(col("o_totalprice")).cast("double").as("price_floor"),
          (col("o_orderkey") % 7).as("key_mod"),
          array_position(array(lit("P"), lit("O"), lit("F")), col("o_orderstatus")).as("status_rank"))
        .orderBy(col("o_orderkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s1_fetch_in_order" ->
      """SELECT CAST(list_position([42,7,999,123,5,500], o_orderkey) AS BIGINT) AS pos,
        |  o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey IN (42,7,999,123,5,500)
        |ORDER BY pos""".stripMargin,

    "p4_json_contains" ->
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE json_extract_string(props, '$.k') = '42'
        |   OR json_extract_string(props, '$.k') = '77'
        |ORDER BY event_id""".stripMargin,

    "p6_array_hasall" ->
      """SELECT l_suppkey, list_has_any(flags, ['R','X']) AS has_any_rx
        |FROM (SELECT l_suppkey, list(DISTINCT l_returnflag) AS flags
        |      FROM lineitem GROUP BY l_suppkey)
        |WHERE list_has_all(flags, ['A','N','R'])
        |ORDER BY l_suppkey""".stripMargin,

    "p7_tuple_in" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |WHERE (l_returnflag = 'A' AND l_linestatus = 'F')
        |   OR (l_returnflag = 'N' AND l_linestatus = 'O')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "p8_id_or_name" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (1,2,3)
        |   OR c_name IN ('Customer#000000100','Customer#000000101')
        |ORDER BY c_custkey""".stripMargin,

    "j1_conditional_join" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#13'
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "j3_assoc_distinct" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,

    "j3_assoc_via_table" ->
      """SELECT o_orderkey, COUNT(DISTINCT p_brand) AS n_brands
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE o_orderkey < 2000
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "a1_count_subquery" ->
      """SELECT COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND l_quantity > 25""".stripMargin,

    "j10_self_join_first" ->
      """WITH first AS (
        |  SELECT o_custkey AS fc, o_orderkey AS first_key, o_orderdate AS first_date
        |  FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        |)
        |SELECT o.o_orderkey, o.o_custkey, f.first_key,
        |  CAST(date_diff('day', f.first_date, o.o_orderdate) AS INT) AS days_since_first
        |FROM orders o JOIN first f ON o.o_custkey = f.fc
        |ORDER BY o.o_orderkey""".stripMargin,

    "j13_closure" ->
      """WITH RECURSIVE edges AS (
        |  SELECT concat('r', n_regionkey) AS parent, concat('n', n_nationkey) AS child FROM nation
        |  UNION ALL
        |  SELECT concat('n', c_nationkey) AS parent, concat('c', c_custkey) AS child FROM customer
        |), cl AS (
        |  SELECT concat('r', r_regionkey) AS root, concat('r', r_regionkey) AS node FROM region
        |  UNION ALL
        |  SELECT cl.root, e.child AS node FROM cl JOIN edges e ON cl.node = e.parent
        |)
        |SELECT root, node FROM cl WHERE root <> node
        |ORDER BY root, node""".stripMargin,

    "a3_stats_union" ->
      """SELECT src, key, n FROM (
        |  SELECT 'orders' AS src, o_orderpriority AS key, COUNT(*) AS n FROM orders GROUP BY 2
        |  UNION ALL
        |  SELECT 'events' AS src, event_type AS key, COUNT(*) AS n FROM events GROUP BY 2
        |) t
        |ORDER BY src, key""".stripMargin,

    "a12_dedup_insert" ->
      """WITH batch AS (SELECT * FROM part UNION ALL SELECT * FROM part),
        |hashed AS (
        |  SELECT p_partkey, md5(concat_ws(chr(31), p_name, p_brand, p_type)) AS hash FROM batch),
        |firsts AS (
        |  SELECT p_partkey, hash FROM hashed
        |  QUALIFY row_number() OVER (PARTITION BY hash ORDER BY p_partkey) = 1),
        |existing AS (
        |  SELECT md5(concat_ws(chr(31), p_name, p_brand, p_type)) AS hash
        |  FROM part WHERE p_partkey % 3 = 0)
        |SELECT p_partkey, hash FROM firsts
        |WHERE hash NOT IN (SELECT hash FROM existing)
        |ORDER BY p_partkey""".stripMargin,

    "x1_pivot_values" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F",
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O"
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "f_scalar_suite" ->
      """SELECT o_orderkey,
        |  lower(o_orderpriority) AS prio_lower,
        |  strftime(o_orderdate, '%Y-%m-%d %H') AS bucket_hour,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  COALESCE(c_name, '<none>') AS cname,
        |  sha256(c_name) AS name_sha,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  substring(c_name, 1, 8) AS name_pfx,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        |  CAST(floor(o_totalprice) AS DOUBLE) AS price_floor,
        |  o_orderkey % 7 AS key_mod,
        |  CAST(list_position(['P','O','F'], o_orderstatus) AS BIGINT) AS status_rank
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin
  )
}
