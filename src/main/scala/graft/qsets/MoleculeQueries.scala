package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Molecules

/** SURVEY F9/F10 molecule queries over a molecules frame derived
  * deterministically from `part` (element counts are arithmetic in
  * p_size/p_partkey, so the DuckDB oracle reconstructs the expected
  * formula/geometry independently — it never runs our expressions). */
object MoleculeQueries extends QuerySet {

  /** part → molecules: symbols in C,H,O,N construction order with counts
    * nC = p_size%3+1, nH = p_size%5, nO = p_partkey%2+1, nN = p_partkey%3;
    * geometry[i] = i*0.5 + p_partkey for i in 1..3*natoms. */
  private def molecules(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey").as("molecule_id"),
      concat(
        array_repeat(lit("C"), (col("p_size") % 3 + 1).cast("int")),
        array_repeat(lit("H"), (col("p_size") % 5).cast("int")),
        array_repeat(lit("O"), (col("p_partkey") % 2 + 1).cast("int")),
        array_repeat(lit("N"), (col("p_partkey") % 3).cast("int"))).as("symbols"))
      .withColumn("geometry",
        transform(sequence(lit(1), size(col("symbols")) * 3),
          i => i.cast("double") * 0.5 + col("molecule_id")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F10 — Hill formula per molecule, grouped: C first, H second, others
    // alphabetical, count 1 omitted.
    "mol_hill_formula" -> ((s, dir) => {
      molecules(s, dir)
        .select(Molecules.hillFormula(col("symbols")).as("formula"))
        .groupBy(col("formula")).agg(count(lit(1)).as("n"))
        .orderBy(col("formula"))
    }),

    // Molecule search (`molecules/socket.py:238-262`): the reference
    // composes a Hill-formula IN-list (folded into the identifiers
    // containment query as `molecular_formula`), an OR-of-containment per
    // identifier name ANDed across names, a keyset cursor (id < cursor),
    // and id-descending order. Composed here from the existing primitives
    // (Molecules.hillFormula + FilterOps.jsonContainsAny) — all plain
    // Catalyst predicates, no UDF.
    "mol_search" -> ((s, dir) => {
      import graft.operators.FilterOps
      val m = molecules(s, dir)
        .withColumn("formula", Molecules.hillFormula(col("symbols")))
        .withColumn("source", concat(lit("src"), col("molecule_id") % 4))
        .withColumn("identifiers", to_json(struct(
          col("formula").as("molecular_formula"), col("source"))))
      m.filter(
          FilterOps.jsonContainsAny(col("identifiers"),
            Seq("C2H3NO2", "C3HO2").map(f => Map("molecular_formula" -> f))) &&
          FilterOps.jsonContainsAny(col("identifiers"),
            Seq(Map("source" -> "src1"), Map("source" -> "src3"))) &&
          col("molecule_id") < 15000)
        .select(col("molecule_id"), col("formula"), col("source"))
        .orderBy(col("molecule_id").desc)
    }),

    // F8 reference parity — the QCElemental get_hash PRE-IMAGE (canonical
    // concat string; see QcelMoleculeCanonical). The oracle reconstructs
    // the exact bytes independently in SQL (geometry values are halves, so
    // decimal-vs-repr formatting coincides by construction); DuckDB has no
    // sha1, so the digest itself is pinned in MoleculeCodecSpec against
    // CPython-generated vectors and the driver checks the pre-image here —
    // a byte-identical pre-image plus a pinned sha1 IS the digest check.
    "mol_qcel_canonical" -> ((s, dir) => {
      val m = molecules(s, dir).filter(col("molecule_id") < 100)
        .withColumn("charge",
          ((col("molecule_id") % 5 - 2).cast("double") / 4.0))
        .withColumn("mult", (col("molecule_id") % 3 + 1).cast("int"))
        .withColumn("real", array_repeat(lit(true), size(col("symbols"))))
      m.select(col("molecule_id"),
          graft.functions.QcelMoleculeCanonical(
            col("symbols"), lit(null), col("charge"), col("mult"),
            col("real"), col("geometry"),
            lit(null), lit(null), lit(null), lit(null)).as("canonical"))
        .orderBy(col("molecule_id"))
    }),

    // F7 reference parity — hash_dict over a nested spec document
    // (`qcportal/qcportal/utils.py:383-385`): unsorted input keys, nested
    // dict, string/int/double values; the oracle assembles the canonical
    // sorted-key rendering by hand and sha256s it in DuckDB.
    "f7_spec_hash" -> ((s, dir) => {
      import graft.functions.Hashing
      t(s, dir, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          to_json(struct(
            col("o_orderstatus").as("status"),
            col("o_totalprice").cast("double").as("total"),
            struct(col("o_custkey").as("custkey"),
              concat(lit("c"), col("o_custkey") % 7).as("tag")).as("meta"),
            col("o_orderpriority").as("priority"))).as("spec"))
        .select(col("o_orderkey"), Hashing.pyDictHash256(col("spec")).as("spec_hash"))
        .orderBy(col("o_orderkey"))
    }),

    // F9 — (N,3) reshape: atom count, per-atom coordinate access, and the
    // flatten∘reshape identity.
    "mol_geometry_reshape" -> ((s, dir) => {
      val m = molecules(s, dir)
        .withColumn("atoms", Molecules.reshape3(col("geometry")))
      m.select(
          col("molecule_id"),
          size(col("atoms")).as("n_atoms"),
          element_at(element_at(col("atoms"), 1), 2).as("first_y"),
          element_at(element_at(col("atoms"), -1), 3).as("last_z"),
          (Molecules.flatten3(col("atoms")) === col("geometry")).as("roundtrip_ok"))
        .orderBy(col("molecule_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // independent reconstruction: the formula is assembled from the count
    // arithmetic, never from a symbols array
    "mol_hill_formula" ->
      """WITH m AS (
        |  SELECT (p_size % 3 + 1) AS nc, (p_size % 5) AS nh,
        |         (p_partkey % 2 + 1) AS no_, (p_partkey % 3) AS nn
        |  FROM part),
        |f AS (
        |  SELECT
        |    'C' || (CASE WHEN nc > 1 THEN CAST(nc AS VARCHAR) ELSE '' END) ||
        |    (CASE WHEN nh = 0 THEN ''
        |          WHEN nh = 1 THEN 'H'
        |          ELSE 'H' || CAST(nh AS VARCHAR) END) ||
        |    (CASE WHEN nn = 0 THEN ''
        |          WHEN nn = 1 THEN 'N'
        |          ELSE 'N' || CAST(nn AS VARCHAR) END) ||
        |    (CASE WHEN no_ = 1 THEN 'O'
        |          ELSE 'O' || CAST(no_ AS VARCHAR) END) AS formula
        |  FROM m)
        |SELECT formula, COUNT(*) AS n
        |FROM f
        |GROUP BY formula
        |ORDER BY formula""".stripMargin,

    // independent reconstruction, same arithmetic as mol_hill_formula
    "mol_search" ->
      """WITH m AS (
        |  SELECT p_partkey AS molecule_id,
        |    (p_size % 3 + 1) AS nc, (p_size % 5) AS nh,
        |    (p_partkey % 2 + 1) AS no_, (p_partkey % 3) AS nn,
        |    'src' || CAST(p_partkey % 4 AS VARCHAR) AS source
        |  FROM part),
        |f AS (
        |  SELECT molecule_id, source,
        |    'C' || (CASE WHEN nc > 1 THEN CAST(nc AS VARCHAR) ELSE '' END) ||
        |    (CASE WHEN nh = 0 THEN ''
        |          WHEN nh = 1 THEN 'H'
        |          ELSE 'H' || CAST(nh AS VARCHAR) END) ||
        |    (CASE WHEN nn = 0 THEN ''
        |          WHEN nn = 1 THEN 'N'
        |          ELSE 'N' || CAST(nn AS VARCHAR) END) ||
        |    (CASE WHEN no_ = 1 THEN 'O'
        |          ELSE 'O' || CAST(no_ AS VARCHAR) END) AS formula
        |  FROM m)
        |SELECT molecule_id, formula, source
        |FROM f
        |WHERE formula IN ('C2H3NO2', 'C3HO2')
        |  AND source IN ('src1', 'src3')
        |  AND molecule_id < 15000
        |ORDER BY molecule_id DESC""".stripMargin,

    // independent byte-level reconstruction of the get_hash pre-image:
    // element lists from the count arithmetic, geometry rendered as
    // DECIMAL(.,1) (values are exact halves, so decimal formatting equals
    // Python float repr by construction), charge via explicit literals
    "mol_qcel_canonical" ->
      """WITH m AS (
        |  SELECT p_partkey AS molecule_id,
        |    CAST(p_size % 3 + 1 AS BIGINT) AS nc, CAST(p_size % 5 AS BIGINT) AS nh,
        |    CAST(p_partkey % 2 + 1 AS BIGINT) AS no_, CAST(p_partkey % 3 AS BIGINT) AS nn
        |  FROM part WHERE p_partkey < 100),
        |b AS (
        |  SELECT molecule_id, nc + nh + no_ + nn AS natoms,
        |    flatten([
        |      list_transform(generate_series(1, nc), x -> 'C'),
        |      list_transform(generate_series(1, nh), x -> 'H'),
        |      list_transform(generate_series(1, no_), x -> 'O'),
        |      list_transform(generate_series(1, nn), x -> 'N')]) AS syms
        |  FROM m)
        |SELECT molecule_id,
        |  '["' || array_to_string(syms, '", "') || '"]'
        |  || 'null'
        |  || (CASE molecule_id % 5 WHEN 0 THEN '-0.5' WHEN 1 THEN '-0.25'
        |        WHEN 2 THEN '0.0' WHEN 3 THEN '0.25' ELSE '0.5' END)
        |  || CAST(molecule_id % 3 + 1 AS VARCHAR)
        |  || '[' || array_to_string(
        |       list_transform(generate_series(1, natoms), x -> 'true'), ', ') || ']'
        |  || '[' || array_to_string(
        |       list_transform(generate_series(1, 3 * natoms),
        |         i -> CAST(i * 0.5 + molecule_id AS VARCHAR)), ', ') || ']'
        |  || 'nullnullnullnull' AS canonical
        |FROM b
        |ORDER BY molecule_id""".stripMargin,

    // canonical sorted-key rendering assembled by hand; sha256 in DuckDB
    "f7_spec_hash" ->
      """SELECT o_orderkey,
        |  sha256(
        |    '{"meta": {"custkey": ' || CAST(o_custkey AS VARCHAR)
        |    || ', "tag": "c' || CAST(o_custkey % 7 AS VARCHAR) || '"}, "priority": "'
        |    || o_orderpriority || '", "status": "' || o_orderstatus
        |    || '", "total": ' || CAST(CAST(o_totalprice AS DOUBLE) AS VARCHAR)
        |    || '}') AS spec_hash
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin,

    "mol_geometry_reshape" ->
      """WITH m AS (
        |  SELECT p_partkey AS molecule_id,
        |    CAST((p_size % 3 + 1) + (p_size % 5)
        |       + (p_partkey % 2 + 1) + (p_partkey % 3) AS INT) AS n_atoms
        |  FROM part)
        |SELECT molecule_id, n_atoms,
        |  CAST(2 * 0.5 + molecule_id AS DOUBLE) AS first_y,
        |  CAST((3 * n_atoms) * 0.5 + molecule_id AS DOUBLE) AS last_z,
        |  TRUE AS roundtrip_ok
        |FROM m
        |ORDER BY molecule_id""".stripMargin
  )
}
