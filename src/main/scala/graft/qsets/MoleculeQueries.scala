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

    "mol_geometry_reshape" ->
      """WITH m AS (
        |  SELECT p_partkey AS molecule_id,
        |    CAST((p_size % 3 + 1) + (p_size % 5)
        |       + (p_partkey % 2 + 1) + (p_partkey % 3) AS INT) AS n_atoms
        |  FROM part)
        |SELECT molecule_id, n_atoms,
        |  2 * 0.5 + molecule_id AS first_y,
        |  (3 * n_atoms) * 0.5 + molecule_id AS last_z,
        |  TRUE AS roundtrip_ok
        |FROM m
        |ORDER BY molecule_id""".stripMargin
  )
}
