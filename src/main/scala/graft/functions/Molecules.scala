package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Molecule fidelity functions (SURVEY F8/F9/F10).
  *
  *  - F9 geometry reshape: the reference stores geometry as a flattened
  *    (N,3) float array and reshapes client-side
  *    (`qcportal/qcportal/utils.py:388-395`).
  *  - F10 Hill-order formula (`qcfractal/qcfractal/components/molecules/
  *    socket.py:238-244`): C first, H second, all other elements
  *    alphabetical; counts of 1 are omitted.
  *  - F8 canonical molecule hash (`qcfractal/qcfractal/components/
  *    molecules/db_models.py:100-112`): sha1 over a canonical rendering —
  *    lowercased symbols, charge, multiplicity, geometry formatted at
  *    fixed 8-decimal precision (QCElemental-style noise floor so float
  *    jitter below 1e-8 does not change the identity hash). The exact
  *    byte format is OURS (engine-independent, pinned by unit fixtures) —
  *    parity with QCElemental's own digest is explicitly not claimed.
  *
  * All pure Catalyst expressions — no UDFs. */
object Molecules {

  /** F9 — flat geometry → array of (x,y,z) triples. */
  def reshape3(flat: Column): Column =
    transform(sequence(lit(1), (size(flat) / 3).cast("int")),
      i => array(element_at(flat, i * 3 - 2),
                 element_at(flat, i * 3 - 1),
                 element_at(flat, i * 3)))

  /** F9 — (N,3) triples → flat array. */
  def flatten3(nested: Column): Column = flatten(nested)

  /** F10 — Hill-order molecular formula from a symbols array. */
  def hillFormula(symbols: Column): Column = {
    // per distinct element: Hill sort key (C < H < others-alphabetical),
    // the symbol, and its occurrence count
    val counted = transform(array_distinct(symbols), s =>
      struct(
        when(s === "C", lit("0")).when(s === "H", lit("1"))
          .otherwise(concat(lit("2"), s)).as("k"),
        s.as("sym"),
        size(filter(symbols, x => x === s)).as("n")))
    concat_ws("", transform(sort_array(counted), p =>
      concat(p.getField("sym"),
        when(p.getField("n") > 1, p.getField("n").cast("string"))
          .otherwise(lit("")))))
  }

  /** F8 — canonical molecule sha1 (fields in declared order, geometry at
    * fixed %.8f precision). */
  def moleculeHash(symbols: Column, geometry: Column,
                   charge: Column, multiplicity: Column): Column = {
    val symCsv = concat_ws(",", transform(symbols, s => lower(s)))
    val geomCsv = concat_ws(",", transform(geometry, g => format_string("%.8f", g)))
    sha1(concat_ws("|",
      symCsv,
      charge.cast("double").cast("string"),
      multiplicity.cast("int").cast("string"),
      geomCsv))
  }
}
