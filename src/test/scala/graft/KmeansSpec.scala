package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.{Kmeans, Vectors}

/** Oracle-anchored Lloyd's k-means: deterministic init, monotone
  * inertia, exact hand-computable means, and empty-cell carry-over. */
class KmeansSpec extends SparkSuite {
  import spark.implicits._

  private lazy val corpus: DataFrame =
    Tables.load(spark, sfDir, "embeddings").select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("c_vec"))

  private def inertia(asg: DataFrame): Double =
    asg.agg(sum(round(col("d2"), 6)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double"))
      .head().getDouble(0)

  test("fit is deterministic end to end") {
    val (a1, c1) = Kmeans.fitAnchor(corpus, k = 8, iters = 2)
    val (a2, c2) = Kmeans.fitAnchor(corpus, k = 8, iters = 2)
    assert(c1 === c2)
    assert(a1.orderBy(col("vec_id")).collect().toSeq ===
      a2.orderBy(col("vec_id")).collect().toSeq)
  }

  test("Lloyd iterations never increase inertia") {
    val cent0 = Kmeans.pivotInit(corpus, 8)
    val asg0 = Kmeans.assign(corpus, cent0)
    val cent1 = Kmeans.lloydStep(asg0, cent0)
    val asg1 = Kmeans.assign(corpus, cent1)
    val cent2 = Kmeans.lloydStep(asg1, cent1)
    val asg2 = Kmeans.assign(corpus, cent2)
    val (i0, i1, i2) = (inertia(asg0), inertia(asg1), inertia(asg2))
    // means minimize within-cell squared distance, reassignment only
    // moves points to closer centroids — inertia is non-increasing
    // (up to the documented 1e-6 rounding grain per term)
    val tol = 1e-3
    assert(i1 <= i0 + tol, s"i0=$i0 i1=$i1")
    assert(i2 <= i1 + tol, s"i1=$i1 i2=$i2")
    assert(i2 < i0, "two iterations should strictly improve on the pivot init")
  }

  test("scaled-long lloydStep ≡ the decimal-aggregate reference form") {
    // the production long-sum form and the Decimal(18,6)-buffered
    // reference must produce bit-identical centroids on real vectors
    // (fixed-scale decimal addition IS long addition; the mean finisher
    // replays the same BigDecimal→double→round chain)
    val cent0 = Kmeans.pivotInit(corpus, 8)
    val asg = Kmeans.assign(corpus, cent0)
    val fast = Kmeans.lloydStep(asg, cent0)
    val ref = Kmeans.lloydStepDecimalRef(asg, cent0)
    assert(fast === ref)
    // adversarial magnitudes: values whose round6 sits on a half-up
    // boundary in decimal but not in binary (0.0000005 is 4.99…e-7 as a
    // double; BigDecimal.valueOf sees the decimal shortest form)
    val tricky = Seq(
      (1L, Seq(0.0000005, -0.0000005)), (2L, Seq(0.1234565, 2.5e-7)),
      (3L, Seq(1e-7, 0.9999995)), (4L, Seq(-0.1234565, 123.4567894)))
      .toDF("vec_id", "c_vec")
    val c0 = Seq(Seq(0.0, 0.0), Seq(100.0, 100.0))
    val asg2 = Kmeans.assign(tricky, c0)
    assert(Kmeans.lloydStep(asg2, c0) === Kmeans.lloydStepDecimalRef(asg2, c0))
  }

  test("update means are exact on a hand-computed fixture") {
    // two well-separated 2-dim groups; k=2 pivots fall one in each
    val rows = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)),
      (10L, Seq(10.0, 10.0)), (11L, Seq(11.0, 10.0)), (12L, Seq(10.0, 11.0)))
      .toDF("vec_id", "c_vec")
    val init = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    val next = Kmeans.lloydStep(Kmeans.assign(rows, init), init)
    assert(next(0) === Seq(1.0 / 3, 1.0 / 3).map(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(next(1) === Seq(10.0 + 1.0 / 3, 10.0 + 1.0 / 3).map(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("an empty cell keeps its previous centroid") {
    // both points sit at the origin: the far pivot gets no members
    val rows = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)))
      .toDF("vec_id", "c_vec")
    val init = Seq(Seq(0.0, 0.0), Seq(100.0, 100.0))
    val next = Kmeans.lloydStep(Kmeans.assign(rows, init), init)
    assert(next(1) === Seq(100.0, 100.0), "empty cell must carry over")
    assert(next(0) === Seq(0.05, 0.0))
  }

  test("assignment ties break to the lowest cell") {
    val rows = Seq((1L, Seq(5.0))).toDF("vec_id", "c_vec")
    // equidistant centroids — cell 0 must win
    val asg = Kmeans.assign(rows, Seq(Seq(4.0), Seq(6.0))).collect()
    assert(asg.head.getAs[Int]("cell") === 0)
  }

  test("native assign ≡ the composable HOF reference form, cell and d2") {
    // the corpus-wide parity pin for NearestCellExpr: identical cells
    // AND identical rounded distances against an awkward k (ties, empty
    // cells possible) — the oracle replays assume the HOF arithmetic
    val cent = Kmeans.pivotInit(corpus, 7)
    val a = Kmeans.assign(corpus, cent)
      .select(col("vec_id"), col("cell"), col("d2"))
      .orderBy(col("vec_id")).collect().toSeq
    val b = Kmeans.assignHof(corpus, cent)
      .select(col("vec_id"), col("cell"), col("d2"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(a === b)
  }

  test("native assign parity holds on float input and throws on bad dim") {
    val floats = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").as("c_vec")).limit(20)
    val cent = Kmeans.pivotInit(corpus, 3)
    val a = Kmeans.assign(floats, cent)
      .select(col("vec_id"), col("cell"), col("d2"))
      .orderBy(col("vec_id")).collect().toSeq
    val b = Kmeans.assignHof(floats, cent)
      .select(col("vec_id"), col("cell"), col("d2"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(a === b)
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "c_vec")
    val e = intercept[Exception] { Kmeans.assign(bad, cent).collect() }
    assert(e.getMessage != null)
  }
}
