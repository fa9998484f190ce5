package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Vectors

/** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv 2303.09540): semantic near-dup
  * pruning for embedding corpora. Cluster the embeddings with k-means,
  * then compare vectors ONLY within a cluster — a within-cell pair at
  * cosine ≥ τ marks the higher-id member a duplicate; survivors are the
  * ids dominated by no lower-id within-cell near-dup (the first-wins rule
  * every dedup family here uses, so results are deterministic and
  * engine-replayable).
  *
  * Scale shape: the comparison is quadratic IN THE CELL, never in the
  * corpus — k is the knob that keeps total work linear. Pick
  * k ≈ n / targetCellSize (the paper runs 50k clusters over 1.28B LAION
  * embeddings, ~25k vectors per cell); assignment against literal
  * centroids is a pure map ([[graft.similarity.Kmeans]]), the self-join
  * shuffles both sides on `cell` (co-partitioned, no corpus-scale
  * broadcast), and nothing is ever all-pairs across cells. The oracle
  * instantiation (dd_semdedup) uses the decimal-exact
  * [[graft.similarity.Kmeans.fitAnchor]] so DuckDB replays fit,
  * assignment, and prune end to end; production fits may use MLlib
  * ([[graft.similarity.Vectors.ivfFit]]) with identical downstream shape.
  */
object SemDedup {

  /** Within-cell cosine pruning. `vecs` = (idCol, vecCol array<double>),
    * `cells` = (idCol, "cell"). Returns survivors (idCol, cell), one row
    * per input id that is NOT within cosine ≥ tau (rounded to 6, the
    * engine-parity scale) of any lower-id vector in its cell. */
  def survivors(vecs: DataFrame, cells: DataFrame, tau: Double,
                idCol: String = "vec_id", vecCol: String = "c_vec"): DataFrame = {
    val av = vecs.select(col(idCol), col(vecCol))
      .join(cells.select(col(idCol), col("cell")), idCol)
    val a = av.select(col("cell"), col(idCol).as("__id_a"), col(vecCol).as("__va"))
    val b = av.select(col("cell"), col(idCol).as("__id_b"), col(vecCol).as("__vb"))
    // duplicate side of each qualifying pair; distinct before the
    // anti-join so one hot id doesn't fan the probe side out
    val dominated = a.join(b, Seq("cell"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(round(Vectors.cosine(col("__va"), col("__vb")), 6) >= tau)
      .select(col("__id_b").as(idCol))
      .distinct()
    av.join(dominated, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }
}
