package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join-shaped operators from SURVEY §2.3.
  *
  * The reference's join surface (J1-J13) is conditional SQLAlchemy join
  * construction; here each shape is a reusable DataFrame combinator. Dim
  * tables (specs, users, regions...) are broadcast; record-scale joins
  * shuffle on their equi-keys and AQE handles skew at scale.
  */
object JoinOps {

  /** J7 — the dataset `submit` anti-join: the entry × specification matrix
    * minus already-materialized items = records still to create
    * (`qcfractal/components/base_dataset_socket.py:1333-1435`).
    *
    * `entries` and `specs` are dataset-scoped dims; their cross join is
    * |E|×|S| but never materialized wider than the anti-join output. The
    * existing-items side is the big one at scale — keep it as the probe
    * side: broadcast the (small) matrix when it fits, else shuffle on the
    * composite key.
    */
  def submitMissing(entries: DataFrame, specs: DataFrame,
                    existing: DataFrame, keys: Seq[String]): DataFrame =
    entries.crossJoin(specs)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** J8/J9 — dedup insert: split an incoming batch into rows that are new
    * vs rows whose key already exists
    * (`qcfractal/db_socket/helpers.py:644-813`, INSERT .. ON CONFLICT).
    * In-batch duplicates keep the first occurrence by `orderCol` (the
    * reference keeps the first by input index).
    * Returns (toInsert, existingMatched).
    */
  def dedupInsert(batch: DataFrame, existing: DataFrame, keys: Seq[String],
                  orderCol: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val firstPerKey = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val exKeys = existing.select(keys.map(col): _*)
    val toInsert = firstPerKey.join(exKeys, keys, "left_anti")
    val matched  = batch.join(exKeys, keys, "left_semi")
    (toInsert, matched)
  }

  /** Chunked delete with per-id metadata (`db_socket/helpers.py:576-641`
    * `delete_general` + the reference's DeleteMetadata): given a table
    * and an ORDERED id list, returns
    *
    *  - `remaining`: the table minus the listed ids (one anti-join —
    *    the ids are a request-sized literal relation, broadcast under
    *    AQE against the streamed table), and
    *  - `meta`: one row PER REQUESTED id IN REQUEST ORDER —
    *    (idx, id, status) with status `deleted` when the id existed and
    *    `missing` when it did not — the O5 input-order contract applied
    *    to deletes (the reference reports deleted_idx/missing positions
    *    against the caller's list). Duplicate requested ids each get
    *    their own row; only the first can observe `deleted` semantics in
    *    a real store, but a single batch delete removes all, so every
    *    occurrence of an existing id reports `deleted` (matching the
    *    reference's chunked `IN`-delete, where the whole chunk succeeds
    *    together).
    */
  def deleteWithMetadata(table: DataFrame, idCol: String,
                         ids: Seq[Long]): (DataFrame, DataFrame) = {
    val spark = table.sparkSession
    import spark.implicits._
    val req = ids.zipWithIndex.map { case (id, i) => (i.toLong, id) }
      .toDF("idx", "__del_id")
    val remaining = table.join(
      broadcast(req.select(col("__del_id").as(idCol)).distinct()),
      Seq(idCol), "left_anti")
    // existence check: semi-join the TABLE down to the request first —
    // `present` is bounded by the request size, never by the table's
    // distinct-id count (which is not broadcastable at scale)
    val present = table.select(col(idCol).as("__del_id"))
      .join(broadcast(req.select(col("__del_id")).distinct()),
        Seq("__del_id"), "left_semi")
      .distinct()
    val meta = req.join(broadcast(present.withColumn("__hit", lit(true))),
        Seq("__del_id"), "left")
      .select(col("idx"), col("__del_id").as(idCol),
        when(col("__hit"), "deleted").otherwise("missing").as("status"))
    (remaining, meta)
  }

  /** Skew-safe equi join: the big side is salted into `salts` sub-keys by
    * hashing `spreadCol` (any well-distributed column of the big side);
    * the small side is replicated once per salt, and the join key becomes
    * (keys..., salt). A permanently-hot key's rows then land on `salts`
    * reducers instead of one. AQE's skew-join split covers sort-merge
    * skew it can observe at runtime; explicit salting is the plan-level
    * tool when a hot key is known (a default/null-ish key, a mega-tenant)
    * — and it composes with any join type the small side tolerates
    * replication for. Results are identical to the plain join. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     spreadCol: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(spreadCol)), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** J13 — iterative parent/child closure (BFS to fixpoint), the Spark
    * form of the reference's Python BFS loop
    * (`qcfractal/components/record_socket.py:210-236`).
    *
    * `edges(parentCol, childCol)`; returns (root, descendant) pairs — a
    * root reachable from itself (a cycle through it, or a self-loop)
    * appears as its own descendant, same as the reference's visited-set
    * BFS. Each iteration is one shuffle join of the (shrinking) frontier
    * against the edge table, then an anti-join against the accumulated
    * result so ALREADY-VISITED nodes leave the frontier — that
    * visited-set subtraction is what makes cyclic graphs terminate in
    * diameter+1 iterations (without it a cycle keeps the frontier
    * oscillating for all `maxIter` rounds) and makes the per-iteration
    * batches disjoint by construction, so no result-wide distinct
    * shuffle is needed at the end. Frontiers are localCheckpointed so
    * the plan does not grow linearly with depth (lineage blow-up is the
    * classic iterative-join failure mode at scale). Hitting `maxIter`
    * with a live frontier logs a WARN: the closure is truncated at that
    * depth.
    */
  def closure(edges: DataFrame, roots: DataFrame, rootCol: String,
              parentCol: String, childCol: String, maxIter: Int = 30): DataFrame = {
    // edges are probed every iteration — materialize once instead of
    // re-running the edge-view union/scan per hop
    val e = edges.select(col(parentCol), col(childCol))
      .localCheckpoint(eager = true)
    var frontier = roots.select(col(rootCol).as("root"), col(rootCol).as("node"))
      .localCheckpoint(eager = true)
    var acc = frontier.filter(lit(false)) // empty (root, node)
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = frontier.join(e, frontier("node") === e(parentCol))
        .select(col("root"), col(childCol).as("node"))
        .distinct()
        // visited-set subtraction: acc is a union of <= maxIter disjoint
        // checkpointed batches, so this anti-join's build side is bounded
        // by the closure size, never the iteration count
        .join(acc, Seq("root", "node"), "left_anti")
        .localCheckpoint(eager = true)
      if (next.isEmpty) done = true
      else { acc = acc.union(next); frontier = next }
      i += 1
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"closure truncated at maxIter=$maxIter with a non-empty frontier — " +
          s"results cover only the first $maxIter hops")
    acc
  }
}
