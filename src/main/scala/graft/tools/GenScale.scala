package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: writes an N×-scaled copy of a TESTDATA
  * scale-factor directory by unioning N key-shifted copies of every table
  * (copy 0 is byte-identical to the source, so sf1 ⊇ sf0.1 semantically).
  *
  * Scaling must preserve RATES, not just row counts, or the rehearsal
  * measures artifacts of the generator instead of the engine:
  *  - All foreign keys shift consistently (custkey/orderkey/partkey/
  *    suppkey/user_id), so join fan-outs scale linearly.
  *  - `documents` copy k>0 suffixes every token with `_k`: each copy is
  *    an independent shard with IDENTICAL internal near-dup structure
  *    (near-dup pairs map token-wise) but ZERO cross-copy shingle
  *    overlap — a verbatim 10× copy would instead create 10-way
  *    near-dup families and a quadratic pair blowup the engine would be
  *    blamed for.
  *  - `embeddings` copy k rotates the vector by k positions: rotation
  *    preserves norms and within-copy pairwise cosines (neighbor
  *    structure identical per copy) while decorrelating copies.
  *  - `region`/`nation` stay as-is (dimension tables don't grow).
  *
  * Ids stay far below the 1,000,000 planted-copy offset the dd_* queries
  * use. `events.ts` is read raw (nanos-as-long) and written back as the
  * same long, so Tables.load applies the identical ns→µs conversion on
  * the generated directory.
  *
  * Usage: GenScale <srcSfDir> <outDir> [copies=10]
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // per-table row spans at the source scale (dense 0-based keys): the
    // shift constant per copy, measured rather than assumed so the
    // generator works at any source sf
    def span(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L
    def spanInt(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().get(0) match {
        case i: Int => i.toLong + 1L; case l: Long => l + 1L
      }

    val customer = read("customer"); val supplier = read("supplier")
    val part = read("part"); val orders = read("orders")
    val lineitem = read("lineitem"); val events = read("events")
    val documents = read("documents"); val embeddings = read("embeddings")

    val nCust = span(customer, "c_custkey")
    val nSupp = span(supplier, "s_suppkey")
    val nPart = span(part, "p_partkey")
    val nOrd = span(orders, "o_orderkey")
    val nEvt = span(events, "event_id")
    val nUser = spanInt(events, "user_id")
    val nDoc = span(documents, "doc_id")
    val nVec = span(embeddings, "vec_id")

    def scaled(df: DataFrame, perCopy: Int => DataFrame): DataFrame =
      (0 until copies).map(perCopy).reduce(_ unionByName _)

    def shift(df: DataFrame, k: Int, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + lit(k * s)) }

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] wrote $name x$copies")
    }

    // dimension tables: unchanged
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(scaled(customer, k => shift(customer, k, "c_custkey" -> nCust)),
      "customer", 8)
    write(scaled(supplier, k => shift(supplier, k, "s_suppkey" -> nSupp)),
      "supplier", 4)
    write(scaled(part, k => shift(part, k, "p_partkey" -> nPart)), "part", 8)
    write(scaled(orders, k => shift(orders, k,
      "o_orderkey" -> nOrd, "o_custkey" -> nCust)), "orders", 16)
    write(scaled(lineitem, k => shift(lineitem, k,
      "l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp)),
      "lineitem", 32)
    write(scaled(events, k => shift(events, k,
      "event_id" -> nEvt, "user_id" -> nUser)), "events", 16)

    // documents: token-suffix remap per copy (see scaladoc); n_chars
    // recomputed for the transformed text
    write(scaled(documents, k =>
      if (k == 0) documents
      else shift(documents, k, "doc_id" -> nDoc)
        .withColumn("text", array_join(
          transform(split(trim(col("text")), "\\s+"),
            t => concat(t, lit(s"_$k"))), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents", 8)

    // embeddings: circular rotation by k per copy. Dimension measured from
    // the data (not hardcoded): element_at past the array end yields silent
    // nulls under non-ANSI semantics, so a wrong constant would corrupt
    // every scaled copy without an error.
    val dim = embeddings.select(size(col("embedding")).as("d"))
      .agg(min(col("d")), max(col("d"))).head() match {
      case r if r.getInt(0) == r.getInt(1) => r.getInt(0)
      case r => sys.error(
        s"ragged embedding widths ${r.getInt(0)}..${r.getInt(1)} — refusing to rotate")
    }
    // Copy k>0: rotate by (k mod dim), then flip signs by a per-(k,i)
    // hash bit. Rotation ALONE collides once copies exceed dim — copy k
    // and copy k+dim would get the same rotation, planting identical
    // vectors cross-copy (fabricated exact near-dups the engine would be
    // blamed for at 100 copies). The sign pattern is distinct per k,
    // preserves norms and within-copy cosines exactly (sign_i^2 = 1
    // cancels in every dot product), and ±1 multiplication is exact in
    // IEEE floats — copies stay internally identical, mutually
    // decorrelated.
    write(scaled(embeddings, k =>
      if (k == 0) embeddings
      else shift(embeddings, k, "vec_id" -> nVec)
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)),
            i => element_at(col("embedding"), pmod(i + lit(k), lit(dim)) + 1) *
              when(pmod(xxhash64(lit(k), i), lit(2)) === 0, lit(1.0f))
                .otherwise(lit(-1.0f))))),
      "embeddings", 4)

    spark.stop()
  }
}
