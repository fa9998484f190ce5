package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Vectors
import graft.text.TextFunctions

/** Scale-guard specs: the behaviors that only matter at 100 TB — hot-bucket
  * capping, multi-band LSH recall on non-identical near-dups, sampled IVF
  * determinism, linear-time repetition scoring. */
class ScaleGuardSpec extends SparkSuite {

  import spark.implicits._

  /** Driver-side union-find over a small collected pair set. */
  private def componentCount(n: Long, pairs: Seq[(Long, Long)]): Int = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (0L until n).foreach(i => parent(i) = i)
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    (0L until n).map(find).distinct.size
  }

  test("adaptive SRP params: small corpora keep the pinned (10, 4); bits grow log2(n)") {
    // the historical parameterization must be stable for every corpus the
    // small-SF oracles run on, so recorded outputs do not shift
    assert(Vectors.adaptiveSrpParams(100L, 0.99) === ((10, 4)))
    assert(Vectors.adaptiveSrpParams(4000L, 0.99) === ((10, 4)))
    assert(Vectors.adaptiveSrpParams(24L * 1024, 0.99) === ((10, 4)))
    // past minBits, bits track log2(n/targetBucket) and bands compensate
    val (b400k, bands400k) = Vectors.adaptiveSrpParams(400000L, 0.99)
    assert(b400k === 15 && bands400k >= 4, s"got ($b400k, $bands400k)")
    val (b40m, _) = Vectors.adaptiveSrpParams(40000000L, 0.99)
    assert(b40m === 21)
    // expected candidate volume n²/2^(bits+1)·bands stays ~linear in n:
    // per-corpus work per vector (n/2^(bits+1)·bands) is bounded
    for (n <- Seq(1000000L, 10000000L, 100000000L)) {
      val (bits, bands) = Vectors.adaptiveSrpParams(n, 0.99)
      val perVec = n.toDouble / math.pow(2.0, bits + 1) * bands
      assert(perVec < 100.0, s"n=$n → per-vector candidate work $perVec")
    }
  }

  test("adaptive SRP params: recall math keeps multi-band detection above target") {
    // p_bit for cos 0.99 is ~0.955; verify the chosen (bits, bands) keep
    // 1-(1-p^bits)^bands ≥ 0.95 across the sweep (recallTarget 0.97 minus
    // slack for the band cap)
    val pBit = 1.0 - math.acos(0.99) / math.Pi
    for (n <- Seq(1000L, 100000L, 1000000L, 100000000L)) {
      val (bits, bands) = Vectors.adaptiveSrpParams(n, 0.99)
      val det = 1.0 - math.pow(1.0 - math.pow(pBit, bits), bands)
      assert(det >= 0.95, s"n=$n (bits=$bits, bands=$bands) detection $det")
    }
  }

  test("bounded bucket pairs: small buckets produce exactly the all-pairs set") {
    // buckets: 10 → {1}, 20 → {2,3}, 30 → {4,5,6}; cap well above sizes
    val items = Seq((10L, 1L), (20L, 2L), (20L, 3L), (30L, 4L), (30L, 5L), (30L, 6L))
      .toDF("bucket", "id")
    val got = Dedup.boundedBucketPairs(items, Seq(col("bucket")), col("id"), cap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)))
  }

  test("bounded bucket pairs: a mega-bucket stays bounded and connected") {
    val n = 1000L
    val cap = 100
    val items = spark.range(n).select(lit(777L).as("bucket"), col("id"))
    val pairs = Dedup.boundedBucketPairs(items, Seq(col("bucket")), col("id"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // naive all-pairs would emit n(n-1)/2 = 499500 rows; sub-salting caps
    // each of the ~10 groups at ~cap²/2 pairs plus the bridge chain
    assert(pairs.length < 150000, s"pairs not bounded: ${pairs.length}")
    assert(pairs.length > n, "suspiciously few pairs")
    // no silent fragmentation: bridges keep the bucket one component
    assert(componentCount(n, pairs.toSeq) === 1)
    // and no duplicate or self pairs
    assert(pairs.distinct.length === pairs.length)
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("minhash with tiny bucket cap: exact dups unaffected, near-dup family stays one cluster") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // 120 near-identical docs (unique suffix defeats exact-dup collapse):
    // pairwise 2-shingle jaccard = 11/13 ≈ 0.846
    val family = (0 until 120).map(i => (i.toLong, s"$base uniq$i"))
    // plus planted exact copies of 10 unrelated docs (collapse path)
    val others = (0 until 10).map(i =>
      (1000L + i, s"other$i one two three four five six seven eight nine"))
    val docs = (family ++ others ++ others.map { case (id, t) => (id + 500L, t) })
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleN = 2, k = 16, bands = 8, minJaccard = 0.8, bucketCap = 16)
    val collected = pairs.collect()
    // exact copies never touch the banding path — recall 1.0 regardless of cap
    val exact = collected.filter(_.getAs[Double]("jaccard") == 1.0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 10).forall(i => exact.contains((1000L + i, 1500L + i))))
    // the capped near-dup family still resolves to a single survivor
    val survivors = Dedup.survivors(
        docs.filter(col("doc_id") < 1000L), "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(survivors === Set(0L))
  }

  test("heterogeneous hot bucket: families fragment boundedly after verification") {
    // One hot bucket holding TWO unrelated families (ids 0..399 and
    // 400..799). Candidates keep the bucket one component (bridges), but a
    // caller's verify step rejects cross-family pairs — the documented
    // contract is fragmentation bounded by the salt-group count per
    // family, never a silent total drop.
    val n = 800L
    val cap = 100
    val g = math.ceil(n.toDouble / cap).toInt
    val items = spark.range(n).select(lit(9L).as("bucket"), col("id"))
    val cand = Dedup.boundedBucketPairs(items, Seq(col("bucket")), col("id"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(componentCount(n, cand.toSeq) === 1, "candidates must be one component")
    // every id is a candidate in at least one pair — nothing silently dropped
    assert(cand.flatMap(p => Seq(p._1, p._2)).distinct.length === n)
    // caller-style verification: only same-family pairs are "real"
    val verified = cand.filter(p => (p._1 < 400L) == (p._2 < 400L))
    val compA = componentCount(400L, verified.filter(_._2 < 400L).toSeq)
    val compB = componentCount(400L,
      verified.filter(_._1 >= 400L).map(p => (p._1 - 400L, p._2 - 400L)).toSeq)
    assert(compA <= g, s"family A fragmented into $compA > $g components")
    assert(compB <= g, s"family B fragmented into $compB > $g components")
    // fragmentation is real for at least one family (the reps chained by
    // bridges are min-ids, i.e. family-A-heavy, so B loses its bridges)
    assert(compA + compB > 2, "expected bounded fragmentation to be observable")
  }

  test("hashed shingles: window count matches the string form; prefix-sharing docs overlap") {
    import graft.functions.HashedShingles
    import graft.text.TextFunctions
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e f"), (3L, "x"), (4L, "  p   q  "))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        size(HashedShingles(col("text"), 2)).as("n_hashed"),
        greatest(size(TextFunctions.wsTokens(col("text"))) - 1, lit(0)).as("n_expected"))
      .collect()
    got.foreach(r => assert(r.getInt(1) === r.getInt(2),
      s"id ${r.getLong(0)}: ${r.getInt(1)} hashed vs ${r.getInt(2)} expected"))
    // docs 1 and 2 share all 4 of doc 1's 2-shingles; doc 3 has none
    val hs = docs.select(col("id"), HashedShingles(col("text"), 2).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hs(1L).toSet.subsetOf(hs(2L).toSet))
    assert(hs(3L).isEmpty)
    assert(hs(1L).toSet.intersect(hs(4L).toSet).isEmpty)
    // SET semantics (matches shinglesFromTokens' array_distinct): repeated
    // windows collapse, output is sorted canonical
    val rep = Seq(Tuple1("a b a b a")).toDF("text")
      .select(HashedShingles(col("text"), 2).as("hs"))
      .collect()(0).getSeq[Long](0)
    assert(rep.length === 2, s"'a b','b a' expected, got ${rep.length}")
    assert(rep === rep.sorted)
  }

  test("bounded bucket pairs: minimum cap still connects and never self-pairs") {
    val items = spark.range(20L).select(lit(1L).as("bucket"), col("id"))
    val pairs = Dedup.boundedBucketPairs(items, Seq(col("bucket")), col("id"), cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall(p => p._1 < p._2))
    assert(pairs.distinct.length === pairs.length)
    assert(componentCount(20L, pairs.toSeq) === 1)
  }

  test("native MinHashBands: deterministic, jaccard-sensitive, band-count stable") {
    import graft.functions.MinHashBands
    def bandsOf(tokens: Seq[String]): Seq[Long] =
      Seq(Tuple1(tokens)).toDF("sh")
        .select(MinHashBands(col("sh"), 16, 8).as("b"))
        .collect()(0).getSeq[Long](0)
    val a = (0 until 40).map(i => s"sh$i")
    // identical sets -> identical band hashes (exact-dup recall 1)
    assert(bandsOf(a) === bandsOf(a))
    assert(bandsOf(a).length === 8)
    // high-jaccard neighbor (39/41 ≈ 0.95) shares at least one band;
    // a disjoint set shares none
    val near = a.drop(1) :+ "extra"
    assert(bandsOf(a).intersect(bandsOf(near)).nonEmpty,
      "0.95-jaccard pair must collide in some band")
    val far = (0 until 40).map(i => s"zz$i")
    assert(bandsOf(a).intersect(bandsOf(far)).isEmpty,
      "disjoint sets should not share a band")
  }

  test("multi-band cosine lsh: noisy near-dups (not identical) recalled >= 95%") {
    // 100 base vectors, each with a slightly perturbed copy (cosine > 0.99
    // but < 1.0) — the case a single SRP signature misses when the pair
    // straddles one hyperplane
    val dim = 16
    def vec(i: Int): Array[Double] =
      Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toDouble)
    def noisy(i: Int): Array[Double] = {
      val v = vec(i)
      Array.tabulate(dim)(j => v(j) + 0.04 * math.cos(i * 13 + j * 5))
    }
    val rows = (0 until 100).flatMap(i =>
      Seq((i.toLong, vec(i)), (i + 1000L, noisy(i))))
    val df = rows.toDF("vec_id", "v")
    val got = Vectors.cosinePairsLsh(df, "vec_id", "v",
        dim = dim, bits = 10, minCosine = 0.98, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = (0 until 100).count(i => got.contains((i.toLong, i + 1000L)))
    assert(recalled >= 95, s"recall only $recalled/100")
  }

  test("dedup pipelines tolerate degenerate inputs: empty frames, blank texts") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashPairs(empty, "doc_id", "text",
      shingleN = 2, k = 16, bands = 8, minJaccard = 0.5).count() === 0)
    assert(Dedup.exactDedup(empty, "doc_id", Seq(col("text"))).count() === 0)
    assert(Dedup.survivors(empty, "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() === 0)
    // blank/short docs produce no shingles: no pairs, everyone survives
    val blanks = Seq((1L, ""), (2L, "   \t "), (3L, "one")).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(blanks, "doc_id", "text",
      shingleN = 2, k = 16, bands = 8, minJaccard = 0.5)
    assert(pairs.count() === 0)
    assert(Dedup.survivors(blanks, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // bounded bucket pairs on an empty frame: no groups, no pairs, no crash
    assert(Dedup.boundedBucketPairs(
      Seq.empty[(Long, Long)].toDF("bucket", "id"),
      Seq(col("bucket")), col("id")).count() === 0)
  }

  test("incremental dedup: id-ascending batches converge to the batch survivor set") {
    import graft.dedup.IncrementalDedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // dense near-dup family + PAIRWISE-DISJOINT unique docs (per-doc token
    // vocabulary, so cross-doc jaccard is exactly 0 and second-batch drops
    // rest on guaranteed j=1.0 copy matches, not band luck), then exact
    // copies of everything at +500 as the second batch: first-wins over
    // id-ascending batches must equal one global min-id batch pass
    val family = (0 until 30).map(i => (i.toLong, s"$base uniq$i"))
    val others = (0 until 10).map(i =>
      (100L + i, (0 until 10).map(j => s"d${i}w$j").mkString(" ")))
    val firstBatch = family ++ others
    val all = firstBatch ++ firstBatch.map { case (id, t) => (id + 500L, t) }
    val docs = all.toDF("doc_id", "text")

    val batchSurv = Dedup.survivors(docs, "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text",
          shingleN = 2, k = 16, bands = 8, minJaccard = 0.8))
      .collect().map(_.getLong(0)).toSet

    val idx = java.nio.file.Files.createTempDirectory("incdedup").toString + "/index"
    def inc(b: org.apache.spark.sql.DataFrame, batchId: Long) =
      IncrementalDedup.addBatch(b, "doc_id", "text", idx, batchId,
        shingleN = 2, k = 16, bands = 8, minJaccard = 0.8)
        .collect().map(_.getLong(0)).toSet
    val s1 = inc(docs.filter(col("doc_id") < 500L), batchId = 1L)
    val s2 = inc(docs.filter(col("doc_id") >= 500L), batchId = 2L)
    assert(s2.isEmpty, s"every second-batch doc duplicates an indexed survivor: $s2")
    assert(s1 ++ s2 === batchSurv)
    // idempotent retry: re-running batch 1 must NOT see its own previous
    // append (a survivor would match itself at j=1.0 and vanish)
    val s1retry = inc(docs.filter(col("doc_id") < 500L), batchId = 1L)
    assert(s1retry === s1, "retrying a batchId must reproduce its survivors")
    // mismatched signature parameters must fail loudly, not match nothing
    intercept[IllegalArgumentException] {
      IncrementalDedup.addBatch(docs.limit(1), "doc_id", "text", idx, batchId = 3L,
        shingleN = 3, k = 16, bands = 8, minJaccard = 0.8).collect()
    }
  }

  test("incremental dedup driven from foreachBatch converges to the batch survivor set") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.dedup.IncrementalDedup
    // two parquet files arriving as two micro-batches (maxFilesPerTrigger=1),
    // survivors accumulated through the documented foreachBatch integration
    val tmp = java.nio.file.Files.createTempDirectory("stream-inc").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val family = (0 until 20).map(i => (i.toLong, s"$base uniq$i"))
    val all = family ++ family.map { case (id, t) => (id + 500L, t) }
    val docs = all.toDF("doc_id", "text")
    docs.filter(col("doc_id") < 500L).coalesce(1).write.parquet(s"$tmp/in/b1")
    docs.filter(col("doc_id") >= 500L).coalesce(1).write.parquet(s"$tmp/in/b2")
    // file source orders batches by modification time — force b1 first
    val fs1 = new java.io.File(s"$tmp/in/b1").listFiles().filter(_.getName.endsWith(".parquet"))
    val fs2 = new java.io.File(s"$tmp/in/b2").listFiles().filter(_.getName.endsWith(".parquet"))
    fs1.foreach(_.setLastModified(1000000L)); fs2.foreach(_.setLastModified(2000000L))

    val survived = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val s = IncrementalDedup.addBatch(batch, "doc_id", "text",
          s"$tmp/index", batchId, shingleN = 2, k = 16, bands = 8, minJaccard = 0.8)
        survived.synchronized { survived ++= s.collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000L)
    q.stop()
    val batchSurv = Dedup.survivors(docs, "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text",
          shingleN = 2, k = 16, bands = 8, minJaccard = 0.8))
      .collect().map(_.getLong(0)).toSet
    assert(survived.toSet === batchSurv,
      s"streaming-incremental ${survived.toSet} != batch $batchSurv")
  }

  test("hot-band stop-list degrades recall boundedly, never crashes") {
    import graft.dedup.IncrementalDedup
    // bandCap=0 stop-lists every indexed band after batch 1 (any count
    // trips a zero cap), so batch-2 copies can no longer match the
    // index — the DOCUMENTED trade: they fall through to within-batch
    // dedup and survive as a batch-local cluster instead of being dropped
    val docs = (0 until 6).map(i => (i.toLong, "shared base text for everyone"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("inccap").toString + "/index"
    def inc(b: org.apache.spark.sql.DataFrame, batchId: Long) =
      IncrementalDedup.addBatch(b, "doc_id", "text", idx, batchId,
        shingleN = 2, k = 16, bands = 8, minJaccard = 0.8, bandCap = 0)
        .collect().map(_.getLong(0)).toSet
    val s1 = inc(docs.filter(col("doc_id") < 3L), 1L)
    assert(s1 === Set(0L), "identical batch-1 docs collapse to min id")
    val s2 = inc(docs.filter(col("doc_id") >= 3L), 2L)
    // index match suppressed by the stop-list -> batch-local survivor
    assert(s2 === Set(3L),
      "stop-listed bands must fall back to within-batch dedup, not crash")
  }

  test("incremental vector dedup: second batch of copies drops against the index") {
    import graft.similarity.IncrementalVectors
    val dim = 40
    // one-hot vectors: pairwise cosine exactly 0 — separation guaranteed
    def vec(i: Int): Array[Double] =
      Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0)
    // batch 1: 40 orthogonal vectors; batch 2: exact copies (+1000)
    val b1 = (0 until 40).map(i => (i.toLong, vec(i)))
    val b2 = b1.map { case (id, v) => (id + 1000L, v) }
    val docs = (b1 ++ b2).toDF("vec_id", "v")
    val idx = java.nio.file.Files.createTempDirectory("incvec").toString + "/index"
    def inc(b: org.apache.spark.sql.DataFrame, batchId: Long) =
      IncrementalVectors.addBatch(b, "vec_id", "v", idx, batchId,
        bits = 8, minCosine = 0.999, bands = 4)
        .collect().map(_.getLong(0)).toSet
    val s1 = inc(docs.filter(col("vec_id") < 1000L), 1L)
    val s2 = inc(docs.filter(col("vec_id") >= 1000L), 2L)
    // identical vectors share every band, so every copy is dropped
    // deterministically (cosine exactly 1)
    assert(s2.isEmpty, s"copies must match the index: $s2")
    // batch 1 survivors: everyone not near-dup of a smaller id — with
    // well-separated vectors, all 40 survive
    assert(s1 === (0L until 40L).toSet)
    // retry idempotence
    assert(inc(docs.filter(col("vec_id") < 1000L), 1L) === s1)
  }

  test("lsh knn: bits=1 with multi-probe covers both buckets and equals brute force") {
    // one hyperplane + Hamming-1 probing means every query scans the
    // whole corpus — the graceful-degradation anchor for the LSH path,
    // like nprobe=nlist for IVF
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 7 + j * 3))))
    val df = vecs.toDF("vec_id", "v")
    val corpus = df.select(col("vec_id"), col("v").as("c_vec"))
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("v").as("q_vec"))
    def keyOf(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .collect().map(keyOf).toSet
    val lsh = Vectors.lshKnn(queries, corpus, dim = 8, bits = 1, k = 5)
      .collect().map(keyOf).toSet
    assert(lsh === brute)
  }

  test("sampled ivf quantizer: deterministic across runs, nprobe=nlist stays exact") {
    // corpus large enough to trigger the bounded-sample path (256*nlist=1024)
    val vecs = (0 until 1500).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.cos(i * 3 + j).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val corpus = df.select(col("vec_id"), Vectors.toDouble(col("embedding")).as("c_vec"))
    val queries = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("q_vec"))
    def keyOf(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val run1 = Vectors.ivfKnn(queries, corpus, nlist = 4, nprobe = 2, k = 4)
      .collect().map(keyOf).toSet
    val run2 = Vectors.ivfKnn(queries, corpus, nlist = 4, nprobe = 2, k = 4)
      .collect().map(keyOf).toSet
    assert(run1 === run2, "sample-trained quantizer must be seed-deterministic")
    val brute = Vectors.bruteForceKnn(queries, corpus, k = 4).collect().map(keyOf).toSet
    val ivfAll = Vectors.ivfKnn(queries, corpus, nlist = 4, nprobe = 4, k = 4)
      .collect().map(keyOf).toSet
    assert(ivfAll === brute)
  }

  test("ann recall@10 at production-ish parameters stays above pinned floors") {
    // Second-scale pin (sf0.01, 500 real 64-dim vectors): the degenerate
    // nprobe=nlist ≡ brute pin above proves correctness, this one proves
    // QUALITY at parameters shaped like production (many cells, few
    // probed; multi-band LSH). A quantizer or banding change that
    // silently degrades ANN recall fails here before any driver artifact
    // moves. Everything is seeded/deterministic, so the floors are exact
    // reproducible measurements with headroom, not flaky estimates.
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("c_vec"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("c_vec").as("q_vec"))
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = keys(Vectors.bruteForceKnnHeap(queries, emb, k = 10))
    val ivf = keys(Vectors.ivfKnn(queries, emb, nlist = 64, nprobe = 4, k = 10))
    val lsh = keys(Vectors.lshKnn(queries, emb, dim = 64, bits = 6, k = 10,
      tables = 6))
    val ivfRecall = brute.intersect(ivf).size.toDouble / brute.size
    val lshRecall = brute.intersect(lsh).size.toDouble / brute.size
    assert(ivfRecall >= 0.45, s"ivf recall@10 degraded: $ivfRecall")
    assert(lshRecall >= 0.60, s"lsh recall@10 degraded: $lshRecall")
  }

  test("misra-gries sketch: exact under capacity, error-bounded over it") {
    import graft.text.HeavyHitters
    // zipf-ish planted stream: token "t<i>" appears (50 - i) times
    val stream = (0 until 40).flatMap(i => Seq.fill(50 - i)(s"t$i"))
    val n = stream.length.toLong
    val ds = spark.createDataset(scala.util.Random.shuffle(stream))
      .repartition(8) // partial sketches on every path: reduce AND merge
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // capacity >= distinct: every count exact (the oracle-anchor mode)
    val full = ds.select(HeavyHitters.sketch(64)).collect()(0).toMap
    assert(full === exact)

    // capacity 8: every reported count is an underestimate within
    // N/(m+1), and every item with true count > N/(m+1) is reported
    val m = 8
    val small = ds.select(HeavyHitters.sketch(m)).collect()(0).toMap
    val bound = n / (m + 1)
    small.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overestimated: $c > ${exact(t)}")
      assert(exact(t) - c <= bound, s"$t off by ${exact(t) - c} > $bound")
    }
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(small.contains(t), s"guaranteed heavy hitter $t missing"))
  }

  test("topTokenRatio: matches hand counts and handles a 100k-token document") {
    val df = Seq(
      (1L, "a b a c a"),        // 'a' 3 of 5
      (2L, "x y z"),            // all distinct: 1 of 3
      (3L, "t t t t"))          // single token: 4 of 4
      .toDF("id", "text")
      .select(col("id"), TextFunctions.wsTokens(col("text")).as("toks"))
      .select(col("id"), TextFunctions.topTokenRatio(col("toks")).as("r"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.6) < 1e-12)
    assert(math.abs(got(2L) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(3L) - 1.0) < 1e-12)
    // 100k tokens over a 1000-token vocabulary: the naive distinct×filter
    // form is ~10⁸ lambda evaluations for this one row; the sorted-run
    // form must return the exact ratio (100/100000) in bounded time
    val big = (0 until 100000).map(i => s"tok${i % 1000}").mkString(" ")
    val r = Seq((1L, big)).toDF("id", "text")
      .select(TextFunctions.topTokenRatio(TextFunctions.wsTokens(col("text"))).as("r"))
      .collect()(0).getDouble(0)
    assert(math.abs(r - 0.001) < 1e-12)
  }
}
