package graft

import org.apache.spark.sql.functions._

import graft.dedup.SemDedup
import graft.similarity.Kmeans
import graft.text.{Dsir, Retrieval}

/** Round-12 training-data selection operators: SemDeDup within-cell
  * pruning, BM25 retrieval, DSIR importance weights. */
class SelectionSpec extends SparkSuite {
  import spark.implicits._

  test("semdedup prunes the higher id of a within-cell near-dup, keeps cross-cell") {
    // cells planted directly: 1≈2 in cell 0 (prune 2), 3 alone in cell 0,
    // 4≈5 but in DIFFERENT cells (both survive — the SemDeDup contract is
    // within-cell only)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.001, 0.0)),   // cosine ≈ 1 with id 1
      (3L, Seq(0.0, 1.0, 0.0)),     // orthogonal — survives
      (4L, Seq(0.0, 0.0, 1.0)),
      (5L, Seq(0.0, 0.0011, 1.0))   // cosine ≈ 1 with id 4, other cell
    ).toDF("vec_id", "c_vec")
    val cells = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 2))
      .toDF("vec_id", "cell")
    val got = SemDedup.survivors(vecs, cells, tau = 0.97)
      .collect().map(r => r.getLong(0)).sorted
    assert(got === Array(1L, 3L, 4L, 5L))
  }

  test("semdedup over a kmeans-anchor fit drops planted perturbed copies") {
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => element_at(col("c_vec"), i) + lit(0.02) * (i % 3).cast("double")).as("c_vec"))
    val all = base.unionByName(planted)
    val (asg, _) = Kmeans.fitAnchor(all, k = 4, iters = 1)
    val surv = SemDedup.survivors(all, asg, tau = 0.97)
      .collect().map(_.getLong(0)).toSet
    val plantsDropped = (0L until 20L).count(i => !surv.contains(i + 100000L))
    // a plant survives only if the fit split it from its original's cell;
    // with k=4 over 520 vectors that is rare — require most to be caught,
    // and every original must survive (plants carry the higher id)
    assert(plantsDropped >= 15, s"only $plantsDropped/20 plants pruned")
    assert((0L until 20L).forall(surv.contains))
  }

  test("incremental semdedup ≡ the global pass under id-ascending batches") {
    import graft.dedup.SemDedupIncremental
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => element_at(col("c_vec"), i) + lit(0.02) * (i % 3).cast("double")).as("c_vec"))
    val all = base.unionByName(planted).localCheckpoint(eager = true)
    val (asg, cent) = Kmeans.fitAnchor(all, k = 6, iters = 1)
    val global = SemDedup.survivors(all, asg, tau = 0.97)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    val idx = java.nio.file.Files.createTempDirectory("semdedup_inc").toString
    // three id-ascending batches with an uneven middle cut
    val cuts = Seq(0L, 150L, 100000L, Long.MaxValue)
    val got = (0 until 3).flatMap { i =>
      SemDedupIncremental.addBatch(
        all.filter(col("vec_id") >= cuts(i) && col("vec_id") < cuts(i + 1)),
        cent, tau = 0.97, idx, batchId = i + 1L)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
    }.toSet
    assert(got === global)

    // idempotent retry: re-running the LAST batch must reproduce its
    // survivors exactly (the read excludes the batch's own partition)
    val retry = SemDedupIncremental.addBatch(
      all.filter(col("vec_id") >= cuts(2)), cent, tau = 0.97, idx, batchId = 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val lastBatch = got.filter(_._1 >= cuts(2))
    assert(retry === lastBatch)

    // centroid-swap guard: different centroids against the same index
    // must be rejected by the params sidecar
    val swapped = cent.map(_.map(_ + 1.0))
    val e = intercept[IllegalArgumentException] {
      SemDedupIncremental.addBatch(all.limit(1), swapped, tau = 0.97, idx, batchId = 4L)
    }
    assert(e.getMessage.contains("was built with"))
  }

  test("incremental semdedup rejects out-of-order ingest") {
    import graft.dedup.SemDedupIncremental
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val (_, cent) = Kmeans.fitAnchor(base, k = 4, iters = 1)
    val idx = java.nio.file.Files.createTempDirectory("semdedup_ooo").toString
    SemDedupIncremental.addBatch(base.filter(col("vec_id") >= 10), cent,
      tau = 0.97, idx, batchId = 1L)
    // a later batch whose ids sit BELOW the committed max must fail
    // loudly — it could never retract an already-emitted survivor
    val e = intercept[IllegalArgumentException] {
      SemDedupIncremental.addBatch(base.filter(col("vec_id") < 10), cent,
        tau = 0.97, idx, batchId = 2L)
    }
    assert(e.getMessage.contains("out-of-order"))
    // a retry of the CURRENT batch is exempt (its own sidecar is excluded)
    SemDedupIncremental.addBatch(base.filter(col("vec_id") >= 10), cent,
      tau = 0.97, idx, batchId = 1L)
  }

  test("semdedup SRP prefilter: banded candidates cover every tau-pair, prune the rest") {
    import graft.functions.SrpBands
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => element_at(col("c_vec"), i) + lit(0.02) * (i % 3).cast("double")).as("c_vec"))
    val all = base.unionByName(planted).localCheckpoint(eager = true)
    val (_, cent) = Kmeans.fitAnchor(all, k = 6, iters = 1)
    val asg = Kmeans.assign(all, cent)
      .select(col("vec_id"), col("cell"), col("c_vec"))
      .localCheckpoint(eager = true)
    // ground truth: the FULL quadratic within-cell tau-pair set
    val a = asg.select(col("cell"), col("vec_id").as("ia"), col("c_vec").as("va"))
    val b = asg.select(col("cell"), col("vec_id").as("ib"), col("c_vec").as("vb"))
    val tauPairs = a.join(b, Seq("cell")).filter(col("ia") < col("ib"))
      .filter(round(graft.similarity.Vectors.cosine(col("va"), col("vb")), 6) >= 0.97)
      .select(col("ia"), col("ib"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tauPairs.nonEmpty, "fixture must contain within-cell tau-pairs")
    // the prefilter's candidate set at the shipped (12, 16, seed 42)
    val sig = asg.withColumn("bands", SrpBands(col("c_vec"), 12, 16, 42L))
      .select(col("vec_id"), col("cell"), posexplode(col("bands")))
      .select(col("vec_id"), col("cell"), col("pos"), col("col").as("sig"))
    val cand = sig.join(
        sig.select(col("vec_id").as("ib"), col("cell"), col("pos"), col("sig")),
        Seq("cell", "pos", "sig"))
      .filter(col("vec_id") < col("ib"))
      .select(col("vec_id"), col("ib")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tauPairs.subsetOf(cand),
      s"prefilter missed tau-pairs: ${tauPairs.diff(cand)}")
    // and it genuinely prunes: candidates are a strict subset of the
    // within-cell pair space the old full-cell join compared
    val cellPairs = a.join(b, Seq("cell")).filter(col("ia") < col("ib")).count()
    assert(cand.size < cellPairs,
      s"prefilter pruned nothing: ${cand.size} candidates of $cellPairs cell-pairs")
  }

  test("incremental semdedup: empty batch is a no-op; compaction folds the maxid sidecar") {
    import graft.dedup.SemDedupIncremental
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val (_, cent) = Kmeans.fitAnchor(base, k = 4, iters = 1)
    val idx = java.nio.file.Files.createTempDirectory("semdedup_cmp").toString
    // an empty micro-batch (streaming quiet interval) must not throw,
    // commit, or advance the ingest guard
    val empty = SemDedupIncremental.addBatch(base.filter(col("vec_id") < 0),
      cent, tau = 0.97, idx, batchId = 1L)
    assert(empty.count() === 0)
    val surv = (2L to 4L).flatMap { b =>
      SemDedupIncremental.addBatch(
        base.filter(col("vec_id") >= (b - 2) * 15 && col("vec_id") < (b - 1) * 15),
        cent, tau = 0.97, idx, batchId = b)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
    }.toSet
    assert(SemDedupIncremental.compactIndex(spark, idx) >= 2)
    // the per-batch maxid files folded into one consolidated file + live
    val hfs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxids = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/_maxids"))
      .map(_.getPath.getName).sorted.toSeq
    assert(maxids.length === 2 && maxids.exists(_.startsWith("batch=-")),
      s"maxids not folded: $maxids")
    // the guard still works off the folded sidecar: ingest continues
    // above the max, rejects below it
    val next = SemDedupIncremental.addBatch(
      base.filter(col("vec_id") >= 45), cent, tau = 0.97, idx, batchId = 5L)
    assert(next.count() > 0)
    val e = intercept[IllegalArgumentException] {
      SemDedupIncremental.addBatch(base.filter(col("vec_id") < 15),
        cent, tau = 0.97, idx, batchId = 6L)
    }
    assert(e.getMessage.contains("out-of-order"))
    assert(surv.nonEmpty)
  }

  test("semdedup index tracks per-cell growth for the re-fit policy") {
    import graft.dedup.SemDedupIncremental
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val (_, cent) = Kmeans.fitAnchor(base, k = 4, iters = 1)
    val idx = java.nio.file.Files.createTempDirectory("semdedup_grow").toString
    SemDedupIncremental.addBatch(base.filter(col("vec_id") < 25), cent,
      tau = 0.97, idx, batchId = 1L)
    SemDedupIncremental.addBatch(base.filter(col("vec_id") >= 25), cent,
      tau = 0.97, idx, batchId = 2L)
    val n = base.count()
    // per-cell counts accumulate across batches: total matches the corpus
    val total = SemDedupIncremental.needsRefit(spark, idx, targetCellSize = 0)
      .agg(sum(col("n"))).head().getLong(0)
    assert(total === n)
    // a generous target reports nothing; a tiny one reports the big cells
    assert(SemDedupIncremental.needsRefit(spark, idx, n).count() === 0)
    assert(SemDedupIncremental.needsRefit(spark, idx, 1).count() > 0)
  }

  test("refit epoch: survivors equal the global pass at the policy k; new index serviceable") {
    import graft.dedup.SemDedupIncremental
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.similarity.Vectors.toDouble(col("embedding")).as("c_vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => element_at(col("c_vec"), i) + lit(0.02) * (i % 3).cast("double")).as("c_vec"))
    val all = base.unionByName(planted).localCheckpoint(eager = true)
    val (_, cent) = Kmeans.fitAnchor(all, k = 4, iters = 1)
    val old = java.nio.file.Files.createTempDirectory("semdedup_refit_old").toString
    val neu = java.nio.file.Files.createTempDirectory("semdedup_refit_new").toString + "/epoch"
    SemDedupIncremental.addBatch(all.filter(col("vec_id") < 100000L), cent,
      tau = 0.97, old, batchId = 1L)
    SemDedupIncremental.addBatch(all.filter(col("vec_id") >= 100000L), cent,
      tau = 0.97, old, batchId = 2L)

    val n = all.count()
    val target = 10L
    val (surv, newCent) = SemDedupIncremental.refit(spark, old, neu,
      tau = 0.97, targetCellSize = target)
    // the policy k was honored
    assert(newCent.length === math.max(8, math.ceil(n.toDouble / target).toInt))
    // ground truth: the EXACT quadratic within-cell prune at the new fit
    // (SemDedup.survivors — no prefilter), over the vectors the index held
    val asgNew = Kmeans.assign(all, newCent).select(col("vec_id"), col("cell"))
    val want = SemDedup.survivors(all, asgNew, tau = 0.97)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(surv.collect().map(r => (r.getLong(0), r.getInt(1))).toSet === want)

    // the new epoch is pinned to the NEW centroids: the old ones reject
    val e = intercept[IllegalArgumentException] {
      SemDedupIncremental.addBatch(all.limit(1), cent, tau = 0.97, neu, batchId = 2L)
    }
    assert(e.getMessage.contains("was built with"))
    // and continues serving ingest above the epoch's max id
    val more = all.filter(col("vec_id") >= 100000L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("c_vec"))
    assert(SemDedupIncremental.addBatch(more, newCent, tau = 0.97, neu,
      batchId = 2L).count() >= 0)
    // the OLD epoch was never mutated beyond compaction: still readable,
    // still carrying every ingested vector (the crash-safe swap contract)
    val oldTotal = SemDedupIncremental.needsRefit(spark, old, targetCellSize = 0)
      .agg(sum(col("n"))).head().getLong(0)
    assert(oldTotal === n)

    // crash-retry convergence: a refit that died after writing the new
    // epoch's params but before (or mid-way through) its batch commit
    // leaves a partial directory; re-running refit must converge to the
    // same epoch (the fit is deterministic over the same index, so the
    // params sidecar re-validates and batch=1 overwrites itself)
    val hfs = new org.apache.hadoop.fs.Path(neu)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (sub <- Seq("batch=1", "batch=2", "_stats", "_maxids"))
      hfs.delete(new org.apache.hadoop.fs.Path(neu, sub), true)
    assert(hfs.exists(new org.apache.hadoop.fs.Path(neu, "_graft_params")))
    val (surv2, _) = SemDedupIncremental.refit(spark, old, neu,
      tau = 0.97, targetCellSize = target)
    assert(surv2.collect().map(r => (r.getLong(0), r.getInt(1))).toSet === want)
  }

  test("bm25 ranks the saturating term-hit doc first; scores replay by hand") {
    val docs = Seq(
      (1L, "spark spark spark spark"),       // tf 4, short
      (2L, "spark alpha beta gamma delta"),  // tf 1
      (3L, "alpha beta gamma delta epsilon") // no hit
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 matches nothing
    // hand replay: N=3, df=2, idf=ln(1+(3-2+0.5)/2.5); dl1=4, dl2=5, avgdl=14/3
    val idf = BigDecimal(math.log(1.0 + 1.5 / 2.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def s(tf: Long, dl: Long): Double = {
      val w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (14.0 / 3)))
      BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toMap === Map(1L -> s(4, 4), 2L -> s(1, 5)))
  }

  test("cross-doc spans: maximal merged interval; within-doc-only repeats excluded") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),            // shares a..j with doc 2
      (2L, "x a b c d e f g h i j y"),
      (3L, "p q r s t u v w p q r s t u v w")     // repeats only within itself
    ).toDF("doc_id", "text")
    val got = graft.dedup.SpanDedup.crossDocSpans(docs, "doc_id", "text", L = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the 10-token common run yields 3 consecutive 8-gram hits per doc,
    // merged into ONE maximal interval covering exactly the shared span;
    // doc 3's verbatim self-repeat must NOT surface (distinct-doc df = 1)
    assert(got.toSeq === Seq((1L, 1L, 10L, 3L), (2L, 2L, 10L, 3L)))
  }

  test("cross-doc spans: disjoint repeats in one doc stay separate islands") {
    val mid = (1 to 9).map(i => s"m$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b c d e f g h $mid r s t u v w x y"),
      (2L, "a b c d e f g h"),
      (3L, "r s t u v w x y")
    ).toDF("doc_id", "text")
    val got = graft.dedup.SpanDedup.crossDocSpans(docs, "doc_id", "text", L = 8)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // two 8-token spans separated by a 9-token unique middle → two islands
    assert(got.toSeq === Seq((1L, 8L), (18L, 8L)))
  }

  test("cross-doc scrub removes every occurrence; short/no-repeat docs pass through") {
    import graft.dedup.SpanDedup
    val docs = Seq(
      (1L, "a b c d e f"),   // "c d e" repeats in 2 and 5 → scrub pos 3-5
      (2L, "q r c d e s"),   // same gram at pos 3 → scrub pos 3-5
      (3L, "u v w"),         // no cross-doc repeat → untouched
      (4L, "p q"),           // shorter than L → untouched by construction
      (5L, "c d e")          // fully repeated → scrubs to the empty string
    ).toDF("doc_id", "text")
    val got = SpanDedup.scrubCrossDocSpans(docs, "doc_id", "text", L = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a b f", 6L, 3L),
      (2L, "q r s", 6L, 3L),
      (3L, "u v w", 3L, 0L),
      (4L, "p q", 2L, 0L),
      (5L, "", 3L, 3L)))
  }

  test("containment flags the embedded doc asymmetrically; jaccard would miss it") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, big),                                  // container
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")), // first half — contained
      (3L, (100 to 140).map(i => s"w$i").mkString(" ")) // disjoint
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, minC = 0.8, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.length === 1)
    val (a, b, cab, cba) = got.head
    assert((a, b) === (1L, 2L))
    assert(cba === 1.0)              // every gram of the contained doc is shared
    assert(cab < 0.5)                // the container is NOT contained in the half
    // symmetric jaccard on the same pair stays below the 0.8 bar
    assert(cab * cba / (cab + cba - cab * cba) < 0.8)
  }

  test("containment df-pruning drops boilerplate grams from candidates, not denominators") {
    // gram "x x x" appears in all 5 docs → df=5 > maxDf=2 → pruned: no
    // pair survives on boilerplate alone, but unique-gram containment
    // still scores against the FULL gram-set size
    val docs = (1L to 5L).map(i => (i, s"x x x a$i b$i c$i")).toDF("doc_id", "text")
    val none = graft.dedup.Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, minC = 0.1, maxDf = 2).collect()
    assert(none.forall(r => r.getLong(2) <= 2)) // inter never counts the df-5 gram
  }

  test("mmr re-rank: a diversity-weighted step demotes the exact twin") {
    // 11 is a scaled EXACT twin of 10 (cosine 1); with λ = 0.3 the
    // diversity term dominates and step 2 must skip the twin for the
    // near-orthogonal 12 despite 12's far lower relevance. (λ = 0.7 in
    // the query row is relevance-dominant by design — this pins the
    // greedy penalty arithmetic itself.)
    val q = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("q_id", "q_vec")
    val c = Seq(
      (10L, Seq(0.9, 0.1, 0.0)),
      (11L, Seq(1.8, 0.2, 0.0)),     // exact twin direction of 10
      (12L, Seq(0.5, 0.0, 0.866))    // diverse, less relevant
    ).toDF("vec_id", "c_vec")
    val sl = graft.similarity.Vectors.bruteForceKnn(q, c, k = 3)
      .join(c, "vec_id").select(col("vec_id"), col("score"), col("c_vec"))
    val s1 = sl.orderBy(col("score").desc, col("vec_id")).limit(1)
    val m2 = sl.join(broadcast(s1.select(col("vec_id").as("v1"), col("c_vec").as("w1"))),
        col("vec_id") =!= col("v1"))
      .withColumn("mmr", round(lit(0.3) * col("score") -
        lit(0.7) * round(graft.similarity.Vectors.cosine(col("c_vec"), col("w1")), 6), 6))
    val pick2 = m2.orderBy(col("mmr").desc, col("vec_id")).limit(1)
      .collect().head.getLong(0)
    assert(s1.collect().head.getLong(0) === 10L) // score tie with twin → lowest id
    assert(pick2 === 12L, "diversity-weighted MMR must prefer the diverse candidate")
  }

  test("literal-weight scorer ≡ batch dsir; unseen buckets take the smoothed weight") {
    val fit = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val batch = Dsir.importanceWeights(fit, "doc_id", "text",
        col("lang") === "en", buckets = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (w, unseenW) = Dsir.weightTable(fit, "doc_id", "text",
      col("lang") === "en", buckets = 128)
    val streamed = Dsir.scoreWithLiteralWeights(fit, "doc_id", "text",
        w, unseenW, buckets = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
    // a doc whose grams the fit corpus never saw scores n_grams · unseenW
    val fresh = Seq((999999L, "zzqq wwvv zzqq")).toDF("doc_id", "text")
    val got = Dsir.scoreWithLiteralWeights(fresh, "doc_id", "text",
        Map.empty[Long, Double], unseenW, buckets = 128)
      .collect().head
    val expect = BigDecimal(2 * unseenW)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) === 2L && got.getDouble(2) === expect)
  }

  test("dsir weights target-like docs above off-target docs") {
    // target slice speaks {aa bb}, off-target speaks {zz yy}; a fresh raw
    // doc in target vocabulary must outweigh one in off-target vocabulary
    val docs = Seq(
      (1L, "aa bb aa bb aa bb", "en"),
      (2L, "aa bb aa bb", "en"),
      (3L, "zz yy zz yy zz yy", "fr"),
      (4L, "aa bb aa bb aa", "de"),   // raw-only, target-shaped
      (5L, "zz yy zz yy zz", "de")    // raw-only, off-target-shaped
    ).toDF("doc_id", "text", "lang")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(4L) > w(5L))
    assert(w(1L) > w(3L))
  }

  test("mixture weights: normalized, temperature-compressed toward uniform") {
    val rows = graft.qsets.CurationQueries.queries("tx_mix_weights")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    val wsum = rows.map(_._4).sum
    assert(math.abs(wsum - 1.0) < 1e-6, s"weights sum to $wsum")
    // α = 0.5 compresses toward uniform: every below-average source is
    // UP-weighted (weight > share), every above-average one down-weighted
    rows.foreach { case (src, _, share, weight, _) =>
      val mean = 1.0 / rows.length
      if (share < mean - 1e-9) assert(weight > share, s"$src not up-weighted")
      if (share > mean + 1e-9) assert(weight < share, s"$src not down-weighted")
    }
    // epochs is the weight'd budget over the source's own tokens
    rows.foreach { case (src, n, _, w, e) =>
      assert(math.abs(e - w * 1000000.0 / n) < 1e-4, s"$src epochs off")
    }
  }

  test("cluster-balanced sample: at most 3 per cell, every cell covered") {
    val got = graft.qsets.SimilarityQueries.queries("samp_cluster_balanced")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val perCell = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 3))
    assert(perCell.keySet.size >= 2, "fit should produce multiple cells")
    // ranks are 1..n within each cell
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("bpe fit replays by hand: freq-weighted pair picks, greedy merges, ties") {
    val docs = Seq((1L, "low low low lower"), (2L, "newest newest"))
      .toDF("doc_id", "text")
    val got = graft.text.Bpe.fitMerges(docs, "text", rounds = 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: l-o and o-w tie at 4 → lex order picks (l,o); round 2 the
    // merged `lo` re-pairs with w at 4; round 3 is a 5-way tie at 2 won
    // by (e,s) on (lhs, rhs) order
    assert(got.toSeq === Seq((1, "l", "o", 4L), (2, "lo", "w", 4L), (3, "e", "s", 2L)))
  }

  test("bpe token counts replay by hand under the fitted merges") {
    val docs = Seq((1L, "low low low lower", "a"), (2L, "newest newest", "a"))
      .toDF("doc_id", "text", "source")
    val got = graft.text.Bpe.tokenCounts(docs, "text", "source", rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // merges (l,o),(lo,w),(e,s): low → 1 symbol, lower → low|e|r = 3,
    // newest → n|e|w|es|t = 5. ws = 3+1+2 = 6, bpe = 3·1 + 3 + 2·5 = 16
    assert(got.toSeq === Seq(("a", 6L, 16L, 2.666667)))
  }

  test("bpe fit exhausts gracefully when the vocab runs out of pairs") {
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val got = graft.text.Bpe.fitMerges(docs, "text", rounds = 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // merge 1 collapses aa; merge 2 takes the leftover (a,b); round 3
    // finds no adjacent pair and emits nothing
    assert(got.toSeq === Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
  }

  test("bpe token counts survive merge exhaustion with the repr intact") {
    // rounds=3 but the vocab exhausts after 2 merges — the apply side
    // must keep the last representation (NOT annihilate it), so every
    // source still gets its row
    val docs = Seq((1L, "aa ab aa", "a")).toDF("doc_id", "text", "source")
    val got = graft.text.Bpe.tokenCounts(docs, "text", "source", rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // merges (a,a),(a,b) fully collapse both words → 1 symbol each
    assert(got.toSeq === Seq(("a", 3L, 3L, 1.0)))
  }

  test("bpe merge application is symbol-boundary exact") {
    // rule (o,w) must not fire on [b, lo, w] even though "ow" is a
    // substring of the joined form; corpus engineered so round 1 merges
    // (l,o) and round 2 merges (o,w) — "blow" must stay b|lo|w, i.e. it
    // keeps 3 symbols, not collapse to b|low
    val docs = Seq(
      (1L, "lo lo lo lo lo blow", "a"),
      (2L, "ow ow ow", "a")).toDF("doc_id", "text", "source")
    val merges = graft.text.Bpe.fitMerges(docs, "text", rounds = 2)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq === Seq((1, "l", "o"), (2, "o", "w")))
    val counts = graft.text.Bpe.tokenCounts(docs, "text", "source", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // lo×5 → 1 sym each (5), blow → b|lo|w (3), ow×3 → 1 sym each (3)
    assert(counts.toSeq === Seq(("a", 9L, 11L)))
  }

  test("dsir resampling: key is the log-space ES race over exp(weight)") {
    val rows = graft.qsets.TextQueries.queries("samp_dsir_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 100)
    // keys ascend (it is a bottom-k race) and replay by hand from the id
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    rows.take(5).foreach { case (id, wgt, key) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 1152921504606846976.0
      val expect = BigDecimal(math.log(-math.log(u)) - wgt)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(key - expect) < 1e-9, s"doc $id key $key != $expect")
    }
  }

  test("phrase search replays against a scala scan of the same corpus") {
    val got = graft.qsets.TextQueries.queries("tx_phrase_search")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val t = r.getString(1).trim.split("\\s+")
        val pos = (0 to t.length - 2).filter(i => t(i) == "batch" && t(i + 1) == "table")
        if (pos.isEmpty) None
        else Some((r.getLong(0), pos.length.toLong, pos.head.toLong + 1)) // 1-based
      }.sortBy(_._1).toSeq
    assert(expect.nonEmpty, "fixture should contain the phrase")
    assert(got === expect)
  }

  test("snapshot diff: removed beats changed, adds carry new ids, sames absent") {
    val st = graft.qsets.CurationQueries.queries("dd_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 13 == 0) assert(st.get(id).contains("removed"), s"$id")
      else if (id % 10 == 0) assert(st.get(id).contains("changed"), s"$id")
      else assert(!st.contains(id), s"$id should be unchanged")
    }
    ids.filter(_ < 50).foreach(id => assert(st.get(id + 1000000L).contains("added")))
    assert(st.values.toSet === Set("removed", "changed", "added"))
  }

  test("distinct-ngram diversity: totals shrink and ratios grow with n") {
    val rows = graft.qsets.CurationQueries.queries("tx_distinct_ngrams")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val sources = rows.keySet.map(_._1)
    assert(sources.nonEmpty)
    sources.foreach { s =>
      val (t1, d1) = rows((s, 1)); val (t3, d3) = rows((s, 3))
      assert(t1 >= t3, s"$s: gram totals must shrink with n")
      // longer grams are more distinctive
      assert(d3.toDouble / t3 >= d1.toDouble / t1, s"$s: trigram ratio below unigram")
    }
  }
}
