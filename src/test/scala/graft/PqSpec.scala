package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.{Pq, Vectors}

/** Product-quantization ANN: the codebook is deterministic, encode is
  * exact on pivot vectors, a full-corpus shortlist degrades to brute
  * force exactly (the PQ analogue of nprobe=nlist ≡ brute), and recall
  * at the shipped parameters clears its floor on the small corpus. */
class PqSpec extends SparkSuite {

  private lazy val corpus: DataFrame =
    Tables.load(spark, sfDir, "embeddings").select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("c_vec"))

  private lazy val queries: DataFrame =
    Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        Vectors.toDouble(col("embedding")).as("q_vec"))

  test("pivot codebook is deterministic and correctly shaped") {
    val cb1 = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    val cb2 = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    assert(cb1 === cb2, "codebook must be reproducible")
    assert(cb1.length === 16 && cb1.forall(_.length === 32) &&
      cb1.forall(_.forall(_.length === 4)))
  }

  test("encode is deterministic and codes are in range") {
    val cb = Pq.pivotCodebook(corpus, m = 8, ks = 16)
    val codes = Pq.encode(corpus, cb)
    val rows = codes.collect()
    assert(rows.length === corpus.count())
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === 8)
      assert(cs.forall(c => c >= 0 && c < 16), s"code out of range: $cs")
    }
    assert(codes.collect().sortBy(_.getLong(0)).toSeq ===
      Pq.encode(corpus, cb).collect().sortBy(_.getLong(0)).toSeq)
  }

  test("a pivot vector encodes to zero ADC distance against itself") {
    val cb = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    // the lexicographically-smallest-md5 pivot is a corpus vector whose
    // every sub-vector IS a codeword, so its own distance table hits
    // zero at its own codes — its ADC self-distance must be exactly 0
    val pivotId = corpus
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .select(col("vec_id")).head().getLong(0)
    val pivotQ = corpus.filter(col("vec_id") === pivotId)
      .select(col("vec_id").as("q_id"), col("c_vec").as("q_vec"))
    val codes = Pq.encode(corpus.filter(col("vec_id") === pivotId), cb)
    val dtab = Pq.distanceTables(pivotQ, cb)
    val adc = codes.crossJoin(dtab.select(col("q_id"), col("dtab")))
      .select(aggregate(sequence(lit(0), lit(15)), lit(0.0),
        (acc, mi) => acc + element_at(element_at(col("dtab"), mi + 1),
          element_at(col("codes"), mi + 1) + 1)).as("d"))
      .head().getDouble(0)
    assert(adc === 0.0)
  }

  test("full-corpus shortlist degrades to exact brute force") {
    val n = corpus.count().toInt
    val cb = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    val pq = Pq.pqKnn(queries, corpus, cb, k = 5, shortlist = n)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(pq === brute,
      "re-ranking the whole corpus must reproduce brute force exactly")
  }

  test("sq8: codes in range, pure-map encode, full shortlist ≡ brute force") {
    import graft.similarity.Sq
    val (lo, hi) = Sq.fitRange(corpus)
    assert(lo.length == hi.length && lo.zip(hi).forall { case (l, h) => l <= h })
    val codes = Sq.encode(corpus, lo, hi)
    assert(!codes.queryExecution.executedPlan.toString.contains("Exchange"),
      "SQ8 encode must be a pure map over the scan")
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0, "codes must stay in 0..255")
    val n = corpus.count().toInt
    val sq = Sq.sqKnn(queries, corpus, lo, hi, k = 5, shortlist = n)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(sq === brute,
      "re-ranking the whole corpus must reproduce brute force exactly")
  }

  test("sq8 native kernels are bit-identical to the HOF reference forms") {
    import graft.similarity.Sq
    import graft.functions.SqKernels
    val (lo, hi) = Sq.fitRange(corpus)
    val both = corpus.select(col("vec_id"),
        SqKernels.encodeCol(col("c_vec"), lo, hi).as("k"),
        Sq.codesExprHof(col("c_vec"), lo, hi).as("h"))
      .filter(not(col("k") === col("h")))
    assert(both.isEmpty, "kernel encode must equal the HOF encode per vector")
    val qv = queries.select(col("q_id"), col("q_vec"))
    val d = Sq.encode(corpus, lo, hi).crossJoin(broadcast(qv))
      .select(SqKernels.distCol(col("q_vec"), col("codes"), lo, hi).as("k"),
        Sq.distExprHof(col("q_vec"), col("codes"), lo, hi).as("h"))
      .filter(not(col("k") === col("h")))
    assert(d.isEmpty, "kernel distance must equal the HOF distance per pair")
  }

  test("ivf-sq8: probe-bounded candidates; full probe + shortlist ≡ brute force") {
    import graft.similarity.Sq
    val (assigned, centroids) = Vectors.pivotFit(corpus, nlist = 4)
    val res = Sq.residuals(assigned, centroids).localCheckpoint(eager = true)
    val (lo, hi) = Sq.fitResidualRange(res)
    // nprobe == nlist and an uncapped shortlist degrade to brute force
    val n = corpus.count().toInt
    val all = Sq.ivfSqKnn(queries, corpus, res, centroids, lo, hi,
        nprobe = 4, k = 5, shortlist = n)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(all === brute,
      "probing every cell and re-ranking everything must reproduce brute force")
  }

  test("sq8 recall@5 at the shipped shortlist is near-exact on the small corpus") {
    import graft.similarity.Sq
    val (lo, hi) = Sq.fitRange(corpus)
    val sq = Sq.sqKnn(queries, corpus, lo, hi, k = 5, shortlist = 128)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (sq & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"SQ8 distortion is small; recall@5 was $recall")
  }

  test("native encode kernel is bit-identical to the HOF reference form") {
    val cb = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    val native = Pq.encode(corpus, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).sortBy(_._1).toSeq
    val hof = Pq.encodeHof(corpus, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).sortBy(_._1).toSeq
    assert(native === hof)
  }

  test("native ADC kernel is bit-identical to the HOF fold") {
    val cb = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    val codes = Pq.encode(corpus, cb)
    val dtabs = Pq.distanceTables(queries, cb).select(col("q_id"), col("dtab"))
    val both = codes.crossJoin(broadcast(dtabs))
      .withColumn("native", graft.functions.PqKernels.adcCol(col("codes"), col("dtab")))
      .withColumn("hof", Pq.adcDistanceHof(col("codes"), col("dtab"), m = 16))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
  }

  test("IVF-PQ with nprobe = nlist degrades to plain PQ exactly") {
    val cb = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    val (assigned, centroids) = Vectors.pivotFit(corpus, nlist = 8)
    val ivfpq = Pq.ivfPqKnn(queries, corpus, cb, assigned, centroids,
        nprobe = 8, k = 5, shortlist = 64)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    val pq = Pq.pqKnn(queries, corpus, cb, k = 5, shortlist = 64)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(ivfpq === pq,
      "probing every cell must reproduce the unpruned PQ result exactly")
  }

  test("residual IVF-PQ with nprobe = nlist and full shortlist is exact brute force") {
    val n = corpus.count().toInt
    val (assigned, centroids) = Vectors.pivotFit(corpus, nlist = 8)
    val cb = Pq.residualCodebook(assigned, centroids, m = 16, ks = 32)
    val rivfpq = Pq.ivfPqResidualKnn(queries, corpus, cb, assigned, centroids,
        nprobe = 8, k = 5, shortlist = n)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(rivfpq === brute,
      "probing every cell and re-ranking the whole corpus must be exact")
  }

  test("residual codebook is deterministic and the pipeline is reproducible") {
    val (assigned, centroids) = Vectors.pivotFit(corpus, nlist = 16)
    val cb1 = Pq.residualCodebook(assigned, centroids, m = 16, ks = 32)
    val cb2 = Pq.residualCodebook(assigned, centroids, m = 16, ks = 32)
    assert(cb1 === cb2)
    val run = () => Pq.ivfPqResidualKnn(queries, corpus, cb1, assigned, centroids,
        nprobe = 4, k = 5, shortlist = 64)
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(run() === run())
  }

  test("trained-quantizer residual IVF-PQ recall beats the raw-pivot variant") {
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: DataFrame): Double =
      brute.intersect(df.select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet).size.toDouble / brute.size
    // raw pivots, raw-vector codebook — the sim_knn_ivfpq shape
    val (pAsg, pCent) = Vectors.pivotFit(corpus, nlist = 16)
    val raw = recallOf(Pq.ivfPqKnn(queries, corpus,
      Pq.pivotCodebook(corpus, m = 16, ks = 32), pAsg, pCent,
      nprobe = 8, k = 5, shortlist = 128))
    // trained cells, residual codebook — the sim_knn_ivfpq_r shape
    val (_, cent) = graft.similarity.Kmeans.fitAnchor(corpus, k = 16, iters = 2)
    import spark.implicits._
    val centroids = cent.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "centroid")
    val assigned = graft.similarity.Kmeans.assign(corpus, cent)
      .select(col("vec_id"), col("c_vec"), col("cell"))
    val resCb = Pq.residualCodebook(assigned, centroids, m = 16, ks = 32)
    val res = recallOf(Pq.ivfPqResidualKnn(queries, corpus, resCb, assigned, centroids,
      nprobe = 8, k = 5, shortlist = 128))
    info(s"recall@5 raw-pivot ivfpq $raw, trained residual ivfpq $res")
    assert(res >= raw,
      s"trained residual recall $res must not trail the raw-pivot variant's $raw")
    assert(res >= 0.70, s"residual recall $res below floor 0.70")
  }

  test("recall@5 at shipped parameters clears the floor") {
    val cb = Pq.pivotCodebook(corpus, m = 16, ks = 32)
    val pq = Pq.pqKnn(queries, corpus, cb, k = 5, shortlist = 128)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Vectors.bruteForceKnnHeap(queries, corpus, k = 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.85, s"recall@5 $recall below floor 0.85")
  }
}
