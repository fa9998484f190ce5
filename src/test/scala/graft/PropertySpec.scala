package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Codec, Hashing, Molecules}

/** Property tests for the canonicalization / hash / codec edges
  * (SURVEY §5: generated round-trips complement the pinned fixtures —
  * fixtures catch drift, generated cases catch edges). Plain ScalaCheck
  * generators sampled with deterministic seeds inside ScalaTest (the
  * scalatest-scalacheck bridge artifact is not in the offline cache). */
class PropertySpec extends SparkSuite {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val element: Gen[String] =
    Gen.oneOf("C", "H", "O", "N", "S", "Cl", "Na", "Fe")

  test("hill formula is invariant under symbol permutation") {
    val cases = samples(
      for {
        syms <- Gen.nonEmptyListOf(element)
        seed <- Gen.long
      } yield (syms, new scala.util.Random(seed).shuffle(syms)), 40)
    val df = cases.toDF("a", "b")
      .select(Molecules.hillFormula(col("a")).as("fa"),
        Molecules.hillFormula(col("b")).as("fb"))
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("reshape3 then flatten3 is the identity on 3N-length geometries") {
    val geoms = samples(
      Gen.chooseNum(1, 12).flatMap(n =>
        Gen.listOfN(3 * n, Gen.chooseNum(-100.0, 100.0))), 40)
    val df = geoms.map(Tuple1(_)).toDF("g")
      .select((Molecules.flatten3(Molecules.reshape3(col("g"))) === col("g")).as("ok"),
        (size(Molecules.reshape3(col("g"))) === size(col("g")) / 3).as("n_ok"))
    df.collect().foreach { r =>
      assert(r.getBoolean(0)); assert(r.getBoolean(1))
    }
  }

  test("zstd codec round-trips arbitrary unicode strings") {
    val texts = samples(Gen.asciiPrintableStr, 60) ++
      samples(Gen.listOf(Gen.oneOf("ü", "→", "文", "\n", "\"", "\\", "🎉", "a"))
        .map(_.mkString), 60)
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .select(col("text"),
        Codec.zstdDecompressToString(Codec.zstdCompress(col("text"))).as("back"))
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("msgpack round-trips generated nested values") {
    import graft.sources.Msgpack
    import graft.sources.Msgpack.MsgMap
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.const(null),
      Gen.oneOf(true, false),
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, 127L, 128L, 255L, 256L, 65535L, 65536L,
        -32L, -33L, -128L, -129L, 4294967295L, 4294967296L),
      Gen.chooseNum(-1e12, 1e12),
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("ü", "文", "🎉", "\n", "\"", "x")).map(_.mkString))
    def value(depth: Int): Gen[Any] =
      if (depth == 0) scalar
      else Gen.frequency(
        5 -> scalar,
        2 -> Gen.listOfN(3, value(depth - 1)).map(_.toVector),
        2 -> Gen.listOfN(3,
          for { k <- Gen.alphaNumStr; v <- value(depth - 1) } yield k -> v)
          .map(es => MsgMap(es.toVector)))
    samples(value(3), 120).foreach { v =>
      assert(Msgpack.unpack(Msgpack.pack(v)) === v, s"round-trip broke on $v")
    }
  }

  test("hashed shingles agree with a reference set implementation on generated texts") {
    import graft.functions.HashedShingles
    def refShingles(text: String, n: Int): Set[Seq[String]] = {
      val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
      if (toks.length < n) Set.empty else toks.sliding(n).map(_.toSeq).toSet
    }
    // tiny vocabulary + varied \s separators: forces repeated shingles
    // (the distinct path) and exercises every whitespace byte
    val word = Gen.oneOf("aa", "bb", "cc", "d", "ee")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", "", "\f", "\r", " \t ")
    val text: Gen[String] = for {
      ws <- Gen.listOfN(12, word)
      ss <- Gen.listOfN(12, sep)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString
    val texts = samples(text, 60)
    val hashed = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), HashedShingles(col("text"), 2).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // distinct-count parity with the reference set semantics
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(hashed(i.toLong).length === refShingles(t, 2).size,
        s"count mismatch on ${t.replace("\n", "\\n")}")
    }
    // equal reference sets <=> equal hash arrays (sorted canonical form)
    for ((t1, i1) <- texts.zipWithIndex; (t2, i2) <- texts.zipWithIndex if i1 < i2) {
      val same = refShingles(t1, 2) == refShingles(t2, 2)
      assert((hashed(i1.toLong) == hashed(i2.toLong)) === same)
    }
  }

  test("canonical hash: deterministic, field order significant, no boundary collisions") {
    val pairs = samples(
      for { a <- Gen.alphaNumStr; b <- Gen.alphaNumStr if a != b } yield (a, b), 60)
    val df = pairs.toDF("a", "b").select(
      (Hashing.canonicalHash256(col("a"), col("b")) ===
        Hashing.canonicalHash256(col("a"), col("b"))).as("stable"),
      (Hashing.canonicalHash256(col("a"), col("b")) =!=
        Hashing.canonicalHash256(col("b"), col("a"))).as("order_matters"))
    df.collect().foreach { r =>
      assert(r.getBoolean(0)); assert(r.getBoolean(1))
    }
    // ("ab","c") vs ("a","bc"): the separator must prevent boundary shifts
    val bd = Seq(("ab", "c", "a", "bc")).toDF("a1", "b1", "a2", "b2").select(
      (Hashing.canonicalHash256(col("a1"), col("b1")) =!=
        Hashing.canonicalHash256(col("a2"), col("b2"))).as("ok"))
    assert(bd.collect()(0).getBoolean(0))
  }

  test("hash sample: threshold monotone (subset), rate tracks the threshold") {
    import graft.operators.Sampling
    val texts = samples(Gen.nonEmptyListOf(Gen.alphaNumStr).map(_.mkString(" ")), 400)
      .distinct
    val df = texts.map(Tuple1(_)).toDF("text").cache()
    val n = df.count().toDouble
    val kept = Seq("2", "8", "c").map { th =>
      df.filter(Sampling.hashSample(col("text"), th))
        .collect().map(_.getString(0)).toSet
    }
    // monotone: a lower threshold's subset is contained in a higher one's
    assert(kept(0).subsetOf(kept(1)) && kept(1).subsetOf(kept(2)))
    // rate roughly tracks threshold/16 (1 hex digit) — loose bounds, the
    // point is "samples, not everything/nothing"
    assert(kept(0).size < n * 0.35 && kept(2).size > n * 0.4)
    df.unpersist()
  }

  test("quota mix: per-domain cap respected, output is a subset, deterministic") {
    import graft.operators.Sampling
    val rows = samples(
      for {
        id <- Gen.chooseNum(0L, 5000L)
        dom <- Gen.oneOf("a", "b", "c", "d")
      } yield (id, dom), 300).distinct
    val df = rows.toDF("id", "dom")
    val quota = Map("a" -> 7, "b" -> 1)
    val out1 = Sampling.quotaMix(df, col("dom"), col("id"), quota, defaultQuota = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val out2 = Sampling.quotaMix(df.repartition(5), col("dom"), col("id"), quota,
        defaultQuota = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out1 === out2, "quota mix must not depend on physical layout")
    assert(out1.subsetOf(rows.toSet))
    val byDom = out1.groupBy(_._2).view.mapValues(_.size).toMap
    byDom.foreach { case (d, cnt) =>
      assert(cnt <= quota.getOrElse(d, 4), s"domain $d over quota: $cnt")
    }
    // first-N by id: the kept ids per domain are the smallest ids
    val inByDom = rows.groupBy(_._2)
    out1.groupBy(_._2).foreach { case (d, kept) =>
      val expect = inByDom(d).map(_._1).sorted.take(quota.getOrElse(d, 4)).toSet
      assert(kept.map(_._1) === expect, s"domain $d must keep the first N by id")
    }
  }

  test("weighted sample: per-domain keep sets are threshold-monotone slices of hashSample") {
    import graft.operators.Sampling
    val texts = samples(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString), 120)
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, s"d${i % 3}")
    }
    val df = rows.toDF("id", "text", "dom")
    val rates = Map("d0" -> "c0", "d1" -> "40")
    val kept = df.filter(Sampling.weightedSample(col("text"), col("dom"),
        rates, defaultHex = "20"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // per domain, the kept set must equal hashSample at that domain's
    // threshold (the weighted form is a CASE over the same hash)
    rows.groupBy(_._3).foreach { case (d, in) =>
      val thr = rates.getOrElse(d, "20")
      val expect = df.filter(col("dom") === d)
        .filter(Sampling.hashSample(col("text"), thr))
        .collect().map(_.getLong(0)).toSet
      assert(kept.filter(_._2 == d).map(_._1) === expect,
        s"domain $d must keep exactly its hashSample($thr) slice")
    }
    // monotone: lower-rate domains keep subsets of what a higher rate keeps
    val lo = df.filter(Sampling.weightedSample(col("text"), col("dom"),
        Map.empty, defaultHex = "20")).collect().map(_.getLong(0)).toSet
    val hi = df.filter(Sampling.weightedSample(col("text"), col("dom"),
        Map.empty, defaultHex = "c0")).collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "raising every rate must only add rows")
  }

  test("misra-gries sketch: generated streams stay within the error bound under any layout") {
    import graft.text.HeavyHitters
    // skewed random streams: a few heavy items + a tail
    val streams = samples(
      for {
        nHeavy <- Gen.chooseNum(1, 4)
        heavyReps <- Gen.chooseNum(30, 60)
        tail <- Gen.listOfN(80, Gen.chooseNum(0, 30).map(i => s"t$i"))
      } yield (0 until nHeavy).flatMap(h => Seq.fill(heavyReps)(s"H$h")) ++ tail, 6)
    streams.zipWithIndex.foreach { case (stream, si) =>
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.length.toLong
      for (parts <- Seq(1, 7)) {
        val ds = spark.createDataset(
          new scala.util.Random(si).shuffle(stream.toList)).repartition(parts)
        val m = 6
        val got = ds.select(HeavyHitters.sketch(m)).collect()(0).toMap
        val bound = n / (m + 1)
        got.foreach { case (t, c) =>
          assert(c <= exact(t), s"stream $si: $t overestimated")
          assert(exact(t) - c <= bound, s"stream $si: $t outside bound")
        }
        exact.filter(_._2 > bound).keys.foreach(t =>
          assert(got.contains(t), s"stream $si parts=$parts: heavy $t missing"))
      }
    }
  }

  test("nearest-cell kernel ≡ HOF assign on generated vectors, incl. argmin ties") {
    import graft.similarity.Kmeans
    // small dims + coarse values make exact-distance TIES likely — the
    // case where first-minimum semantics (not just the math) must agree
    val cases = samples(
      for {
        d <- Gen.chooseNum(1, 5)
        k <- Gen.chooseNum(1, 6)
        vecs <- Gen.listOfN(12, Gen.listOfN(d, Gen.chooseNum(-2, 2).map(_.toDouble)))
        cent <- Gen.listOfN(k, Gen.listOfN(d, Gen.chooseNum(-2, 2).map(_.toDouble)))
      } yield (vecs, cent), 12)
    cases.zipWithIndex.foreach { case ((vecs, cent), ci) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "c_vec")
      val a = Kmeans.assign(df, cent)
        .select(col("vec_id"), col("cell"), col("d2"))
        .orderBy(col("vec_id")).collect().toSeq
      val b = Kmeans.assignHof(df, cent)
        .select(col("vec_id"), col("cell"), col("d2"))
        .orderBy(col("vec_id")).collect().toSeq
      assert(a === b, s"case $ci (d=${cent.head.length}, k=${cent.length})")
    }
  }
}
