package graft

import org.apache.spark.sql.functions._

import graft.sources.Msgpack
import graft.sources.Msgpack.MsgMap

/** Msgpack codec conformance: byte-level pins against the public msgpack
  * spec (format bytes, width selection), value round-trips including the
  * flattened-array path, and the Spark edge (pack a struct column, read it
  * back through the declared schema). */
class MsgpackSpec extends SparkSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("format pins: smallest-width encodings per the msgpack spec") {
    assert(hex(Msgpack.pack(null)) === "c0")
    assert(hex(Msgpack.pack(false)) === "c2")
    assert(hex(Msgpack.pack(true)) === "c3")
    // int family boundaries
    assert(hex(Msgpack.pack(0L)) === "00")
    assert(hex(Msgpack.pack(127L)) === "7f")
    assert(hex(Msgpack.pack(128L)) === "cc80")
    assert(hex(Msgpack.pack(255L)) === "ccff")
    assert(hex(Msgpack.pack(256L)) === "cd0100")
    assert(hex(Msgpack.pack(65535L)) === "cdffff")
    assert(hex(Msgpack.pack(65536L)) === "ce00010000")
    assert(hex(Msgpack.pack(4294967295L)) === "ceffffffff")
    assert(hex(Msgpack.pack(4294967296L)) === "cf0000000100000000")
    assert(hex(Msgpack.pack(-1L)) === "ff")
    assert(hex(Msgpack.pack(-32L)) === "e0")
    assert(hex(Msgpack.pack(-33L)) === "d0df")
    assert(hex(Msgpack.pack(-129L)) === "d1ff7f")
    assert(hex(Msgpack.pack(-32769L)) === "d2ffff7fff")
    // float64, str, bin, array, map
    assert(hex(Msgpack.pack(1.5)) === "cb3ff8000000000000")
    assert(hex(Msgpack.pack("abc")) === "a3616263")
    assert(hex(Msgpack.pack("x" * 32)).startsWith("d920"))
    assert(hex(Msgpack.pack("x" * 256)).startsWith("da0100"))
    assert(hex(Msgpack.pack(Array[Byte](1, 2))) === "c4020102")
    assert(hex(Msgpack.pack(Seq(1L, 2L))) === "920102")
    assert(hex(Msgpack.pack(MsgMap(Vector("a" -> 1L)))) === "81a16101")
  }

  test("round-trip: nested maps, arrays, negative ints, unicode, binary") {
    val v = MsgMap(Vector(
      "id" -> 123456789012L,
      "name" -> "café ≠ 日本語",
      "ok" -> true,
      "missing" -> null,
      "score" -> -0.125,
      "counts" -> Vector(1L, -200L, 70000L),
      "nested" -> MsgMap(Vector("k" -> "v", "n" -> -5L))))
    assert(Msgpack.unpack(Msgpack.pack(v)) === v)
    // binary round-trips by content (Array equality is by reference)
    val b = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val back = Msgpack.unpack(Msgpack.pack(b)).asInstanceOf[Array[Byte]]
    assert(back.toSeq === b.toSeq)
    // long strings cross the str8/str16 boundaries intact
    val s = "yz" * 40000
    assert(Msgpack.unpack(Msgpack.pack(s)) === s)
  }

  test("truncated bodies fail with a clear error, not a buffer underflow") {
    val good = Msgpack.pack(MsgMap(Vector("a" -> "hello", "b" -> 42L)))
    val e = intercept[IllegalArgumentException] {
      Msgpack.unpack(good.take(good.length - 3))
    }
    assert(e.getMessage.contains("truncated"))
    // corrupt length prefixes must fail cleanly, not allocate gigabytes
    // or throw NegativeArraySizeException (str32 claiming 4 GiB)
    val e2 = intercept[IllegalArgumentException] {
      Msgpack.unpack(Array(0xdb, 0xff, 0xff, 0xff, 0xff).map(_.toByte))
    }
    assert(e2.getMessage.contains("corrupt"))
    val e3 = intercept[IllegalArgumentException] {
      Msgpack.unpack(Array(0xdc, 0x7f, 0xff).map(_.toByte)) // array16 of 32767
    }
    assert(e3.getMessage.contains("corrupt"))
  }

  test("json view renders decoded bodies for from_json") {
    val v = MsgMap(Vector("a" -> 1L, "s" -> "he said \"hi\"\n", "xs" -> Vector(1.5, 2.5)))
    assert(Msgpack.toJson(v) === """{"a":1,"s":"he said \"hi\"\n","xs":[1.5,2.5]}""")
  }

  test("timestamps and dates ride the wire as ISO strings and parse back") {
    // built from an Instant so the expectation is timezone-independent
    // (Timestamp.valueOf would parse local wall-clock time)
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-05T06:07:08.123456Z"))
    val d = java.sql.Date.valueOf("2024-03-05")
    // packed as str (ISO-8601 UTC offset form / plain date), like the JSON edge
    val tsBack = Msgpack.unpack(Msgpack.pack(ts)).asInstanceOf[String]
    assert(tsBack.startsWith("2024-03-05T06:07:08.123456"))
    assert(tsBack.endsWith("Z") || tsBack.contains("+"))
    assert(Msgpack.unpack(Msgpack.pack(d)) === "2024-03-05")
    // and from_json converts the rendered body into a real TimestampType
    import spark.implicits._
    val packed = Seq(Tuple1(Msgpack.pack(Msgpack.MsgMap(Vector(
      "id" -> 7L, "ts" -> ts))))).toDF("body")
    val back = Msgpack.readMsgpack(packed, col("body"), "id LONG, ts TIMESTAMP")
      .collect()(0)
    assert(back.getLong(0) === 7L)
    assert(back.getTimestamp(1) !== null)
  }

  test("spark edge: struct -> msgpack body -> typed read-back is lossless") {
    import spark.implicits._
    val src = Seq(
      (1L, "alpha", Seq(1.5, -2.25, 3.0)),
      (2L, "beta \"quoted\"", Seq(0.1)),
      (3L, "日本語テキスト", Seq.empty[Double]))
      .toDF("id", "name", "vals")
    val packed = src.select(Msgpack.packStruct(struct(col("id"), col("name"), col("vals"))).as("body"))
    val back = Msgpack.readMsgpack(packed, col("body"),
      "id LONG, name STRING, vals ARRAY<DOUBLE>")
    assert(back.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getSeq[Double](2))).toSeq ===
      src.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getSeq[Double](2))).toSeq)
  }

  // ------------------------------------------------- native decode parity

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.types.StructType
  import graft.sources.MsgpackToStruct

  /** The pre-native two-step edge (generic decode → JSON render →
    * from_json), kept as the equivalence reference. */
  private def jsonEdge(df: DataFrame, ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    df.select(org.apache.spark.sql.functions
        .from_json(Msgpack.unpackToJson(col("body")), schema).as("__r"))
      .select(col("__r.*"))
  }

  private def nativeEdge(df: DataFrame, ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    assert(MsgpackToStruct.supports(schema), s"native decoder must support $ddl")
    df.select(MsgpackToStruct(col("body"), schema).as("__r")).select(col("__r.*"))
  }

  /** Rows compared through toString after normalizing binary to hex —
    * Array[Byte] compares by reference, everything else (incl. nested
    * structs/arrays/maps/timestamps) renders deterministically. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => hex(b)
      case x => String.valueOf(x)
    }.mkString("|"))

  private val fullDdl =
    "id LONG, small INT, name STRING, ok BOOLEAN, score DOUBLE, " +
      "emb ARRAY<DOUBLE>, blob BINARY, tags MAP<STRING, LONG>, " +
      "nested STRUCT<k: STRING, n: LONG, xs: ARRAY<LONG>>, ts TIMESTAMP"

  test("native decode ≡ json edge on seeded well-typed bodies (full type surface)") {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    def maybe[T](v: => T): Any = if (rnd.nextInt(5) == 0) null else v
    val alphabet = "ab α日\"\\\n xyz"
    def str(): String =
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val bodies = (0 until 300).map { i =>
      val entries = Vector.newBuilder[(String, Any)]
      entries += ("id" -> i.toLong)
      if (rnd.nextInt(8) != 0) entries += ("small" -> maybe(rnd.nextInt(2000).toLong - 1000L))
      entries += ("name" -> maybe(str()))
      entries += ("ok" -> maybe(rnd.nextBoolean()))
      // non-finite doubles land as null on BOTH edges (json renders "null")
      entries += ("score" -> maybe(rnd.nextInt(6) match {
        case 0 => Double.NaN
        case 1 => Double.PositiveInfinity
        case _ => rnd.nextDouble() * 1e3 - 500
      }))
      entries += ("emb" -> maybe(Vector.fill(rnd.nextInt(5))(
        if (rnd.nextBoolean()) rnd.nextDouble() else rnd.nextInt(100).toLong)))
      entries += ("blob" -> maybe(Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt(256).toByte)))
      entries += ("tags" -> maybe(MsgMap(Vector.tabulate(rnd.nextInt(3))(k =>
        s"t$k" -> (rnd.nextInt(50).toLong: Any)))))
      entries += ("nested" -> maybe(MsgMap(Vector(
        "k" -> str(), "n" -> rnd.nextLong(),
        "xs" -> Vector.fill(rnd.nextInt(3))(rnd.nextInt(10).toLong)))))
      entries += ("ts" -> maybe(f"2024-0${1 + rnd.nextInt(9)}%s-1${rnd.nextInt(9)}%sT0${rnd.nextInt(9)}%s:1${rnd.nextInt(5)}%s:2${rnd.nextInt(9)}%s.${rnd.nextInt(999999)}%06dZ"))
      // unknown keys must be skipped by name on both edges
      if (rnd.nextInt(3) == 0) entries += ("extra_unknown" -> MsgMap(Vector(
        "deep" -> Vector(1L, "s", MsgMap(Vector("x" -> 1L))))))
      Msgpack.pack(MsgMap(entries.result()))
    }
    val df = bodies.map(Tuple1(_)).toDF("body")
    assert(canon(nativeEdge(df, fullDdl)) === canon(jsonEdge(df, fullDdl)))
  }

  test("native decode: production queries' exact shapes are routed natively") {
    // the two oracle queries' schemas must take the one-pass path
    assert(MsgpackToStruct.supports(StructType.fromDDL(
      "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")))
    assert(MsgpackToStruct.supports(StructType.fromDDL(
      "vec_id LONG, label LONG, embedding ARRAY<DOUBLE>")))
  }

  test("native decode: malformed bodies yield null rows, never task failures") {
    import spark.implicits._
    val good = Msgpack.pack(MsgMap(Vector("id" -> 1L, "name" -> "ok")))
    val bodies = Seq(
      good,
      good.take(good.length - 2), // truncated mid-value
      Array(0xdb, 0xff, 0xff, 0xff, 0xff).map(_.toByte), // str32 claiming 4 GiB
      Array(0x91.toByte), // array(1) with no element
      Msgpack.pack(Vector(1L, 2L)), // root is an array, not a map
      Msgpack.pack(MsgMap(Vector("id" -> "not_a_long"))), // type mismatch
      Msgpack.pack(null)) // wire nil at the root
    val out = nativeEdge(bodies.map(Tuple1(_)).toDF("body"), "id LONG, name STRING")
      .collect()
    assert(out.length === bodies.length)
    assert(out(0).getLong(0) === 1L && out(0).getString(1) === "ok")
    // every malformed body → fully-null row (conservative; documented
    // delta vs Jackson partial-results on the mismatch case)
    (1 until bodies.length).foreach { i =>
      assert(out(i).isNullAt(0) && out(i).isNullAt(1), s"body $i")
    }
  }

  test("native encode ≡ row-udf edge, byte for byte (full type surface)") {
    import spark.implicits._
    // documents at sf0.001 give varied real strings; add synthetic columns
    // for the rest of the surface. Map kept ≤4 entries (insertion-ordered
    // in immutable Map — the documented byte-parity boundary).
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(200)
      .withColumn("emb", array(lit(1.5), col("doc_id").cast("double") * 0.125,
        lit(Double.MaxValue), lit(1e-300)))
      .withColumn("blob", sha2(col("text"), 256).cast("binary"))
      .withColumn("flag", col("doc_id") % 2 === 0)
      .withColumn("small_i", (col("doc_id") % 70000 - 35000).cast("int"))
      .withColumn("tiny", (col("doc_id") % 200 - 100).cast("short"))
      .withColumn("f32", (col("doc_id") * 0.25).cast("float"))
      .withColumn("dec", (col("doc_id") * 0.01).cast("decimal(12,4)"))
      .withColumn("ts", to_timestamp(lit("2024-03-05 06:07:08.123456")))
      .withColumn("dt", to_date(lit("2024-03-05")))
      .withColumn("tags", map(lit("a"), col("doc_id"), lit("b"), lit(null.asInstanceOf[java.lang.Long])))
      .withColumn("nested", struct(col("lang").as("l"), col("n_chars").as("n")))
      .withColumn("maybe_null", when(col("doc_id") % 3 === 0, col("text")))
    val cols = struct(col("doc_id"), col("text"), col("maybe_null"), col("emb"),
      col("blob"), col("flag"), col("small_i"), col("tiny"), col("f32"),
      col("dec"), col("ts"), col("dt"), col("tags"), col("nested"))
    val both = src.select(col("doc_id"),
        Msgpack.packStruct(cols).as("native"),
        Msgpack.packStructRowUdf(cols).as("viaRow"))
      .collect()
    assert(both.length === 200)
    both.foreach { r =>
      assert(hex(r.getAs[Array[Byte]]("native")) === hex(r.getAs[Array[Byte]]("viaRow")),
        s"doc ${r.getLong(0)}")
    }
  }

  test("native decode: integral range checks and unsigned widths") {
    import spark.implicits._
    val bodies = Seq(
      Msgpack.pack(MsgMap(Vector("small" -> 70000L, "id" -> 1L))), // short overflow → null row
      Msgpack.pack(MsgMap(Vector("small" -> 32767L, "id" -> 2L))), // boundary fits
      Msgpack.pack(MsgMap(Vector("small" -> -32768L, "id" -> 3L))),
      Msgpack.pack(MsgMap(Vector("big" -> 4294967295L, "id" -> 4L)))) // uint32 max into LONG
    val out = nativeEdge(bodies.map(Tuple1(_)).toDF("body"), "id LONG, small SHORT, big LONG")
      .orderBy(col("id").asc_nulls_first).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getShort(1) === 32767.toShort)
    assert(out(2).getShort(1) === (-32768).toShort)
    assert(out(3).getLong(2) === 4294967295L)
  }
}
