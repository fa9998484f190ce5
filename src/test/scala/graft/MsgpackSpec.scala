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
}
