package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hashing, PyCanonicalJson, PyJson}

/** BYTE parity of the CPython json.dumps canonicalization against the
  * reference's OWN pinned digests: every fixture line carries a sha256
  * from the `qcarchivetesting/qcarchivetesting/hash_data` fixtures (the
  * reference's hash-canary test data, loader `helpers.py:233-241`), plus
  * the CPython canonical rendering. The Scala side parses a deliberately
  * NON-canonical re-dump (unsorted keys, pretty-printed) and must
  * reproduce both the canonical bytes and the digest. Fixture generator:
  * `tools/make_hash_fixtures.py`. */
class PyJsonSpec extends SparkSuite {

  import spark.implicits._

  test("hash_dict parity: 695 reference-pinned digests reproduce byte-for-byte") {
    // parse the fixture lines with Spark's JSON reader (schema explicit so
    // the embedded json/canonical stay raw strings)
    val df = spark.read
      .schema("sha256 STRING, canonical STRING, json STRING")
      .json("src/test/resources/pyjson_hash_fixtures.jsonl")
    val n = df.count()
    assert(n === 695L)
    val out = df.select(
      col("sha256"), col("canonical"),
      PyCanonicalJson(col("json")).as("got_canonical"),
      Hashing.pyDictHash256(col("json")).as("got_sha"),
      // idempotence: the canonical form must be a fixed point of the
      // canonicalizer (re-parsing our own rendering and re-rendering must
      // change nothing — catches parse/render asymmetries the one-shot
      // compare can't)
      PyCanonicalJson(PyCanonicalJson(col("json"))).as("got_twice"))
    val badCanon = out.filter(col("got_canonical") =!= col("canonical")).count()
    val badSha = out.filter(col("got_sha") =!= col("sha256")).count()
    val badFix = out.filter(col("got_twice") =!= col("got_canonical")).count()
    assert(badCanon === 0L, "canonical rendering drifted from CPython")
    assert(badSha === 0L, "digest mismatch vs reference-pinned sha256")
    assert(badFix === 0L, "canonicalization is not idempotent")
  }

  test("float repr matches Python repr across notation boundaries") {
    val cases = Seq(
      0.0 -> "0.0", -0.0 -> "-0.0", 1.0 -> "1.0", -64.0 -> "-64.0",
      0.1 -> "0.1", 0.0001 -> "0.0001", 0.00001 -> "1e-05",
      1e15 -> "1000000000000000.0", 1e16 -> "1e+16", 1.5e16 -> "1.5e+16",
      -189.9308216846 -> "-189.9308216846", 1.0 / 3 -> "0.3333333333333333",
      5e-324 -> "5e-324", 1.7976931348623157e308 -> "1.7976931348623157e+308",
      2.5e-10 -> "2.5e-10", 123456789.123 -> "123456789.123")
    cases.foreach { case (d, want) =>
      assert(PyJson.pyFloatRepr(d) === want, s"repr($d)")
    }
  }

  test("float repr round-trips exactly across magnitude bands (seeded sweep)") {
    // the shortest-repr search must never lose precision: for any double,
    // parsing the repr must recover the identical bits (Python guarantees
    // this for repr; the sha-parity contract inherits it)
    val rnd = new scala.util.Random(42)
    val magnitudes = Seq(1e-300, 1e-20, 1e-8, 1e-4, 1.0, 1e4, 1e15, 1e16, 1e300)
    val values = magnitudes.flatMap(m =>
      (0 until 200).map(_ => (rnd.nextDouble() - 0.5) * m)) ++
      Seq(0.0, -0.0, Double.MinPositiveValue, Double.MaxValue)
    values.foreach { d =>
      val r = PyJson.pyFloatRepr(d)
      assert(java.lang.Double.parseDouble(r) == d, s"repr($d) = $r does not round-trip")
      // Python repr never emits a bare integer for a float — a '.' or 'e'
      // must be present (the json int/float distinction depends on it)
      assert(r.contains('.') || r.contains('e'), s"repr($d) = $r lost floatness")
    }
  }

  test("canonicalization handles escapes, unicode, bigints, non-finite") {
    val in =
      """{"b": "line\nbreak \"q\" \\ é ✓", "a": [1e3, 100000000000000000000, -0],
        | "nested": {"z": null, "y": [true, false]}, "nan": NaN}""".stripMargin
    val got = PyJson.canonical(in)
    // CPython: json.dumps(json.loads(in), ensure_ascii=True, sort_keys=True)
    // (expected built with escaped backslashes so \u00e9 stays six LITERAL
    // chars — ensure_ascii renders the accented char and checkmark as
    // backslash-u escapes)
    val expected = "{\"a\": [1000.0, 100000000000000000000, 0], " +
      "\"b\": \"line\\nbreak \\\"q\\\" \\\\ \\u00e9 \\u2713\", \"nan\": NaN, " +
      "\"nested\": {\"y\": [true, false], \"z\": null}}"
    assert(got === expected)
  }

  test("pathological nesting degrades to null, not a stack overflow") {
    val deep = "[" * 600 + "]" * 600
    val ok = "[" * 400 + "1" + "]" * 400
    val df = Seq(deep, ok).toDF("j").select(PyCanonicalJson(col("j")).as("c"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0).isEmpty)
    assert(got(1) === Some(ok))
  }

  test("duplicate keys collapse to the last occurrence, as CPython does") {
    // json.dumps(json.loads('{"b":0,"a":1,"a":2}'), sort_keys=True)
    //   == '{"a": 2, "b": 0}'
    assert(PyJson.canonical("""{"b": 0, "a": 1, "a": 2}""") === """{"a": 2, "b": 0}""")
  }

  test("\\u escapes require four hex digits, rejecting parseInt's sign leniency") {
    // Integer.parseInt(_, 16) accepts "+041"/"-041" — json.loads does
    // not, so such strings must canonicalize to null, never to a digest
    val df = Seq("[\"\\u0041\"]", "[\"\\u+041\"]", "[\"\\u-041\"]",
        "[\"\\u00g1\"]", "[\"\\u004\"]").toDF("j")
      .select(PyCanonicalJson(col("j")).as("c"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0) === Some("[\"A\"]"))
    assert(got.drop(1).forall(_.isEmpty))
  }

  test("malformed JSON yields null, not a job-killing exception") {
    // includes the lenient-grammar traps strict json.loads rejects:
    // leading zeros, bare trailing dot, empty exponent, raw control char
    // in a string — a digest must never be manufactured for a document
    // the reference would have refused to hash
    val df = Seq("{\"a\": 1}", "{broken", "[1, 2", "",
        "{\"a\": 01}", "[1.]", "[1e]", "[\"ab\"]").toDF("j")
      .select(PyCanonicalJson(col("j")).as("c"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0) === Some("{\"a\": 1}"))
    assert(got.drop(1).forall(_.isEmpty))
  }
}
