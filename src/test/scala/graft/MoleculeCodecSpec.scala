package graft

import org.apache.spark.sql.functions._

import graft.functions.{Codec, Molecules}

/** Hash-pinning + round-trip fixtures for the molecule fidelity and codec
  * edges (SURVEY F8-F11) — the reference pins molecule hash values the
  * same way (`qcarchivetesting/qcarchivetesting/helpers.py:233-241`). */
class MoleculeCodecSpec extends SparkSuite {

  import spark.implicits._

  test("molecule hash is pinned (canonicalization must never drift)") {
    val df = Seq((Seq("C", "H", "H", "O"), (0 until 12).map(_ * 0.5), 0.0, 1))
      .toDF("symbols", "geometry", "charge", "mult")
    val h = df.select(Molecules.moleculeHash(
      col("symbols"), col("geometry"), col("charge"), col("mult"))).collect()(0).getString(0)
    // sha1 of "c,h,h,o|0.0|1|0.00000000,...,5.50000000"
    assert(h === "13a68ef69638960292f0b6836095797f41a16734")
  }

  test("molecule hash ignores sub-1e-8 geometry noise, catches real moves") {
    val base = (0 until 6).map(_ * 0.5)
    val noisy = base.updated(2, base(2) + 1e-10)   // below the noise floor
    val moved = base.updated(2, base(2) + 1e-4)    // a real change
    val df = Seq(("a", base), ("b", noisy), ("c", moved)).toDF("id", "geometry")
      .select(col("id"), Molecules.moleculeHash(
        array(lit("C"), lit("O")), col("geometry"), lit(0.0), lit(1)).as("h"))
    val hs = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hs("a") === hs("b"))
    assert(hs("a") !== hs("c"))
  }

  test("qcel get_hash parity: CPython-generated fixtures reproduce byte-for-byte") {
    // fixtures from tools/make_hash_fixtures.py: real CPython+numpy
    // executing the QCElemental get_hash algorithm (see
    // QcelMoleculeCanonical scaladoc for the verification boundary)
    val df = spark.read
      .schema("""molecule STRUCT<
          symbols: ARRAY<STRING>, masses: ARRAY<DOUBLE>,
          molecular_charge: DOUBLE, molecular_multiplicity: INT,
          real: ARRAY<BOOLEAN>, geometry: ARRAY<DOUBLE>,
          fragments: ARRAY<ARRAY<INT>>, fragment_charges: ARRAY<DOUBLE>,
          fragment_multiplicities: ARRAY<INT>,
          connectivity: ARRAY<ARRAY<DOUBLE>>>,
        canonical STRING, sha1 STRING""")
      .json("src/test/resources/qcel_molecule_hash_fixtures.jsonl")
    assert(df.count() === 7L)
    val m = col("molecule")
    // connectivity arrives as [[a, b, bond_order]] double triples; reshape
    // to the typed struct the expression takes
    val conn = transform(m.getField("connectivity"), t => struct(
      element_at(t, 1).cast("int").as("a"),
      element_at(t, 2).cast("int").as("b"),
      element_at(t, 3).as("bo")))
    val out = df.select(
      col("canonical"), col("sha1"),
      graft.functions.QcelMoleculeCanonical(
        m.getField("symbols"), m.getField("masses"),
        m.getField("molecular_charge"), m.getField("molecular_multiplicity"),
        m.getField("real"), m.getField("geometry"),
        m.getField("fragments"), m.getField("fragment_charges"),
        m.getField("fragment_multiplicities"), conn).as("got_canonical"),
      Molecules.qcelMoleculeHash(
        m.getField("symbols"), m.getField("masses"),
        m.getField("molecular_charge"), m.getField("molecular_multiplicity"),
        m.getField("real"), m.getField("geometry"),
        m.getField("fragments"), m.getField("fragment_charges"),
        m.getField("fragment_multiplicities"), conn).as("got_sha1"))
    out.collect().foreach { r =>
      assert(r.getAs[String]("got_canonical") === r.getAs[String]("canonical"))
      assert(r.getAs[String]("got_sha1") === r.getAs[String]("sha1"))
    }
  }

  test("qcel get_hash parity: REFERENCE-pinned digests reproduce") {
    // The digests asserted here are literals from the reference repo's own
    // test suite (qcportal/qcportal/molecules/test_models.py:68,
    // qcfractal/.../molecules/test_client.py:292-294), over its own
    // qcarchivetesting/molecule_data payloads — the strongest F8 parity
    // evidence available without qcelemental itself: a transcription error
    // in field handling or noise constants fails HERE even though the
    // CPython-generated fixtures can't catch it.
    val pinned = Map(
      "water_dimer_minima" -> "3c4b98f515d64d1adc1648fe1fe1d6789e978d34",
      "water_stacked" -> "27061c76f7de3eca6a2d9521d660661fe177192f",
      "benzene_dimer" -> "0990d963680c22adde43bd650dff75e3b16808be")
    val df = spark.read
      .schema("""name STRING, molecule STRUCT<
          symbols: ARRAY<STRING>, masses: ARRAY<DOUBLE>,
          molecular_charge: DOUBLE, molecular_multiplicity: INT,
          real: ARRAY<BOOLEAN>, geometry: ARRAY<DOUBLE>,
          fragments: ARRAY<ARRAY<INT>>, fragment_charges: ARRAY<DOUBLE>,
          fragment_multiplicities: ARRAY<INT>>,
        canonical STRING, sha1 STRING""")
      .json("src/test/resources/qcel_reference_hash_vectors.jsonl")
    val m = col("molecule")
    val got = df.select(col("name"),
        Molecules.qcelMoleculeHash(
          m.getField("symbols"), m.getField("masses"),
          m.getField("molecular_charge"), m.getField("molecular_multiplicity"),
          m.getField("real"), m.getField("geometry"),
          m.getField("fragments"), m.getField("fragment_charges"),
          m.getField("fragment_multiplicities")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === pinned)
  }

  test("qcel hash: sub-noise-floor jitter is identity-preserving") {
    // two fixture molecules are the same water with jitter below the
    // geometry noise floor — their digests must coincide; all others are
    // distinct (row order deliberately not relied upon)
    val df = spark.read.json("src/test/resources/qcel_molecule_hash_fixtures.jsonl")
    val shas = df.select(col("sha1")).collect().map(_.getString(0))
    assert(shas.length === 7)
    assert(shas.distinct.length === 6)
    val waters = df
      .filter(size(col("molecule.symbols")) === 3 && col("molecule.masses").isNotNull)
      .select(col("sha1")).collect().map(_.getString(0))
    assert(waters.length === 2 && waters(0) === waters(1))
  }

  test("hill formula: C, H, then alphabetical; singleton counts omitted") {
    val cases = Seq(
      (Seq("C", "H", "H", "H", "H"), "CH4"),
      (Seq("H", "H", "O"), "H2O"),
      (Seq("O", "C", "O"), "CO2"),
      (Seq("N", "H", "H", "H"), "H3N"),
      (Seq("Cl", "Na"), "ClNa"),
      (Seq("C", "C", "H", "H", "H", "H", "H", "H", "O"), "C2H6O"))
    val df = cases.toDF("symbols", "want")
      .select(Molecules.hillFormula(col("symbols")).as("got"), col("want"))
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("geometry reshape: (N,3) triples, flatten identity") {
    val flat = (1 to 9).map(_.toDouble)
    val df = Seq(Tuple1(flat)).toDF("geometry")
      .select(Molecules.reshape3(col("geometry")).as("atoms"), col("geometry"))
    val row = df.select(size(col("atoms")).as("n"),
      element_at(element_at(col("atoms"), 2), 1).as("x2"),
      (Molecules.flatten3(col("atoms")) === col("geometry")).as("ok")).collect()(0)
    assert(row.getInt(0) === 3)
    assert(row.getDouble(1) === 4.0)
    assert(row.getBoolean(2))
  }

  test("zstd codec round-trips unicode text through a binary column") {
    val texts = Seq("hello world", "tòkëns ünicode ✓", "a" * 10000, "")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .select(col("id"), col("text"), Codec.zstdCompress(col("text")).as("blob"))
      .select(col("id"), col("text"),
        Codec.zstdDecompressToString(col("blob")).as("back"),
        length(col("blob")).as("nblob"), length(col("text")).as("ntext"))
    df.collect().foreach { r =>
      assert(r.getString(1) === r.getString(2))
    }
    // the 10k-run must actually compress
    val big = df.filter(col("ntext") === 10000).collect()(0)
    assert(big.getInt(3) < 200)
  }
}
