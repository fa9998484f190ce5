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
}
