package graft

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types._

/** Janino-compiles the generated code of every native expression — a
  * package-private static helper (no forwarder on the companion class),
  * a bad cast, or a malformed code template would otherwise fail
  * SILENTLY at runtime: Spark logs the Janino error and drops the whole
  * stage back to interpreted execution, erasing the perf the native
  * expressions exist to provide while results stay correct. */
class CodegenSpec extends SparkSuite {

  test("all native expressions survive codegen compilation") {
    val str = BoundReference(0, StringType, nullable = true)
    val arrS = BoundReference(1, ArrayType(StringType), nullable = true)
    val arrD = BoundReference(2, ArrayType(DoubleType), nullable = true)
    val arrF = BoundReference(3, ArrayType(FloatType), nullable = true)
    val arrL = BoundReference(4, ArrayType(LongType), nullable = true)
    // generate() throws on Janino compile failure (unlike
    // UnsafeProjection.create, which falls back to interpreted silently)
    val molStruct = BoundReference(5, StructType(Seq(
      StructField("symbols", ArrayType(StringType)),
      StructField("masses", ArrayType(DoubleType)),
      StructField("charge", DoubleType),
      StructField("mult", IntegerType),
      StructField("real", ArrayType(BooleanType)),
      StructField("geometry", ArrayType(DoubleType)),
      StructField("fragments", ArrayType(ArrayType(IntegerType))),
      StructField("fragment_charges", ArrayType(DoubleType)),
      StructField("fragment_multiplicities", ArrayType(IntegerType)),
      StructField("connectivity", ArrayType(StructType(Seq(
        StructField("a", IntegerType), StructField("b", IntegerType),
        StructField("bo", DoubleType))))))), nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.SimHash64(str),
      graft.functions.TokenCount(str),
      graft.functions.HashedShingles(str, 3),
      graft.functions.MinHashBands(arrS, 16, 4),
      graft.functions.MinHashBands(arrL, 16, 4),
      graft.functions.SrpBands(arrD, 8, 2, 42L),
      graft.functions.SrpBands(arrF, 8, 2, 42L),
      graft.functions.PyCanonicalJson(str),
      graft.functions.QcelMoleculeCanonical(molStruct)))
    assert(proj != null)
  }
}
