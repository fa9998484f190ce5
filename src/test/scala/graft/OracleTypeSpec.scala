package graft

import org.scalatest.funsuite.AnyFunSuite

/** Permanent form of the DuckDB result-type sweep. Three rounds (r11
  * `lay_compaction`, r12 `tx_mix_weights`, r14 `samp_shard_export`)
  * shipped the same failure class: an oracle `SUM(BIGINT)` infers
  * HUGEINT in DuckDB while Spark emits LongType, and the driver's
  * type-sensitive hasher fails the row even though every value matches.
  * The r13 sweep that "killed" the class was a one-off script, and a
  * row added after it ran recreated the bug — so the sweep now runs on
  * EVERY `sbt test`: each statement in `SparkEntry.oracleSql` is bound
  * (not executed) by DuckDB against the smallest test dataset and any
  * surfaced HUGEINT / UHUGEINT / DECIMAL result column is a failure.
  *
  * Shells out to the driver-side python3+duckdb toolchain
  * (`tools/type_sweep.py`); cancels — does not pass — when that
  * toolchain or the test data is absent, so the spec is only green when
  * the sweep actually ran.
  */
class OracleTypeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def haveDuckdb: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    catch { case _: java.io.IOException => false }

  test("every oracle statement infers driver-hashable result types in DuckDB") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      s"test data $sfDir not present")
    assume(new java.io.File("tools/type_sweep.py").exists(),
      "tools/type_sweep.py not present")
    assume(haveDuckdb, "python3+duckdb toolchain not present")
    val json = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(json, Verify.oracleJson)
    val pb = new ProcessBuilder("python3", "tools/type_sweep.py",
      sfDir, json.toString).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    java.nio.file.Files.deleteIfExists(json)
    assert(code == 0, s"DuckDB type sweep failed:\n$out")
  }
}
