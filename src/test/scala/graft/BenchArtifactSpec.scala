package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifacts must cover the CURRENT query surface — rounds 12
  * and 13 both closed with the freshest registered row missing from
  * bench_sf10.json because the expensive scale run happened before the
  * row landed and nothing failed when it wasn't re-run. This spec IS
  * that loud failure: a tracked artifact whose per-query key set differs
  * from `SparkEntry.queries` keeps `sbt test` red until the bench is
  * re-run on the current binary.
  *
  * bench_sf1.json is deliberately NOT checked: it is the round-9
  * historical rehearsal record (128-query surface of its day), kept as
  * an audit trail, not a per-round artifact. */
class BenchArtifactSpec extends AnyFunSuite {

  /** Queries the binary would declare as excluded from benching — none
    * today; anything added here must say why at the call site. */
  private val declaredExclusions: Set[String] = Set.empty

  private def artifactKeys(path: String): Option[Set[String]] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return None
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // (?s): compare_bench --annotate re-indents the artifact multi-line
    val m = """(?s)"queries":\s*\{(.*?)\}""".r.findFirstMatchIn(body)
      .getOrElse(fail(s"$path exists but has no parseable queries map"))
    Some(""""([a-z0-9_]+)":""".r.findAllMatchIn(m.group(1))
      .map(_.group(1)).toSet)
  }

  for (artifact <- Seq("bench_full.json", "bench_sf10.json"))
    test(s"$artifact rows == SparkEntry.queries keys (re-run the bench if red)") {
      val expect = SparkEntry.queries.keySet -- declaredExclusions
      artifactKeys(artifact) match {
        case None => fail(s"$artifact missing — run the bench to produce it")
        case Some(got) =>
          val missing = expect -- got
          val stale = got -- expect
          assert(missing.isEmpty && stale.isEmpty,
            s"$artifact drifted from the query surface — " +
              s"missing=${missing.toSeq.sorted.mkString(",")} " +
              s"stale=${stale.toSeq.sorted.mkString(",")}; " +
              "re-run graft.Bench (and the sf10 pass) on this binary")
      }
    }
}
