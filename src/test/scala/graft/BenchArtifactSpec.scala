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

  private def artifactDigest(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return None
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    """"src_digest":\s*"([^"]+)"""".r.findFirstMatchIn(body).map(_.group(1))
  }

  for (artifact <- Seq("bench_full.json", "bench_sf10.json")) {
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

    // VALUE freshness, not just key-set freshness: rounds 13-15 each
    // shipped a bench artifact produced by a pre-fix binary — the keys
    // matched, so the key-set test stayed green while the headline
    // numbers were stale. The artifact now carries the src/main digest
    // of the binary that produced it; any source change turns this red
    // until the bench is re-run.
    test(s"$artifact was produced by the CURRENT src/main tree") {
      artifactDigest(artifact) match {
        case None => fail(s"$artifact has no src_digest stamp — re-run " +
          "graft.Bench on this binary (stamping landed with SrcDigest)")
        case Some(stamp) =>
          val now = SrcDigest.current
          assert(stamp == now,
            s"$artifact is STALE: produced by src tree $stamp, working " +
              s"tree is $now — re-run graft.Bench (and the sf10 pass) " +
              "on the current binary before committing")
      }
    }
  }
}
