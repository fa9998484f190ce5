package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Digest of the main source tree, stamped into every bench artifact at
  * write time so artifact FRESHNESS is machine-checkable: three rounds
  * running, perf claims shipped against artifacts produced by an older
  * binary, and the key-set check alone (BenchArtifactSpec's original
  * contract) could not see it — the keys match while every value is
  * stale. `BenchArtifactSpec` recomputes this digest over the working
  * tree and fails when a tracked artifact's stamp disagrees, so a source
  * change keeps `sbt test` red until the benches are re-run on the new
  * binary.
  *
  * Scope: every regular file under `src/main` (sources AND resources —
  * everything that shapes the measured binary) plus `build.sbt`. Tests,
  * tools and docs are excluded — they cannot change what the bench
  * measures. The stamp is computed from the SOURCE TREE at run time, so
  * it is only trustworthy when the bench is built-and-run in one step
  * (`sbt "runMain graft.Bench"` — sbt recompiles before running);
  * launching a stale prebuilt jar over an edited tree would stamp the
  * artifact with sources the binary never saw. */
object SrcDigest {

  def current: String = {
    val md = MessageDigest.getInstance("SHA-256")
    val roots = Seq(Paths.get("src/main"), Paths.get("build.sbt"))
    val files: Seq[Path] = roots.flatMap { r =>
      if (!Files.exists(r)) Seq.empty
      else if (Files.isRegularFile(r)) Seq(r)
      else {
        val s = Files.walk(r)
        try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally s.close()
      }
    }.sortBy(_.toString)
    files.foreach { p =>
      md.update(p.toString.getBytes("UTF-8"))
      md.update(0.toByte)
      md.update(Files.readAllBytes(p))
      md.update(0.toByte)
    }
    files.size + "-" +
      md.digest().take(8).map(b => f"$b%02x").mkString
  }
}
