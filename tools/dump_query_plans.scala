// Dump `.explain("formatted")` for a named list of SparkEntry queries
// into plans/<round>/<query>_<label>.txt — the before/after plan-pair
// evidence the optimization rounds commit. Run (after sbt compile; for
// "before" pairs, from a worktree checkout of the previous round's
// closing commit with its own compiled classes):
//   PLAN_QUERIES=q1,q2 PLAN_LABEL=before PLAN_OUT=plans/r19 \
//   PLAN_SF=/root/testdata/sf0.001 \
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.adaptive.coalescePartitions.initialPartitionNum=512 \
//     --conf spark.sql.shuffle.partitions=8 --master 'local[8]' \
//     -I tools/dump_query_plans.scala
// Queries with side-effect pipelines (index ingests, streams) RUN them
// while building the returned frame — the captured plan is the final
// consumer plan, the same convention as the r18 pairs.
import java.io.PrintWriter
import graft._

val names = sys.env.getOrElse("PLAN_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty)
val label = sys.env.getOrElse("PLAN_LABEL", "after")
val out = sys.env.getOrElse("PLAN_OUT", "plans/r19")
val dir = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.001")
new java.io.File(out).mkdirs()
for (name <- names) {
  try {
    val df = SparkEntry.queries(name)(spark, dir)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pw = new PrintWriter(s"$out/${name}_$label.txt")
    pw.println(s"== $name ($label, ${dir.split('/').last}) ==")
    pw.print(txt)
    pw.close()
    println(s"PLANDUMP OK $name -> $out/${name}_$label.txt")
  } catch { case e: Throwable =>
    println(s"PLANDUMP FAIL $name: ${e.getMessage}")
  }
}
sys.exit(0)
