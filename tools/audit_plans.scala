// Plan anti-pattern audit over EVERY SparkEntry query: flags cartesian
// products, nested-loop joins, sort-merge joins, range/hash exchanges and
// window operators per query so a scale regression (a lost broadcast, an
// accidental cross join, a window sort sneaking into a hot path) is one
// grep away. Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.shuffle.partitions=8 --master 'local[8]' \
//     -I tools/audit_plans.scala
// Reading the round-7 output: 0 CartesianProduct anywhere;
// BroadcastNestedLoopJoin only in j7 (entries x specs matrix by design),
// sim_* (broadcast query side), st4/x4 (non-equi time bounds); exactly
// one rangepartitioning per query (the final ORDER BY contract; top-k
// queries have none); SortMergeJoin only where both sides are genuinely
// large (components label joins, cache diff, the st1 composed chain) —
// AQE converts the small cases at runtime.
import graft._
val dir = "/root/testdata/sf0.001"
val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, f) =>
  try {
    val p = f(spark, dir).queryExecution.executedPlan.toString
    def c(n: String) = p.sliding(n.length).count(_ == n)
    (name, c("CartesianProduct"), c("BroadcastNestedLoopJoin"), c("SortMergeJoin"),
     c("Exchange rangepartitioning"), c("Exchange hashpartitioning"), c("Window"))
  } catch { case e: Throwable => (name, -1, -1, -1, -1, -1, -1) }
}
println("AUDIT name cartesian bnlj smj range hash window")
rows.foreach { case (n, a, b, s, r, h, w) => println(f"AUDIT $n%-24s $a $b $s $r $h $w") }
val cart = rows.filter(_._2 > 0)
println(if (cart.isEmpty) "AUDIT OK: no cartesian products"
        else s"AUDIT FAIL: cartesian in ${cart.map(_._1).mkString(",")}")
sys.exit(0)
