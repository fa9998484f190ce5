package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.Tables

/** Temporary diagnostic main for the dd-family perf adjudication. */
object DdProfile {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    var jobMillis = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobTimes.put(js.jobId, js.time)
        jobDesc.put(js.jobId,
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse("?") + s" [stages=${js.stageIds.size}]")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobTimes.getOrDefault(je.jobId, je.time)
        jobMillis += (je.time - t0)
        durations.add((je.jobId, je.time - t0,
          jobDesc.getOrDefault(je.jobId, "?")))
      }
    })
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val m0 = jobMillis
      val t0 = System.nanoTime(); val r = f
      // listener events are async; give the bus a beat to drain
      Thread.sleep(300)
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"jobs=${jobs.get() - j0}, jobMillis=${jobMillis - m0}")
      r
    }
    val d0 = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = d0.union(d0.withColumn("doc_id", col("doc_id") + 1000000L))
    docs.count() // warm
    val name = if (args.nonEmpty) args(0) else "dd_incremental"
    for (i <- 1 to 3)
      time(s"$name run $i") {
        durations.clear()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    println("[prof] last-run jobs by duration:")
    durations.asScala.toSeq.sortBy(-_._2).foreach { case (id, ms, d) =>
      println(f"[prof]   job $id%3d ${ms}%6d ms  $d")
    }
    spark.stop()
  }
}
