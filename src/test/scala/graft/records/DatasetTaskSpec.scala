package graft.records

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DatasetTaskSpec extends SparkSuite {

  lazy val entries = Fixtures.entries(spark)
  lazy val specs = Fixtures.specs(spark)
  lazy val items = Fixtures.items(spark)
  lazy val records = Fixtures.records(spark).cache()

  test("submit anti-join finds exactly the hole pattern") {
    val missing = DatasetOps.submitMissing(entries, specs, items)
    // holes where (i + j) % 3 == 0: count them
    val expected = (for { i <- 0 until 10; j <- 0 until 4 if (i + j) % 3 == 0 } yield 1).size
    assert(missing.count() === expected)
    // submitting again after creating them → zero missing
    val newItems = items.select("entry_name", "specification_name")
      .union(missing.select("entry_name", "specification_name"))
    assert(DatasetOps.submitMissing(entries, specs,
      newItems.withColumn("dataset_id", lit(1L)).withColumn("record_id", lit(0L))).count() === 0)
  }

  test("status matrix sums to item count; rollup sums the matrix") {
    val m = DatasetOps.statusMatrix(items, records)
    assert(m.agg(sum("n")).collect()(0).getLong(0) === items.count())
    val r = DatasetOps.statusRollup(items, records)
    assert(r.agg(sum("n")).collect()(0).getLong(0) === items.count())
  }

  test("compileValues pivots entry × spec wide") {
    val wide = DatasetOps.compileValues(items, records,
      value = col("record_id").cast("double"),
      specNames = Seq("spec_0", "spec_1", "spec_2", "spec_3"),
      statusFilter = None)
    assert(wide.columns.toSeq === Seq("entry_name", "spec_0", "spec_1", "spec_2", "spec_3"))
    assert(wide.count() === 10)
    // hole (0,0): entry_0/spec_0 must be null
    val row = wide.filter(col("entry_name") === "entry_0").collect()(0)
    assert(row.isNullAt(1))
  }

  test("claim honors availability, programs, tags, and ordering contract") {
    val tasks = Fixtures.tasks(spark)
    // manager with only psi4, tag_a: excludes unavailable (i%5==0),
    // dftd3-requiring (i%4==0), and tag_b (i odd)
    val claimed = TaskOps.claim(tasks, Seq("psi4"), Seq("tag_a"), limit = 10)
      .collect()
    assert(claimed.length === 10)
    val asTuples = claimed.map(r => (
      r.getAs[Int]("compute_priority"),
      r.getAs[java.sql.Timestamp]("sort_date").getTime,
      r.getAs[Long]("task_id")))
    // priority desc, date asc, id asc
    assert(asTuples.toSeq === asTuples.sortBy(t => (-t._1, t._2, t._3)).toSeq)
    claimed.foreach { r =>
      assert(r.getAs[Boolean]("available"))
      assert(r.getAs[String]("compute_tag") === "tag_a")
      assert(r.getAs[Seq[String]]("required_programs") === Seq("psi4"))
    }
  }

  test("wildcard manager claims across tags") {
    val tasks = Fixtures.tasks(spark)
    val claimed = TaskOps.claim(tasks, Seq("psi4", "dftd3"), Seq("*"), limit = 1000)
    assert(claimed.count() === tasks.filter(col("available")).count())
  }

  test("waitingReasons diagnoses claimability per task") {
    val wr = TaskOps.waitingReasons(Fixtures.tasks(spark), Fixtures.managers(spark))
    // every available psi4-only task is claimable (m_all or m_a)
    val psi4Only = wr.join(Fixtures.tasks(spark), "task_id")
      .filter(size(col("required_programs")) === 1)
    assert(psi4Only.filter(!col("claimable")).count() === 0)
    // dftd3 tasks only claimable by m_all (which serves '*')
    val dftd3 = wr.join(Fixtures.tasks(spark), "task_id")
      .filter(size(col("required_programs")) === 2)
    assert(dftd3.filter(col("n_program_matches") =!= 1).count() === 0)
  }

  test("cancellable filters by status reachability") {
    val c = TaskOps.cancellable(records)
    assert(c.filter(!col("status").isin("waiting", "running", "error")).count() === 0)
  }
}
