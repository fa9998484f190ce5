package graft.records

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic reference-shaped fixtures (FIXTURES.md §A): the full
  * cross-product record matrix from the reference's query tests
  * (`qcfractal/components/test_record_client_query.py:15-54`):
  * 10 molecules × 2 programs × 2 drivers × 2 methods × 2 bases = 160
  * singlepoint records per keyword set × 2 = 320, plus one record per
  * status of another type. Every filter has an exactly countable answer.
  */
object Fixtures {

  def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-02-$day%02d $hour%02d:00:00")

  def records(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val programs = Seq("psi4", "rdkit")
    val drivers = Seq("energy", "gradient")
    val methods = Seq("hf", "b3lyp")
    val bases = Seq("sto-3g", "6-31g")
    val statuses = RecordStatus.ordered

    var id = 0L
    val sp = for {
      mol <- 0 until 10
      (p, pi) <- programs.zipWithIndex
      (d, di) <- drivers.zipWithIndex
      (m, mi) <- methods.zipWithIndex
      (b, bi) <- bases.zipWithIndex
      kw <- 0 until 2
    } yield {
      id += 1
      val specId = (((pi * 2 + di) * 2 + mi) * 2 + bi) * 2 + kw
      val status = statuses((id % statuses.length).toInt)
      Record(id, "singlepoint", is_service = false, status,
        Some(s"manager_${id % 3}"), ts(1 + (id % 20).toInt), ts(21, (id % 24).toInt),
        Some(s"user_${id % 4}"), Some(specId.toLong), Some(mol.toLong))
    }
    val others = statuses.zipWithIndex.map { case (st, i) =>
      Record(1000L + i, "optimization", is_service = true, st, None,
        ts(25), ts(26), Some("user_0"), None, None)
    }
    (sp ++ others).toDF()
  }

  def edges(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // each optimization (1000..1006) parents 3 singlepoints
    (0 until 7).flatMap { i =>
      (1 to 3).map(j => RecordEdge(1000L + i, (i * 3 + j).toLong))
    }.toDF()
  }

  def entries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 10).map(i => DatasetEntry(1L, s"entry_$i", i.toLong)).toDF()
  }

  def specs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 4).map(i => DatasetSpec(1L, s"spec_$i", i.toLong)).toDF()
  }

  /** Items with a deliberate hole pattern: entry i × spec j exists only
    * when (i + j) % 3 != 0 — exercises the submit anti-join. */
  def items(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      i <- 0 until 10
      j <- 0 until 4
      if (i + j) % 3 != 0
    } yield DatasetRecordItem(1L, s"entry_$i", s"spec_$j", (i * 4 + j + 1).toLong)).toDF()
  }

  def tasks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 100).map { i =>
      Task(i.toLong, i.toLong + 1, available = i % 5 != 0,
        compute_tag = if (i % 2 == 0) "tag_a" else "tag_b",
        compute_priority = i % 3,
        sort_date = ts(1 + i % 10),
        required_programs = if (i % 4 == 0) Seq("psi4", "dftd3") else Seq("psi4"))
    }.toDF()
  }

  def managers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      Manager("m_all", "active", Seq("*"), Seq("psi4", "dftd3", "rdkit"), ts(20)),
      Manager("m_a", "active", Seq("tag_a"), Seq("psi4"), ts(20)),
      Manager("m_dead", "inactive", Seq("tag_a", "tag_b"), Seq("psi4"), ts(5))
    ).toDF()
  }
}
