package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed, sorted table layout — the co-located-join story at 100 TB.
  *
  * The reference leans on PostgreSQL btree indexes to make its hot joins
  * cheap (`record_db_models.py:257-264`); the Spark-native equivalent for
  * a fact table that is repeatedly joined on one key is bucketing: both
  * sides pre-hashed into the same number of buckets on their join key
  * means the join consumes the on-disk layout directly — NO exchange, the
  * single most expensive operator at cluster scale. `sortBy` inside each
  * bucket additionally lets sort-merge consume files without a full sort.
  * Bucket counts must match across co-joined tables; pick a count sized
  * so one bucket ≈ one task's worth of data at the target scale.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted external parquet table registered in
    * the session catalog (bucketing metadata lives in the catalog, which
    * is why this is `saveAsTable` and not a bare path write). */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** [[writeBucketed]] unless the layout already exists — the production
    * shape: a bucketed layout is built ONCE and consumed by every
    * subsequent join, so repeat queries must not pay (or re-time) the
    * build. Data on disk but missing from this session's (in-memory)
    * catalog is re-REGISTERED via DDL — the bucket spec lives in the
    * catalog, the bytes stay where they are. Inputs here are immutable
    * testdata keyed into the path, so existence is the correct check. */
  def ensureBucketed(df: DataFrame, name: String, path: String,
                     key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataPresent = hfs.exists(p) &&
      hfs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    if (!dataPresent) {
      writeBucketed(df, name, path, key, buckets)
    } else if (!spark.catalog.tableExists(name)) {
      spark.sql(s"""CREATE TABLE $name (${df.schema.toDDL}) USING parquet
                   |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
                   |LOCATION '$path'""".stripMargin)
    }
  }
}
