package graft.records

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S5 — client record cache (`qcportal/qcportal/cache.py:53-239`): a
  * read-through cache keyed by record id whose staleness test is the
  * server's `modified_on` (`qcportal/qcportal/dataset_models.py:
  * 1443-1463` compares local vs server timestamps and refetches only
  * stale or missing records).
  *
  * Spark shape: the cache is a table; a refresh is two joins — never a
  * per-record RPC loop. Rows whose cached version is current are NOT
  * refetched (the whole point of the cache); only stale/missing keys take
  * the server row. */
object CacheOps {

  /** Merge a cache table with the server table: returns the refreshed
    * cache. `version` is the staleness column (modified_on). Cached rows
    * absent from the server are kept (the reference's cache keeps
    * locally-known records too). */
  def refresh(cache: DataFrame, server: DataFrame,
              key: String, version: String): DataFrame = {
    val cachedVersions = cache.select(col(key), col(version).as("__cached_ver"))
    val stale = server.join(cachedVersions, Seq(key), "left")
      .filter(col("__cached_ver").isNull || col(version) > col("__cached_ver"))
      .drop("__cached_ver")
    val current = cache.join(stale.select(col(key)), Seq(key), "left_anti")
    current.unionByName(stale)
  }

  /** Write-back merge (`qcportal/qcportal/cache.py:159-173`
    * `writeback_record`): an incoming row replaces the cached row UNLESS
    * the cached one is strictly newer, or same-version and strictly
    * larger — i.e. per key the winner is max by (version, payload size,
    * incoming-wins-ties). One `max_by` hash aggregate with map-side
    * partial combine — no window sort, no per-record statement loop. */
  def writeBack(cache: DataFrame, updates: DataFrame,
                key: String, version: String, payload: String): DataFrame = {
    val all = cache.withColumn("__upd", lit(0))
      .unionByName(updates.withColumn("__upd", lit(1)))
    val dataCols = all.columns.filterNot(_ == key).toSeq
    all.groupBy(col(key))
      .agg(max_by(struct(dataCols.map(col): _*),
        struct(col(version), length(col(payload)), col("__upd"))).as("__row"))
      .select(col(key) +: dataCols.filterNot(_ == "__upd")
        .map(c => col(s"__row.$c")): _*)
  }

  /** Eviction (`cache.py:175-188` `delete_records`): drop the given keys.
    * The id list rides a broadcast anti-join — the cache itself is never
    * shuffled. */
  def evict(cache: DataFrame, ids: DataFrame, key: String): DataFrame =
    cache.join(broadcast(ids), Seq(key), "left_anti")
}
