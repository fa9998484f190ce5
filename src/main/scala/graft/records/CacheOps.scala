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
}
