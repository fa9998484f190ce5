package graft.records

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Access-log geo enrichment (`qcfractal/components/serverinfo/socket.py:215-280`):
  * the reference periodically resolves each access row's ip against a
  * maxmind city db and stores (country_code, subdivision) on the row,
  * which the server-stats summaries then group by
  * (`serverinfo/db_models.py:53-54`). The engine-side equivalent is a
  * lookup-table ENRICHMENT JOIN: a geo table of [ip_lo, ip_hi] →
  * (country_code, subdivision) ranges joined onto the access stream.
  *
  * Scale shape: a raw range join against millions of maxmind ranges is
  * a nested-loop — the wrong plan at 100 TB of access rows. Instead the
  * range table is SPLIT AT FIXED PREFIX BOUNDARIES once at load time
  * ([[splitByPrefix]]; ranges are CIDR-derived, so the blowup is a
  * small constant) and the enrichment becomes a broadcast HASH join on
  * the prefix with the range bounds as a residual filter — one codegen'd
  * probe per access row, zero shuffle of the access side (plan-pinned
  * in PlanSpec).
  */
object AccessGeo {

  /** Split each [ip_lo, ip_hi] range at 2^(32-prefixBits) boundaries so
    * every output row lies within ONE prefix bucket: (prefix, lo, hi,
    * ...attrs). Run once when the geo table is loaded; the result is the
    * broadcast side of [[geoEnrich]]. */
  def splitByPrefix(geo: DataFrame, prefixBits: Int = 16): DataFrame = {
    val shift = 32 - prefixBits
    geo
      .withColumn("prefix",
        explode(sequence(shiftright(col("ip_lo"), shift),
          shiftright(col("ip_hi"), shift))))
      .withColumn("lo", greatest(col("ip_lo"), col("prefix") * (1L << shift)))
      .withColumn("hi", least(col("ip_hi"), (col("prefix") + 1) * (1L << shift) - 1))
      .drop("ip_lo", "ip_hi")
  }

  /** Left-enrich `accesses` with the prefix-split geo table's attribute
    * columns: equi-join on the ip's prefix (broadcast hash), range
    * bounds as the residual condition. Rows no range covers keep NULL
    * geo attributes, exactly like the reference's failed lookups. */
  def geoEnrich(accesses: DataFrame, ip: Column, prefixedGeo: DataFrame,
                prefixBits: Int = 16): DataFrame = {
    val shift = 32 - prefixBits
    val probe = accesses.withColumn("__ip", ip)
    probe.join(broadcast(prefixedGeo),
        shiftright(probe.col("__ip"), shift) === prefixedGeo.col("prefix") &&
          probe.col("__ip") >= prefixedGeo.col("lo") &&
          probe.col("__ip") <= prefixedGeo.col("hi"),
        "left")
      .drop("prefix", "lo", "hi", "__ip")
  }
}
