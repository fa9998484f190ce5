package graft.functions

import com.github.luben.zstd.Zstd
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** F11/S6 — compressed blob columns (`qcportal/qcportal/compression.py:
  * 1-30`; blob storage `qcfractal/qcfractal/components/record_db_models.py:
  * 87-115`): all outputs/wavefunctions in the reference are
  * zstd-compressed BYTEA. Spark-side these are `BinaryType` columns; the
  * codec runs in a UDF strictly at the edges (ingest/egress) — SURVEY §2.8
  * F11 declares the UDF acceptable here because compression is IO-bound
  * boundary work, never part of a query's hot path. zstd frames embed the
  * content size, so no side-channel length column is needed. */
object Codec {

  val zstdCompress: Column => Column = {
    val f = udf((s: String) =>
      if (s == null) null else Zstd.compress(s.getBytes("UTF-8"), 3))
    c => f(c)
  }

  val zstdDecompressToString: Column => Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else new String(Zstd.decompress(b, Zstd.getFrameContentSize(b).toInt), "UTF-8"))
    c => f(c)
  }
}
