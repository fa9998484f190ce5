package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S3 (second half) — msgpack wire format. The reference content-negotiates
  * JSON *and* msgpack request/response bodies
  * (`qcportal/qcportal/serialization.py:48-70`: `msgpack.dumps(...,
  * use_bin_type=True)` with numpy arrays flattened via `ravel().tolist()`,
  * `:73-84`), and compute-manager payloads default to msgpack. This module
  * implements the msgpack spec subset those bodies use — nil/bool/int
  * family/float64/str/bin/array/map — in pure Scala, as a declared UDF edge
  * (the same policy as the zstd codec in [[graft.functions.Codec]]): decode
  * ONCE at ingest into columnar types, never store packed bytes in the
  * query path.
  *
  * Scale shape: pack/unpack are per-row narrow transforms (no shuffle); the
  * decoded body goes through `from_json` with an explicit schema, so the
  * downstream plan is ordinary columnar Spark — msgpack never appears past
  * the ingest edge.
  */
object Msgpack {

  /** Decoded msgpack map, wire order preserved (distinct from arrays —
    * erasure would otherwise confuse Vector[(k,v)] with Vector[Any]). */
  final case class MsgMap(entries: Vector[(String, Any)])

  // ---------------------------------------------------------------- encode

  /** Encode a value as msgpack (spec-conformant, smallest-width ints,
    * `use_bin_type` behavior: strings → str family, bytes → bin family). */
  def pack(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private[sources] def writeBE(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit = {
    var i = bytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  // low-level emitters, shared with the native [[MsgpackFromStruct]]
  // expression — byte behavior is THE contract (format pins in MsgpackSpec)

  private[sources] def writeIntVal(out: ByteArrayOutputStream, n: Long): Unit =
    if (n >= 0) {
      if (n < 0x80L) out.write(n.toInt)
      else if (n <= 0xffL) { out.write(0xcc); writeBE(out, n, 1) }
      else if (n <= 0xffffL) { out.write(0xcd); writeBE(out, n, 2) }
      else if (n <= 0xffffffffL) { out.write(0xce); writeBE(out, n, 4) }
      else { out.write(0xcf); writeBE(out, n, 8) }
    } else {
      if (n >= -32L) out.write((0xe0 | (n + 32)).toInt)
      else if (n >= -128L) { out.write(0xd0); writeBE(out, n, 1) }
      else if (n >= -32768L) { out.write(0xd1); writeBE(out, n, 2) }
      else if (n >= Int.MinValue.toLong) { out.write(0xd2); writeBE(out, n, 4) }
      else { out.write(0xd3); writeBE(out, n, 8) }
    }

  private[sources] def writeF64(out: ByteArrayOutputStream, d: Double): Unit = {
    out.write(0xcb); writeBE(out, java.lang.Double.doubleToLongBits(d), 8)
  }

  private[sources] def writeStrBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    if (b.length < 32) out.write(0xa0 | b.length)
    else if (b.length < 256) { out.write(0xd9); writeBE(out, b.length.toLong, 1) }
    else if (b.length < 65536) { out.write(0xda); writeBE(out, b.length.toLong, 2) }
    else { out.write(0xdb); writeBE(out, b.length.toLong, 4) }
    out.write(b)
  }

  private[sources] def writeBinBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    if (b.length < 256) { out.write(0xc4); writeBE(out, b.length.toLong, 1) }
    else if (b.length < 65536) { out.write(0xc5); writeBE(out, b.length.toLong, 2) }
    else { out.write(0xc6); writeBE(out, b.length.toLong, 4) }
    out.write(b)
  }

  private[sources] def writeArrHeader(out: ByteArrayOutputStream, n: Int): Unit =
    if (n < 16) out.write(0x90 | n)
    else if (n < 65536) { out.write(0xdc); writeBE(out, n.toLong, 2) }
    else { out.write(0xdd); writeBE(out, n.toLong, 4) }

  private[sources] def writeMapHeader(out: ByteArrayOutputStream, n: Int): Unit =
    if (n < 16) out.write(0x80 | n)
    else if (n < 65536) { out.write(0xde); writeBE(out, n.toLong, 2) }
    else { out.write(0xdf); writeBE(out, n.toLong, 4) }

  private def write(out: ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case n: Byte => writeIntVal(out, n.toLong)
    case n: Short => writeIntVal(out, n.toLong)
    case n: Int => writeIntVal(out, n.toLong)
    case n: Long => writeIntVal(out, n)
    case f: Float => writeF64(out, f.toDouble) // float64 on the wire, like the reference
    case d: Double => writeF64(out, d)
    case d: java.math.BigDecimal => writeF64(out, d.doubleValue)
    case d: BigDecimal => writeF64(out, d.doubleValue)
    case ts: java.sql.Timestamp => // ISO-8601 UTC string, like the JSON edge
      write(out, java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
        .format(ts.toInstant.atOffset(java.time.ZoneOffset.UTC)))
    case dt: java.sql.Date => write(out, dt.toString)
    case s: String => writeStrBytes(out, s.getBytes(UTF_8))
    case b: Array[Byte] => writeBinBytes(out, b)
    case xs: Seq[_] =>
      writeArrHeader(out, xs.length)
      xs.foreach(write(out, _))
    case m: scala.collection.Map[_, _] =>
      writeMapHeader(out, m.size)
      m.foreach { case (k, x) => write(out, k); write(out, x) }
    case MsgMap(entries) =>
      writeMapHeader(out, entries.length)
      entries.foreach { case (k, x) => write(out, k); write(out, x) }
    case r: Row => // struct → map in declared field order
      val fields = r.schema.fieldNames
      writeMapHeader(out, fields.length)
      var i = 0
      while (i < fields.length) { write(out, fields(i)); write(out, r.get(i)); i += 1 }
    case other =>
      throw new IllegalArgumentException(s"msgpack: unsupported ${other.getClass}")
  }

  // ---------------------------------------------------------------- decode

  /** Decode one msgpack value. Ints → Long, floats → Double, maps →
    * [[MsgMap]] preserving wire order. Truncated or malformed bodies get
    * a diagnosable error instead of a bare buffer underflow. */
  def unpack(bytes: Array[Byte]): Any =
    try read(ByteBuffer.wrap(bytes))
    catch {
      case _: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException(
          s"msgpack: truncated body (${bytes.length} bytes)")
    }

  private def read(b: ByteBuffer): Any = {
    val t = b.get() & 0xff
    t match {
      case x if x < 0x80 => x.toLong // positive fixint
      case x if x >= 0xe0 => (x - 256).toLong // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(b, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => readArr(b, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(b, x & 0x1f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => readBin(b, readUint(b, 1).toInt)
      case 0xc5 => readBin(b, readUint(b, 2).toInt)
      case 0xc6 => readBin(b, readUint(b, 4).toInt)
      case 0xca => b.getFloat.toDouble
      case 0xcb => b.getDouble
      case 0xcc => readUint(b, 1)
      case 0xcd => readUint(b, 2)
      case 0xce => readUint(b, 4)
      case 0xcf => b.getLong // uint64 surfaced as signed long (ids fit)
      case 0xd0 => b.get().toLong
      case 0xd1 => b.getShort.toLong
      case 0xd2 => b.getInt.toLong
      case 0xd3 => b.getLong
      case 0xd9 => readStr(b, readUint(b, 1).toInt)
      case 0xda => readStr(b, readUint(b, 2).toInt)
      case 0xdb => readStr(b, readUint(b, 4).toInt)
      case 0xdc => readArr(b, readUint(b, 2).toInt)
      case 0xdd => readArr(b, readUint(b, 4).toInt)
      case 0xde => readMap(b, readUint(b, 2).toInt)
      case 0xdf => readMap(b, readUint(b, 4).toInt)
      case other => throw new IllegalArgumentException(f"msgpack: bad type byte 0x$other%02x")
    }
  }

  private def readUint(b: ByteBuffer, bytes: Int): Long = {
    var v = 0L; var i = 0
    while (i < bytes) { v = (v << 8) | (b.get() & 0xffL); i += 1 }
    v
  }
  // a corrupted length prefix must fail cleanly, not allocate gigabytes
  // or throw NegativeArraySizeException: every declared length is bounded
  // by the remaining body (each element/entry needs >= 1 byte)
  private def checkLen(b: ByteBuffer, n: Int, what: String): Unit =
    if (n < 0 || n > b.remaining())
      throw new IllegalArgumentException(
        s"msgpack: corrupt $what length $n with ${b.remaining()} bytes remaining")
  private def readStr(b: ByteBuffer, n: Int): String = {
    checkLen(b, n, "str")
    val a = new Array[Byte](n); b.get(a); new String(a, UTF_8)
  }
  private def readBin(b: ByteBuffer, n: Int): Array[Byte] = {
    checkLen(b, n, "bin")
    val a = new Array[Byte](n); b.get(a); a
  }
  private def readArr(b: ByteBuffer, n: Int): Vector[Any] = {
    checkLen(b, n, "array")
    Vector.fill(n)(read(b))
  }
  private def readMap(b: ByteBuffer, n: Int): MsgMap = {
    checkLen(b, n, "map")
    MsgMap(Vector.fill(n)(read(b) match {
      case k: String => k -> read(b)
      case k => k.toString -> read(b)
    }))
  }

  // ------------------------------------------------------------- json view

  /** Render a decoded msgpack value as JSON so `from_json` + an explicit
    * schema does the typed columnar conversion (the same "schema declared,
    * never inferred" policy as [[JsonTables]]). */
  def toJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Long => n.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null" else d.toString
    case s: String => jsonQuote(s)
    case b: Array[Byte] => jsonQuote(java.util.Base64.getEncoder.encodeToString(b))
    case MsgMap(entries) =>
      entries.map { case (k, x) => jsonQuote(k) + ":" + toJson(x) }
        .mkString("{", ",", "}")
    case xs: Vector[_] => xs.map(toJson).mkString("[", ",", "]")
    case other => throw new IllegalArgumentException(s"msgpack→json: ${other.getClass}")
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  // ------------------------------------------------------------ spark edge

  /** struct column → msgpack body (one blob per row), via the native
    * [[MsgpackFromStruct]] expression — byte-identical to the original
    * `Row` UDF edge (MsgpackSpec encode-parity sweep), without the
    * catalyst→external conversion per row. */
  val packStruct: Column => Column = c => MsgpackFromStruct(c)

  /** The original UDF edge over an external `Row`, kept as the parity
    * reference for MsgpackSpec (and as the escape hatch for struct types
    * [[MsgpackToStruct.supports]] excludes). */
  val packStructRowUdf: Column => Column = {
    val f = udf((r: Row) => pack(r))
    c => f(c)
  }

  /** msgpack body → JSON string (feed into `from_json` with a schema). */
  val unpackToJson: Column => Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else toJson(unpack(b)))
    c => f(c)
  }

  /** Ingest a msgpack-body column into typed columns: decode once at the
    * edge with the DECLARED schema (malformed bodies yield null rows;
    * callers that need hard failure can assert on that). Schemas the
    * native [[MsgpackToStruct]] expression supports decode in ONE pass
    * from wire bytes to `InternalRow`; anything else takes the original
    * two-step edge (generic decode → JSON render → `from_json`). */
  def readMsgpack(df: DataFrame, bodyCol: Column, schema: StructType): DataFrame =
    if (MsgpackToStruct.supports(schema))
      df.select(MsgpackToStruct(bodyCol, schema).as("__r")).select(col("__r.*"))
    else
      df.select(from_json(unpackToJson(bodyCol), schema).as("__r")).select(col("__r.*"))

  def readMsgpack(df: DataFrame, bodyCol: Column, ddl: String): DataFrame =
    readMsgpack(df, bodyCol, StructType.fromDDL(ddl))
}
