package graft.functions.expressions

import java.util.regex.Pattern
import java.util.zip.{DataFormatException, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-domain WARC container walk (ISO 28500 / WARC 1.0-1.1, public
  * spec) as a native Catalyst expression — the production replacement
  * for the earlier string-domain staged-projection walk, which was
  * exact only for single-byte payload encodings and re-materialized the
  * container remainder once per record (O(maxRecords × container)
  * string work). This walk is what a real crawl file needs:
  *
  *   - `Content-Length` counts OCTETS (the spec's definition), so a
  *     record whose payload holds multi-byte UTF-8 cuts at the byte
  *     boundary the header names — a character-count cut would misalign
  *     every subsequent record in the container;
  *   - per-record gzip members (RFC 1952): real Common Crawl ships
  *     `.warc.gz` — each record individually deflate-compressed, members
  *     concatenated. A member is detected by its magic at the cursor,
  *     inflated with [[Inflater]] (raw, after a manual RFC 1952 header
  *     walk so the CONSUMED input length is exact — `GZIPInputStream`
  *     buffers ahead and cannot report it), ISIZE-checked, and must
  *     contain exactly one record (WARC 1.1 §annex D record-at-a-time
  *     compression; trailing non-whitespace is the typed `gzip_residue`
  *     error, never silently dropped);
  *   - the same typed error taxonomy as before (`bad_magic`,
  *     `truncated_header`, `no_length`, `truncated_payload`, plus
  *     `bad_gzip`/`gzip_residue`/`gzip_too_large`) with a halt — a
  *     reader cannot resync safely without a trustworthy length.
  *
  * One cursor pass per container, zero per-step re-materialization.
  * `CodegenFallback` is deliberate: the body is a per-row parser over
  * kilobyte-to-megabyte blobs — codegen would inline nothing useful,
  * and the expression sits in a projection whose neighbours still
  * compile (custom-operator ladder step (b), SURVEY §4.2).
  *
  * 100 TB shape: reference semantics from `reference/index.js:70` (a
  * container byte stream splits into records before any per-record
  * work); here each whole-file binary row (`binaryFile` source or a
  * fixture column) parses independently — embarrassingly parallel,
  * zero exchanges.
  */
case class WarcRecords(child: Expression, maxRecords: Int,
    maxInflate: Long = WarcRecords.MAX_INFLATE)
    extends UnaryExpression with CodegenFallback {
  require(maxRecords > 0, "maxRecords must be positive")
  require(maxInflate > 0, "maxInflate must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"warc_records requires a binary container, got ${t.sql}")
  }
  override def dataType: DataType = WarcRecords.OUT_TYPE
  override def prettyName: String = "warc_records"

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[Array[Byte]], maxRecords, maxInflate)

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {
  val REC_TYPE: StructType = StructType(Seq(
    StructField("typ", StringType),
    StructField("rid", StringType),
    StructField("uri", StringType),
    StructField("clen", LongType),
    StructField("payload", BinaryType),
    StructField("gzipped", BooleanType),
    StructField("ok", BooleanType),
    StructField("err", StringType)))

  val OUT_TYPE: StructType = StructType(Seq(
    StructField("records", ArrayType(REC_TYPE, containsNull = false)),
    StructField("leftover_bytes", LongType)))

  /** Inflated-output bound per gzip member (and for [[GunzipBytes]]'s
    * whole-stream inflate): 256 MiB — far above any sane WARC record,
    * far below executor memory, so a crafted ~1000:1 deflate bomb
    * degrades to the typed `gzip_too_large` error instead of an OOM. */
  val MAX_INFLATE: Long = 256L << 20

  // header-field patterns — identical semantics to the string walk's
  // regexp_extract calls (case-insensitive names, single-token values,
  // tolerated trailing CR under (?m))
  private val TYPE_RE = Pattern.compile("(?mi)^WARC-Type:[ \\t]*(\\S+)[ \\t]*\\r?$")
  private val RID_RE = Pattern.compile("(?mi)^WARC-Record-ID:[ \\t]*(\\S+)[ \\t]*\\r?$")
  private val URI_RE = Pattern.compile("(?mi)^WARC-Target-URI:[ \\t]*(\\S+)[ \\t]*\\r?$")
  // Content-Length digits capped at 18 so the Long parse can never
  // overflow — that admits every spec-plausible length (a 10^18-octet
  // record does not exist; >= 19 digits stays a header-parse error,
  // `no_length`). A valid in-range length larger than the container's
  // remaining bytes (including anything past 2 GiB, since a container
  // row is an Int-indexed array) reports as `truncated_payload` via the
  // avail check below — the r18 9-digit cap misfiled >= 1 GB lengths
  // as `no_length` (advisor-found).
  private val CLEN_RE = Pattern.compile("(?mi)^Content-Length:[ \\t]*([0-9]{1,18})[ \\t]*\\r?$")

  private def field(re: Pattern, hdr: String): String = {
    val m = re.matcher(hdr)
    if (m.find()) m.group(1) else ""
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** One parsed record; `consumed` < 0 signals a halt AFTER emitting
    * the record (errors always halt — same contract as the string
    * walk's `next = ""`). */
  private final case class Step(rec: InternalRow, consumed: Int)

  // absent header fields are '' on parsed-header records (the
  // regexp_extract contract of the historical string walk) and NULL
  // only on pre-header errors (bad_magic/truncated_header/bad_gzip),
  // where the caller passes explicit nulls
  private def errRec(typ: String, rid: String, uri: String,
      clen: java.lang.Long, payload: Array[Byte], gzipped: Boolean,
      err: String): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](utf8(typ), utf8(rid), utf8(uri),
        if (clen == null) null else clen.longValue(),
        payload, gzipped, false, utf8(err)))

  private def okRec(typ: String, rid: String, uri: String, clen: Long,
      payload: Array[Byte], gzipped: Boolean): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](utf8(typ), utf8(rid), utf8(uri),
        clen, payload, gzipped, true, null))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0x0b

  private def allWhitespace(bytes: Array[Byte], from: Int): Boolean = {
    var i = from
    while (i < bytes.length) { if (!isWs(bytes(i))) return false; i += 1 }
    true
  }

  private def startsWith(bytes: Array[Byte], pos: Int, lit: String): Boolean = {
    if (pos + lit.length > bytes.length) return false
    var i = 0
    while (i < lit.length) {
      if (bytes(pos + i) != lit.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def findBlank(bytes: Array[Byte], from: Int): Int = {
    var i = from
    val end = bytes.length - 3
    while (i <= end) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Skip up to two CRLF pairs (the record separator; tolerate one or
    * zero so a final record without its trailer ends the walk clean). */
  private def skipSeparator(bytes: Array[Byte], pos0: Int): Int = {
    var pos = pos0
    var k = 0
    while (k < 2 && pos + 1 < bytes.length &&
      bytes(pos) == '\r' && bytes(pos + 1) == '\n') { pos += 2; k += 1 }
    pos
  }

  /** Parse one PLAIN record at `pos` of `bytes` (an uncompressed
    * container region or one inflated member). `gzipped` tags the
    * emitted record's provenance. */
  private def parsePlain(bytes: Array[Byte], pos: Int,
      gzipped: Boolean): Step = {
    if (!(startsWith(bytes, pos, "WARC/1.0\r\n") ||
        startsWith(bytes, pos, "WARC/1.1\r\n")))
      return Step(errRec(null, null, null, null, null, gzipped, "bad_magic"), -1)
    val blank = findBlank(bytes, pos)
    if (blank < 0)
      return Step(errRec(null, null, null, null, null, gzipped,
        "truncated_header"), -1)
    // WARC named headers are ASCII per spec; UTF-8 decode also covers
    // the spec's allowance for UTF-8 in header VALUES
    val hdr = new String(bytes, pos, blank - pos,
      java.nio.charset.StandardCharsets.UTF_8)
    val typ = field(TYPE_RE, hdr)
    val rid = field(RID_RE, hdr)
    val uri = field(URI_RE, hdr)
    val clenStr = field(CLEN_RE, hdr)
    if (clenStr.isEmpty)
      return Step(errRec(typ, rid, uri, null, null, gzipped, "no_length"), -1)
    val clen = clenStr.toLong
    val bodyStart = blank + 4
    val avail = bytes.length - bodyStart
    if (avail < clen) {
      val part = java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)
      return Step(errRec(typ, rid, uri, clen, part, gzipped,
        "truncated_payload"), -1)
    }
    val payload = java.util.Arrays.copyOfRange(bytes, bodyStart,
      bodyStart + clen.toInt)
    val after = skipSeparator(bytes, bodyStart + clen.toInt)
    Step(okRec(typ, rid, uri, clen, payload, gzipped), after - pos)
  }

  /** Inflate ONE RFC 1952 member at `pos` and parse the record inside
    * it. Returns the step whose `consumed` covers the member's exact
    * compressed length (header + deflate stream + 8-byte trailer). */
  private def parseGzipMember(bytes: Array[Byte], pos: Int,
      maxInflate: Long): Step = {
    def bad = Step(errRec(null, null, null, null, null, true, "bad_gzip"), -1)
    val len = bytes.length
    if (pos + 10 > len || bytes(pos + 2) != 8) return bad
    val flg = bytes(pos + 3) & 0xff
    var p = pos + 10
    try {
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > len) return bad
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (p < len && bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (p < len && bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      if (p >= len) return bad
      val inf = new Inflater(true)
      try {
        inf.setInput(bytes, p, len - p)
        val out = new java.io.ByteArrayOutputStream(1 << 12)
        val buf = new Array[Byte](1 << 13)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) {
            // deflate's max ratio is ~1032:1, so a few-KB crafted member
            // can claim gigabytes — bound the expansion so one
            // adversarial container degrades to a typed error instead of
            // OOMing the executor (the 'malformed input degrades, never
            // a job failure' contract; advisor-found r18)
            if (out.size().toLong + n > maxInflate)
              return Step(errRec(null, null, null, null, null, true,
                "gzip_too_large"), -1)
            out.write(buf, 0, n)
          }
          else if (inf.needsInput()) return bad // truncated deflate stream
        }
        val deflateLen = (len - p) - inf.getRemaining
        val trailer = p + deflateLen
        if (trailer + 8 > len) return bad // truncated CRC/ISIZE
        val inflated = out.toByteArray
        // RFC 1952 trailer: CRC32 + ISIZE (mod 2^32) — corruption that
        // still inflates cleanly must surface as the typed error, not as
        // a silently wrong payload
        val wantCrc = (bytes(trailer) & 0xffL) |
          ((bytes(trailer + 1) & 0xffL) << 8) |
          ((bytes(trailer + 2) & 0xffL) << 16) |
          ((bytes(trailer + 3) & 0xffL) << 24)
        val crc = new java.util.zip.CRC32()
        crc.update(inflated)
        if (crc.getValue != wantCrc) return bad
        val isize = (bytes(trailer + 4) & 0xffL) |
          ((bytes(trailer + 5) & 0xffL) << 8) |
          ((bytes(trailer + 6) & 0xffL) << 16) |
          ((bytes(trailer + 7) & 0xffL) << 24)
        if ((inflated.length & 0xffffffffL) != isize) return bad
        val inner = parsePlain(inflated, 0, gzipped = true)
        if (inner.consumed < 0) Step(inner.rec, -1) // inner error halts
        else if (!allWhitespace(inflated, inner.consumed))
          // a second record (or garbage) inside one member: typed error,
          // never a silent drop — record-at-a-time compression is the
          // format's contract and resync past a packed member is unsafe
          Step(errRec(null, null, null, null, null, true, "gzip_residue"), -1)
        else Step(inner.rec, (trailer + 8) - pos)
      } finally inf.end()
    } catch {
      case _: DataFormatException => bad
      case _: ArrayIndexOutOfBoundsException => bad
    }
  }

  /** The container walk: up to `maxRecords` records from `bytes`, plus
    * the unparsed byte count past the bound. Error records halt the
    * walk with leftover 0 (the string walk's `next = ""` contract);
    * whitespace-only residue is exhaustion, not a phantom record. */
  def parse(bytes: Array[Byte], maxRecords: Int,
      maxInflate: Long = MAX_INFLATE): InternalRow = {
    val recs = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var pos = 0
    var halted = false
    while (recs.size < maxRecords && !halted && pos < bytes.length &&
        !allWhitespace(bytes, pos)) {
      val step =
        if (pos + 1 < bytes.length && bytes(pos) == 0x1f.toByte &&
          bytes(pos + 1) == 0x8b.toByte) {
          val s = parseGzipMember(bytes, pos, maxInflate)
          // after a member, tolerate stray separator CRLFs before the
          // next record (same tolerance as the plain path)
          if (s.consumed > 0) s.copy(consumed =
            skipSeparator(bytes, pos + s.consumed) - pos)
          else s
        } else parsePlain(bytes, pos, gzipped = false)
      recs += step.rec
      if (step.consumed < 0) halted = true else pos += step.consumed
    }
    val leftover =
      if (halted || allWhitespace(bytes, pos)) 0L
      else (bytes.length - pos).toLong
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(recs.toArray[Any]), leftover))
  }
}

/** RFC 1952 gzip of a binary column — the fixture-side compressor for
  * the WARC gzip-member and compressed-JSONL containers (the walk under
  * test never sees the compressor, only the format). Deterministic
  * within a JVM (zlib default level); oracles never read the compressed
  * bytes, only the decoded content rebuilt generatively. */
case class GzipCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gzip_compress requires binary input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_compress"
  override def nullSafeEval(input: Any): Any = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(input.asInstanceOf[Array[Byte]])
    g.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
}

/** Inflate a whole gzip stream (all concatenated members — the
  * `.jsonl.gz` container shape) to its decompressed bytes; NULL on a
  * corrupt stream so a broken container degrades to typed per-container
  * accounting instead of failing the job. Pass-through for input that
  * does not start with the gzip magic (mixed-compression corpora).
  * Output is bounded at [[WarcRecords.MAX_INFLATE]] — a crafted
  * ~1000:1 deflate bomb degrades to NULL (the same typed-degrade path
  * as corruption) instead of OOMing the executor (advisor-found r18;
  * the unbounded `readAllBytes` would buffer whatever the stream
  * claims). */
case class GunzipBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gunzip requires binary input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip"
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      bytes
    else
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val out = new java.io.ByteArrayOutputStream(1 << 12)
          val buf = new Array[Byte](1 << 13)
          var n = in.read(buf)
          while (n >= 0) {
            if (out.size().toLong + n > WarcRecords.MAX_INFLATE) return null
            out.write(buf, 0, n)
            n = in.read(buf)
          }
          out.toByteArray
        } finally in.close()
      } catch { case _: java.io.IOException => null }
  }
  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}
