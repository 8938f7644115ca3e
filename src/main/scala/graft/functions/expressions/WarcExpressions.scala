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
  * claims).
  *
  * DOCUMENTED CONFLATION (advisor r19): the over-bound case maps to
  * the SAME NULL as corruption, so a q187 consumer cannot distinguish
  * a bombed/oversized child sitemap from a corrupt one — acceptable
  * because 256 MiB sits 5x above the 50 MB sitemap cap (a legitimate
  * child can never hit it) and the loss is one child's entries, not a
  * job. If per-cause child-loss accounting ever matters, return a
  * typed (bytes, err) struct like [[HttpPayload]] does. */
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

/** HTTP-layer payload decode for WARC response records (RFC 9112 —
  * the message framing Common Crawl captures actually carry): a
  * `WARC-Type: response` payload is a full HTTP/1.x message, so before
  * any extractor can read the entity the engine must (1) split the
  * status line + header block, (2) undo `Transfer-Encoding: chunked`
  * (hex-size chunk walk with extension and trailer tolerance), and
  * (3) undo `Content-Encoding: gzip`/`deflate` (whole-entity inflate,
  * zlib-wrapped or raw — broken servers ship both deflate variants,
  * so the zlib attempt falls back to raw). Without this rung, an
  * extractor reads chunk framing bytes or compressed octets (the r19
  * verdict's gap #2).
  *
  * Contract (same degrade discipline as [[WarcRecords]]):
  *   - input that does not start with `HTTP/` passes through as the
  *     body (warcinfo warc-fields, WET conversion text, `resource`
  *     records) with NULL status — non-HTTP payloads flow to the
  *     extractor unchanged;
  *   - malformed framing degrades to a typed error, never a job
  *     failure: `bad_http` (no header terminator), `bad_chunk`
  *     (malformed size line, truncated chunk data, missing CRLF),
  *     `bad_gzip` / `bad_deflate` (corrupt entity stream),
  *     `gzip_too_large` (inflate bound [[WarcRecords.MAX_INFLATE]] —
  *     the same bomb-degrade contract), `unsupported_encoding`
  *     (`br`, compress, …: undecodable → NULL body, typed);
  *   - a valid `Content-Length` on an identity body cuts the body to
  *     that many octets when the capture carries more (trailing
  *     separator artifacts); a SHORTER capture keeps what exists —
  *     truncated captures are data, not errors.
  *
  * Output struct: (status INT, ctype STRING, body BINARY, err STRING).
  * One imperative pass per row over the record's own bytes — pure map,
  * zero exchanges, composes with the container walk in one projection.
  */
case class HttpPayload(child: Expression,
    maxInflate: Long = WarcRecords.MAX_INFLATE)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"http_payload requires binary input, got ${t.sql}")
  }
  override def dataType: DataType = HttpPayload.OUT_TYPE
  override def prettyName: String = "http_payload"
  override def nullSafeEval(input: Any): Any =
    HttpPayload.parse(input.asInstanceOf[Array[Byte]], maxInflate)
  override protected def withNewChildInternal(newChild: Expression): HttpPayload =
    copy(child = newChild)
}

object HttpPayload {
  /** `encoding` is the lowercased Content-Encoding actually undone (or
    * attempted), NULL for identity — corpus indexes (Common Crawl's
    * CDX) store it per record, and it tells a consumer which records'
    * FRAMED lengths are compressor-dependent. */
  val OUT_TYPE: StructType = StructType(Seq(
    StructField("status", IntegerType),
    StructField("ctype", StringType),
    StructField("encoding", StringType),
    StructField("body", BinaryType),
    StructField("err", StringType)))

  private val STATUS_RE =
    Pattern.compile("^HTTP/\\d\\.\\d[ \\t]+(\\d{3})")
  private val TE_RE = Pattern.compile(
    "(?mi)^Transfer-Encoding:[ \\t]*([^\\r\\n]*?)[ \\t]*\\r?$")
  private val CE_RE = Pattern.compile(
    "(?mi)^Content-Encoding:[ \\t]*([^\\r\\n]*?)[ \\t]*\\r?$")
  private val CT_RE = Pattern.compile(
    "(?mi)^Content-Type:[ \\t]*([^\\r\\n]*?)[ \\t]*\\r?$")
  private val CL_RE = Pattern.compile(
    "(?mi)^Content-Length:[ \\t]*([0-9]{1,18})[ \\t]*\\r?$")

  private def field(re: Pattern, hdr: String): String = {
    val m = re.matcher(hdr)
    if (m.find()) m.group(1) else ""
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def out(status: java.lang.Integer, ctype: String,
      encoding: String, body: Array[Byte], err: String): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        if (status == null) null else status.intValue(),
        utf8(ctype), utf8(encoding), body, utf8(err)))

  /** Dechunk an RFC 9112 §7.1 chunked body starting at `from`: hex
    * size line (chunk extensions past `;` ignored), CRLF, data, CRLF,
    * repeated until the zero chunk; trailer section tolerated (skipped
    * to end — the WARC record is already length-delimited, so nothing
    * follows that we must account for). Returns null on any framing
    * violation (the caller maps that to `bad_chunk`). */
  private def dechunk(bytes: Array[Byte], from: Int): Array[Byte] = {
    val outB = new java.io.ByteArrayOutputStream(1 << 12)
    var pos = from
    while (true) {
      // size line: hex digits, optional ;extensions, CRLF
      var i = pos
      while (i < bytes.length && bytes(i) != '\r' && bytes(i) != '\n') i += 1
      if (i + 1 >= bytes.length || bytes(i) != '\r' || bytes(i + 1) != '\n')
        return null
      val line = new String(bytes, pos, i - pos,
        java.nio.charset.StandardCharsets.US_ASCII)
      val hexPart = line.split(";", 2)(0).trim
      if (hexPart.isEmpty || hexPart.length > 15 ||
        !hexPart.forall(c => Character.digit(c, 16) >= 0)) return null
      val size = java.lang.Long.parseLong(hexPart, 16)
      pos = i + 2
      if (size == 0) return outB.toByteArray // trailers (if any) ignored
      if (size > bytes.length - pos) return null // truncated chunk data
      outB.write(bytes, pos, size.toInt)
      pos += size.toInt
      if (pos + 1 >= bytes.length || bytes(pos) != '\r' ||
        bytes(pos + 1) != '\n') return null // data must end CRLF
      pos += 2
    }
    null // unreachable
  }

  /** Whole-entity inflate. `raw = false` expects RFC 1952 gzip (via
    * GZIPInputStream — multi-member tolerant); `raw = true` handles
    * Content-Encoding: deflate, trying RFC 1950 zlib first and bare
    * deflate on failure. Returns Right(bytes) or Left(typed error). */
  private def inflateEntity(bytes: Array[Byte], gzip: Boolean,
      maxInflate: Long): Either[String, Array[Byte]] = {
    // stream construction happens INSIDE the try: GZIPInputStream's
    // constructor reads (and can refute) the member header eagerly
    def run(mk: () => java.io.InputStream): Either[String, Array[Byte]] = {
      var in: java.io.InputStream = null
      try {
        in = mk()
        val outB = new java.io.ByteArrayOutputStream(1 << 12)
        val buf = new Array[Byte](1 << 13)
        var n = in.read(buf)
        while (n >= 0) {
          if (outB.size().toLong + n > maxInflate)
            return Left("gzip_too_large")
          outB.write(buf, 0, n)
          n = in.read(buf)
        }
        Right(outB.toByteArray)
      } catch {
        case _: java.io.IOException =>
          Left(if (gzip) "bad_gzip" else "bad_deflate")
      } finally if (in != null) in.close()
    }
    if (gzip)
      run(() => new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    else
      run(() => new java.util.zip.InflaterInputStream(
        new java.io.ByteArrayInputStream(bytes))) match {
        case Left("bad_deflate") =>
          // bare deflate (the historically common server bug)
          run(() => new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(bytes),
            new Inflater(true)))
        case r => r
      }
  }

  def parse(bytes: Array[Byte], maxInflate: Long = WarcRecords.MAX_INFLATE)
      : InternalRow = {
    // non-HTTP payloads pass through whole (warcinfo, WET conversion)
    val isHttp = bytes.length >= 5 && bytes(0) == 'H' && bytes(1) == 'T' &&
      bytes(2) == 'T' && bytes(3) == 'P' && bytes(4) == '/'
    if (!isHttp) return out(null, null, null, bytes, null)
    val blank = {
      var i = 0
      val end = bytes.length - 3
      var found = -1
      while (found < 0 && i <= end) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') found = i
        i += 1
      }
      found
    }
    if (blank < 0) return out(null, null, null, null, "bad_http")
    val hdr = new String(bytes, 0, blank,
      java.nio.charset.StandardCharsets.UTF_8)
    val statusStr = field(STATUS_RE, hdr)
    if (statusStr.isEmpty) return out(null, null, null, null, "bad_http")
    val status = java.lang.Integer.valueOf(statusStr)
    val ctype0 = field(CT_RE, hdr)
    val ctype = if (ctype0.isEmpty) null else ctype0
    val te = field(TE_RE, hdr).toLowerCase
    val ce = field(CE_RE, hdr).toLowerCase
    val bodyStart = blank + 4
    var body = java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)
    val enc = if (ce.isEmpty || ce == "identity") null else ce
    if (te.contains("chunked")) {
      val de = dechunk(bytes, bodyStart)
      if (de == null) return out(status, ctype, enc, null, "bad_chunk")
      body = de
    } else {
      // identity framing: a valid Content-Length CUTS trailing capture
      // artifacts; a shorter capture keeps what exists (truncation is
      // data, not an error — the WARC walk already delimited the record)
      val cl = field(CL_RE, hdr)
      if (cl.nonEmpty) {
        val n = cl.toLong
        if (n < body.length) body = java.util.Arrays.copyOf(body, n.toInt)
      }
    }
    ce match {
      case "" | "identity" => out(status, ctype, enc, body, null)
      case "gzip" | "x-gzip" =>
        inflateEntity(body, gzip = true, maxInflate) match {
          case Right(b) => out(status, ctype, enc, b, null)
          case Left(e) => out(status, ctype, enc, null, e)
        }
      case "deflate" =>
        inflateEntity(body, gzip = false, maxInflate) match {
          case Right(b) => out(status, ctype, enc, b, null)
          case Left(e) => out(status, ctype, enc, null, e)
        }
      case _ => out(status, ctype, enc, null, "unsupported_encoding")
    }
  }
}

/** RFC 1950 zlib of a binary column — the fixture-side compressor for
  * `Content-Encoding: deflate` HTTP bodies (the decode under test never
  * sees the compressor, only the format; oracles rebuild the DECODED
  * content generatively and never read compressed bytes). */
case class ZlibCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"zlib_compress requires binary input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zlib_compress"
  override def nullSafeEval(input: Any): Any = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(input.asInstanceOf[Array[Byte]])
    d.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): ZlibCompress =
    copy(child = newChild)
}
