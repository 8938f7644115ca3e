package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC container walk semantics: well-formed multi-record parse,
  * marker-in-payload immunity, every typed malformation, the WET record
  * shape, and the maxRecords overflow surface. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(typ: String, payload: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:test:$typ>\r\n" +
      extra + s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  /** Parse a literal container; returns (typ, uri, clen, payload, ok, err)
    * per record plus the leftover char count. */
  private def parse(container: String, maxRecords: Int = 6)
      : (Seq[(String, String, Option[Long], String, Boolean, String)], Long) = {
    val df = Warc.warcRecordsRel(
      Seq((1L, container)).toDF("gid", "c"), col("c"), maxRecords, Seq("gid"))
    val row = df.select(col("records"), col("leftover_chars")).head
    val recs = row.getSeq[Row](0).map(r => (
      r.getAs[String]("typ"), r.getAs[String]("uri"),
      Option(r.getAs[java.lang.Long]("clen")).map(_.longValue),
      r.getAs[String]("payload"), r.getAs[Boolean]("ok"),
      r.getAs[String]("err")))
    (recs.toSeq, row.getLong(1))
  }

  test("multi-record container parses in order; payload cut is length-delimited") {
    val c = record("warcinfo", "software: x\r\nformat: WARC/1.0") +
      record("response", "<p>hello page one</p>",
        "WARC-Target-URI: http://a.example/1\r\n") +
      record("response", "<p>page two</p>",
        "WARC-Target-URI: http://a.example/2\r\n")
    val (recs, leftover) = parse(c)
    assert(leftover == 0L)
    assert(recs.map(_._1) == Seq("warcinfo", "response", "response"))
    assert(recs.map(_._2) == Seq("", "http://a.example/1", "http://a.example/2"))
    assert(recs.forall(_._5), recs)
    // the warcinfo payload CONTAINS the record marker "WARC/1.0" right
    // before the separator CRLFs — the length cut must sail through it
    assert(recs.head._4 == "software: x\r\nformat: WARC/1.0")
    assert(recs(1)._4 == "<p>hello page one</p>")
    assert(recs.map(r => r._3.get) == recs.map(r => r._4.length.toLong))
  }

  test("a payload containing a full fake record is NOT split") {
    val fake = record("response", "inner payload")
    val c = record("response", fake) + record("response", "tail ok")
    val (recs, leftover) = parse(c)
    assert(leftover == 0L)
    assert(recs.size == 2 && recs.forall(_._5), recs)
    assert(recs.head._4 == fake) // the embedded record comes back verbatim
    assert(recs(1)._4 == "tail ok")
  }

  test("WET-shape records (conversion + text/plain) parse identically") {
    val wet = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Record-ID: <urn:test:wet>\r\n" +
      "WARC-Target-URI: http://a.example/wet\r\n" +
      "Content-Type: text/plain\r\nContent-Length: 19\r\n\r\n" +
      "plain wet text here\r\n\r\n"
    val (recs, leftover) = parse(wet)
    assert(leftover == 0L)
    assert(recs == Seq(("conversion", "http://a.example/wet", Some(19L),
      "plain wet text here", true, null)))
  }

  test("header names match case-insensitively; WARC/1.1 magic accepted") {
    val c = "WARC/1.1\r\nwarc-type: response\r\ncontent-length: 2\r\n\r\nok\r\n\r\n"
    val (recs, _) = parse(c)
    assert(recs == Seq(("response", "", Some(2L), "ok", true, null)))
  }

  test("truncated payload surfaces the partial cut and halts") {
    val c = record("response", "first complete") +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 50\r\n\r\nonly ten c"
    val (recs, _) = parse(c)
    assert(recs.size == 2)
    assert(recs.head._5 && recs.head._4 == "first complete")
    val bad = recs(1)
    assert(!bad._5 && bad._6 == "truncated_payload", bad)
    assert(bad._3 == Some(50L) && bad._4 == "only ten c", bad)
  }

  test("missing Content-Length, truncated header, and bad magic are typed halts") {
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    val (r1, _) = parse(noLen)
    assert(r1.size == 1 && !r1.head._5 && r1.head._6 == "no_length", r1)
    val noBlank = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n"
    val (r2, _) = parse(noBlank)
    assert(r2.size == 1 && r2.head._6 == "truncated_header", r2)
    val garbage = record("response", "fine") + "not a warc record at all"
    val (r3, _) = parse(garbage)
    assert(r3.size == 2 && r3.head._5 && r3(1)._6 == "bad_magic", r3)
    // an unsupported version is bad magic too
    val (r4, _) = parse("WARC/0.18\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    assert(r4.size == 1 && r4.head._6 == "bad_magic", r4)
  }

  test("maxRecords bound surfaces unparsed residue, never truncates silently") {
    val c = record("response", "one") + record("response", "two") +
      record("response", "three")
    val (recs, leftover) = parse(c, maxRecords = 2)
    assert(recs.size == 2 && recs.forall(_._5))
    assert(leftover == record("response", "three").length.toLong, leftover)
    // whitespace-only residue is exhaustion, not a phantom record
    val (recs2, leftover2) = parse(c + "\r\n", maxRecords = 6)
    assert(recs2.size == 3 && leftover2 == 0L)
  }

  // ---- byte-domain pins (r18): octet cut, gzip members ----

  private def gzipJdk(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private def recordBytes(typ: String, payload: String): Array[Byte] = {
    val p = payload.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:test:$typ>\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes("UTF-8") ++
      p ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** Parse a binary container; (typ, clen, payloadUtf8, gzipped, ok, err). */
  private def parseBin(container: Array[Byte], maxRecords: Int = 6)
      : (Seq[(String, Option[Long], String, Boolean, Boolean, String)], Long) = {
    val df = Warc.warcBinaryRecordsRel(
      Seq((1L, container)).toDF("gid", "c"), col("c"), maxRecords, Seq("gid"))
    val row = df.select(col("records"), col("leftover_bytes")).head
    val recs = row.getSeq[Row](0).map(r => (
      r.getAs[String]("typ"),
      Option(r.getAs[java.lang.Long]("clen")).map(_.longValue),
      Option(r.getAs[Array[Byte]]("payload")).map(new String(_, "UTF-8")).orNull,
      r.getAs[Boolean]("gzipped"), r.getAs[Boolean]("ok"),
      r.getAs[String]("err")))
    (recs.toSeq, row.getLong(1))
  }

  test("Content-Length counts OCTETS: a multi-byte payload cuts at the byte boundary") {
    val p1 = "héllo №1 — ünïcødé…" // 19 chars, 28 UTF-8 bytes
    assert(p1.getBytes("UTF-8").length != p1.length)
    val c = recordBytes("response", p1) ++ recordBytes("response", "tail ok")
    val (recs, leftover) = parseBin(c)
    assert(leftover == 0L)
    assert(recs.map(r => (r._1, r._5)) ==
      Seq(("response", true), ("response", true)), recs)
    assert(recs.head._3 == p1 &&
      recs.head._2 == Some(p1.getBytes("UTF-8").length.toLong), recs.head)
    assert(recs(1)._3 == "tail ok")
  }

  test("a CHARACTER-count Content-Length misaligns the walk (the cut is byte-domain)") {
    val p1 = "héllo №1 — ünïcødé…"
    val wrong = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${p1.length}\r\n\r\n").getBytes("UTF-8") ++
      p1.getBytes("UTF-8") ++ "\r\n\r\n".getBytes("UTF-8")
    val c = wrong ++ recordBytes("response", "tail")
    val (recs, _) = parseBin(c)
    // the short cut leaves payload residue at the cursor — the next
    // "record" cannot start with the magic, so the walk halts typed
    assert(recs.size == 2 && recs(1)._6 == "bad_magic", recs)
  }

  test("gzip members parse between plain records with exact consumed-length accounting") {
    val c = recordBytes("warcinfo", "software: x") ++
      gzipJdk(recordBytes("response", "zipped pagé №")) ++
      recordBytes("response", "plain tail")
    val (recs, leftover) = parseBin(c)
    assert(leftover == 0L)
    assert(recs.map(r => (r._1, r._4, r._5)) ==
      Seq(("warcinfo", false, true), ("response", true, true),
        ("response", false, true)), recs)
    assert(recs(1)._3 == "zipped pagé №")
  }

  test("spec-valid huge Content-Length is truncated_payload, not a header error") {
    // r18's 9-digit CLEN cap misfiled >= 1 GB lengths as `no_length`
    // (advisor-found): the header is well-formed, the payload just
    // isn't there — that's the truncation taxonomy entry
    val big = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 1073741824\r\n\r\nshort"
    val (r1, _) = parseBin(big.getBytes("UTF-8"))
    assert(r1.size == 1 && !r1.head._5 && r1.head._6 == "truncated_payload", r1)
    assert(r1.head._2 == Some(1073741824L), r1)
    // >= 19 digits cannot be a real length and stays a header-parse error
    val absurd = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 1234567890123456789012\r\n\r\nx"
    val (r2, _) = parseBin(absurd.getBytes("UTF-8"))
    assert(r2.size == 1 && r2.head._6 == "no_length", r2)
  }

  test("a gzip member inflating past the bound is typed gzip_too_large, not an OOM") {
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.expressions.WarcRecords
    // ~16 KB of zeros compresses to a few dozen bytes; a 1 KiB inflate
    // bound must reject it through the typed-degrade path (the
    // production bound is 256 MiB — the mechanism is what's pinned)
    val bomb = gzipJdk(recordBytes("response", "z" * 16384))
    val df = Seq(Tuple1(bomb)).toDF("c")
      .select(GraftSqlBridge.column(WarcRecords(
        GraftSqlBridge.expression(col("c")), 6, maxInflate = 1024L)).as("w"))
    val row = df.select(col("w.records"), col("w.leftover_bytes")).head
    val recs = row.getSeq[Row](0)
    assert(recs.size == 1 && !recs.head.getAs[Boolean]("ok"), recs)
    assert(recs.head.getAs[String]("err") == "gzip_too_large", recs)
    // under the production default the same member parses fine
    val (ok, _) = parseBin(bomb)
    assert(ok.size == 1 && ok.head._5 && ok.head._4, ok)
  }

  test("corrupt gzip member is a typed halt; two records in one member is gzip_residue") {
    val good = gzipJdk(recordBytes("response", "fine"))
    val corrupt = good.clone()
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x5a).toByte
    val (r1, _) = parseBin(recordBytes("response", "first") ++ corrupt)
    assert(r1.size == 2 && r1.head._5 && !r1(1)._5, r1)
    // either the deflate stream breaks (DataFormatException) or it
    // inflates to bytes the CRC32 trailer refutes — both are bad_gzip
    assert(r1(1)._6 == "bad_gzip", r1)
    val packed = gzipJdk(recordBytes("response", "a") ++ recordBytes("response", "b"))
    val (r2, _) = parseBin(packed)
    assert(r2.size == 1 && !r2.head._5 && r2.head._6 == "gzip_residue", r2)
  }

  test("fixture containers group four docs after a warcinfo, in doc_id order") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "source", "text")
    val containers = Warc.syntheticContainers(docs)
    val n = containers.count()
    assert(n == math.ceil(docs.count() / 4.0).toLong)
    val (recs, leftover) = {
      val row = Warc.warcRecordsRel(containers.filter(col("gid") === 1),
        col("container"), 6, Seq("gid"))
        .select(col("records"), col("leftover_chars")).head
      (row.getSeq[Row](0).map(r =>
        (r.getAs[String]("typ"), r.getAs[String]("rid"))), row.getLong(1))
    }
    assert(leftover == 0L)
    assert(recs.head == (("warcinfo", "<urn:graft:warcinfo:1>")))
    assert(recs.tail.map(_._1).forall(_ == "response"))
    assert(recs.tail.map(_._2) == Seq(4L, 5L, 6L, 7L).map(i => s"<urn:graft:doc:$i>"))
  }

  // ------------------------------------------------------------------
  // HTTP-layer payload decode (r20)
  // ------------------------------------------------------------------

  private def http(bytes: Array[Byte])
      : (Option[Int], Option[String], Option[String], Option[Array[Byte]], Option[String]) = {
    val row = Seq(Tuple1(bytes)).toDF("b")
      .select(Warc.httpPayload(col("b")).as("h")).head.getStruct(0)
    (Option(row.getAs[java.lang.Integer]("status")).map(_.intValue),
      Option(row.getAs[String]("ctype")),
      Option(row.getAs[String]("encoding")),
      Option(row.getAs[Array[Byte]]("body")),
      Option(row.getAs[String]("err")))
  }

  private def httpStr(s: String) = http(s.getBytes("UTF-8"))

  test("non-HTTP payloads pass through the decoder whole (warcinfo, WET)") {
    val (st, ct, enc, body, err) = httpStr("software: x\r\nformat: WARC/1.0")
    assert(st.isEmpty && ct.isEmpty && enc.isEmpty && err.isEmpty)
    assert(new String(body.get, "UTF-8") == "software: x\r\nformat: WARC/1.0")
  }

  test("identity framing: Content-Length cuts trailing artifacts; shorter captures keep what exists") {
    val cut = httpStr("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: 5\r\n\r\nhelloEXTRA")
    assert(cut._1 == Some(200) && cut._2 == Some("text/html"), cut)
    assert(new String(cut._4.get, "UTF-8") == "hello")
    val short = httpStr("HTTP/1.1 200 OK\r\nContent-Length: 100\r\n\r\nhi")
    assert(new String(short._4.get, "UTF-8") == "hi" && short._5.isEmpty)
  }

  test("chunked: multi-chunk with extensions and trailers reassembles; status parses") {
    val msg = "HTTP/1.1 404 Not Found\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4;x=y\r\nWiki\r\n5\r\npedia\r\n0\r\nX-Trailer: v\r\n\r\n"
    val (st, _, enc, body, err) = httpStr(msg)
    assert(st == Some(404) && enc.isEmpty && err.isEmpty)
    assert(new String(body.get, "UTF-8") == "Wikipedia")
  }

  test("chunked malformations are typed bad_chunk: bad size line, truncated data, missing CRLF") {
    val base = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    for (body <- Seq(
      "zz\r\nabcd\r\n0\r\n\r\n",   // non-hex size
      "ff\r\nshort\r\n0\r\n\r\n",  // size exceeds available data
      "4\r\nWikiXX",                 // data not followed by CRLF
      "4\r\nWiki\r\n"))            // stream ends before zero chunk
      assert(httpStr(base + body)._5 == Some("bad_chunk"), body)
  }

  test("Content-Encoding gzip and deflate (zlib AND raw) inflate; unknown encodings are typed") {
    val text = "hello encoded wörld №7".getBytes("UTF-8")
    def msg(enc: String, body: Array[Byte]) =
      s"HTTP/1.1 200 OK\r\nContent-Encoding: $enc\r\n\r\n".getBytes("UTF-8") ++ body
    val gz = http(msg("gzip", gzipJdk(text)))
    assert(gz._3 == Some("gzip") && gz._5.isEmpty &&
      java.util.Arrays.equals(gz._4.get, text), gz)
    val zbos = new java.io.ByteArrayOutputStream()
    val zs = new java.util.zip.DeflaterOutputStream(zbos)
    zs.write(text); zs.close()
    val zl = http(msg("deflate", zbos.toByteArray))
    assert(zl._3 == Some("deflate") && java.util.Arrays.equals(zl._4.get, text), zl)
    // the historically common server bug: BARE deflate (no zlib wrapper)
    val rbos = new java.io.ByteArrayOutputStream()
    val rs = new java.util.zip.DeflaterOutputStream(rbos,
      new java.util.zip.Deflater(-1, true))
    rs.write(text); rs.close()
    val raw = http(msg("deflate", rbos.toByteArray))
    assert(raw._3 == Some("deflate") && java.util.Arrays.equals(raw._4.get, text), raw)
    val br = http(msg("br", text))
    assert(br._5 == Some("unsupported_encoding") && br._4.isEmpty, br)
    // corrupt gzip entity: typed, never a job failure
    val bad = http(msg("gzip", Array[Byte](0x1f, 0x8b.toByte, 8, 0, 9, 9)))
    assert(bad._5 == Some("bad_gzip"), bad)
  }

  test("an entity inflating past the bound is typed gzip_too_large (HTTP layer)") {
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.expressions.HttpPayload
    val msg = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n".getBytes("UTF-8") ++
      gzipJdk(("y" * 4096).getBytes("UTF-8"))
    val row = Seq(Tuple1(msg)).toDF("b")
      .select(GraftSqlBridge.column(HttpPayload(
        GraftSqlBridge.expression(col("b")), maxInflate = 64)).as("h"))
      .head.getStruct(0)
    assert(row.getAs[String]("err") == "gzip_too_large", row)
    assert(row.getAs[Array[Byte]]("body") == null)
  }

  test("a status line without a header terminator is typed bad_http") {
    assert(httpStr("HTTP/1.1 200 OK\r\nContent-Length: 3\r\nabc")._5 ==
      Some("bad_http"))
    assert(httpStr("HTTP/x\r\n\r\nbody")._5 == Some("bad_http"))
  }
}
