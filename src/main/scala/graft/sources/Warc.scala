package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Web
import graft.functions.expressions.{GzipCompress, HttpPayload, WarcRecords, ZlibCompress}

/** WARC/WET container ingestion (ISO 28500 / WARC 1.0-1.1, public spec;
  * WET files — Common Crawl's extracted-text sidecars — are ordinary WARC
  * containers whose records carry `WARC-Type: conversion` + text/plain
  * payloads, so the same parser covers both). The engine analog of the
  * reference's own container→records move (reference/index.js:70: a
  * GEDCOM byte stream splits into level-0 records before any per-record
  * work) applied to what web crawls actually emit: crawls hand a
  * pipeline multi-record WARC containers, and record extraction is the
  * rung BEFORE q168's HTML main-content extraction can run.
  *
  * Parse design — a BYTE-DOMAIN length-delimited walk in one native
  * Catalyst expression ([[WarcRecords]]): each step reads the header
  * block (up to the first CRLF CRLF), takes `Content-Length` OCTETS of
  * payload (the spec's definition — a character-count cut would
  * misalign every subsequent record the moment a payload holds
  * multi-byte UTF-8), then skips the two-CRLF record separator. A
  * record whose first bytes are the RFC 1952 magic is a gzip member
  * (real Common Crawl is `.warc.gz`: one record per member, members
  * concatenated): it inflates with exact consumed-length accounting and
  * parses identically. Splitting the container on the "WARC/1.0" marker
  * would be wrong the moment a payload CONTAINS the marker (WARC files
  * store crawled WARC files all the time); the fixture's warcinfo
  * payload plants exactly that string, so marker immunity is pinned
  * through the full DuckDB oracle, not just specs. Malformed input
  * degrades to typed per-record errors (`bad_magic`, `truncated_header`,
  * `no_length`, `truncated_payload`, `bad_gzip`, `gzip_residue`) and a
  * halt — a reader cannot resync safely without a trustworthy length.
  *
  * 100 TB shape: one cursor pass per container row — scan → project,
  * ZERO exchanges, embarrassingly parallel, O(container) per row (the
  * earlier string-domain walk re-materialized the remainder once per
  * record: O(maxRecords × container) — retired r18). Real deployments
  * read containers as whole-file binary rows (`binaryFile` source: one
  * `.warc.gz` per row) straight into [[warcBinaryRecordsRel]];
  * `leftover_bytes` surfaces unparsed residue past the `maxRecords`
  * bound — no silent truncation.
  */
object Warc {
  import Tables._

  private def gzip(c: Column): Column =
    GraftSqlBridge.column(GzipCompress(GraftSqlBridge.expression(c)))

  private def zlib(c: Column): Column =
    GraftSqlBridge.column(ZlibCompress(GraftSqlBridge.expression(c)))

  /** [[HttpPayload]] over a binary payload column: the HTTP-layer
    * decode rung (status/headers split, dechunk, entity inflate) —
    * struct (status, ctype, encoding, body, err). */
  def httpPayload(c: Column): Column =
    GraftSqlBridge.column(HttpPayload(GraftSqlBridge.expression(c)))

  /** Parsed records of a BINARY WARC container column: `keys` + a
    * `records` array (in container order, typed errors included,
    * binary payloads, per-record `gzipped` provenance) + the unparsed
    * `leftover_bytes` past the `maxRecords` bound. */
  def warcBinaryRecordsRel(containers: DataFrame, container: Column,
      maxRecords: Int, keys: Seq[String]): DataFrame = {
    val kt = keys.map(col)
    containers
      .select(kt :+ GraftSqlBridge.column(
        WarcRecords(GraftSqlBridge.expression(container), maxRecords))
        .as("__w"): _*)
      .select(kt :+ col("__w.records").as("records")
        :+ col("__w.leftover_bytes").as("leftover_bytes"): _*)
  }

  /** String façade over the byte walk for TEXT container columns (the
    * q171 fixture; WET sidecars read as text): encode → walk → decode
    * payloads back to strings. Field and error semantics are identical
    * to the historical string-domain walk (absent header fields are
    * `''` on parsed-header records, NULL on pre-header errors); `clen`
    * and `leftover_chars` count BYTES — equal to characters on the
    * ASCII/single-byte content this façade serves, exact octets beyond
    * it (use [[warcBinaryRecordsRel]] when byte payloads must survive
    * undecoded). */
  def warcRecordsRel(containers: DataFrame, container: Column,
      maxRecords: Int, keys: Seq[String]): DataFrame = {
    val kt = keys.map(col)
    warcBinaryRecordsRel(containers, encode(container, "UTF-8"),
      maxRecords, keys)
      .select(kt
        :+ transform(col("records"), r => struct(
          r.getField("typ").as("typ"),
          r.getField("rid").as("rid"),
          r.getField("uri").as("uri"),
          r.getField("clen").as("clen"),
          decode(r.getField("payload"), "UTF-8").as("payload"),
          r.getField("ok").as("ok"),
          r.getField("err").as("err"))).as("records")
        :+ col("leftover_bytes").as("leftover_chars"): _*)
  }

  // ------------------------------------------------------------------
  // Deterministic multi-record container fixtures (same construction
  // rebuilt arithmetically in the oracles).
  // ------------------------------------------------------------------

  /** warc-fields payload of each container's warcinfo record. It embeds
    * the literal record marker "WARC/1.0" immediately followed by the
    * separator's CRLF in the container stream — a split-on-marker parser
    * breaks exactly here; the length-delimited walk must not. */
  private[graft] val INFO_PAYLOAD = "software: graft/0.1\r\nformat: WARC/1.0"

  private[sources] def warcinfoRecord(gid: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:graft:warcinfo:"),
      gid.cast("string"),
      lit(s">\r\nContent-Type: application/warc-fields\r\nContent-Length: " +
        s"${INFO_PAYLOAD.length}\r\n\r\n$INFO_PAYLOAD\r\n\r\n"))

  /** The HTTP/1.1 response message around a rendered page (r20 —
    * closing r19 gap #2): real `WARC-Type: response` payloads carry
    * the captured HTTP MESSAGE, not bare HTML, so the fixture frames
    * every body and extraction must decode through [[httpPayload]]
    * first. Framing classes by doc_id % 3: 0 = identity with
    * Content-Length; 1 = `Transfer-Encoding: chunked`, TWO chunks
    * (16 octets + rest — the html's constant ASCII prefix guarantees
    * > 16); 2 = chunked, ONE chunk with a chunk extension (`;x=1`) and
    * a trailer header after the zero chunk (both must be tolerated).
    * All framing is ASCII, so the q171 STRING containers round-trip
    * it; compressed Content-Encodings live in the q183 binary
    * fixture. */
  private[sources] def httpMessage(docId: Column, html: Column): Column = {
    val crlf = "\r\n"
    val base = lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")
    val len = octet_length(html)
    val plain = concat(base, lit("Content-Length: "), len.cast("string"),
      lit(crlf + crlf), html)
    val chunked2 = concat(base,
      lit("Transfer-Encoding: chunked" + crlf + crlf),
      lit("10" + crlf), html.substr(lit(1), lit(16)), lit(crlf),
      lower(hex(len - 16)), lit(crlf), html.substr(lit(17), len),
      lit(crlf), lit("0" + crlf + crlf))
    val chunked1 = concat(base,
      lit("Transfer-Encoding: chunked" + crlf + crlf),
      lower(hex(len)), lit(";x=1" + crlf), html, lit(crlf),
      lit("0" + crlf + "X-Checksum: ok" + crlf + crlf))
    when(docId % 3 === 0, plain)
      .when(docId % 3 === 1, chunked2)
      .otherwise(chunked1)
  }

  private[sources] def responseRecord(docId: Column, uri: Column, html: Column): Column = {
    val msg = httpMessage(docId, html)
    concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:doc:"),
      docId.cast("string"),
      lit(">\r\nWARC-Target-URI: "), uri,
      // octets, per spec — equal to the char count on the ASCII corpus
      lit("\r\nContent-Type: application/http;msgtype=response\r\nContent-Length: "),
      octet_length(msg).cast("string"),
      lit("\r\n\r\n"), msg, lit("\r\n\r\n"))
  }

  /** Containers over the documents table: gid = doc_id // 4 groups four
    * pages per container; each container = one warcinfo record followed
    * by one response record per doc (rendered by [[Web.syntheticHtml]],
    * addressed by [[Web.rawUrl]]) in doc_id order. One exchange to BUILD
    * the fixture (the groupBy); the parse under test is a pure map. */
  private[graft] def syntheticContainers(docs: DataFrame): DataFrame = {
    val rec = responseRecord(col("doc_id"),
      Web.rawUrl(col("doc_id"), col("source")),
      Web.syntheticHtml(col("text"), col("doc_id")))
    docs
      .select((col("doc_id") / 4).cast("long").as("gid"),
        col("doc_id"), rec.as("rec"))
      .groupBy(col("gid"))
      .agg(concat(warcinfoRecord(col("gid")),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "")).as("container"))
  }

  /** The q183 BINARY fixture: the q171 grouping, but every payload
    * plants multi-byte UTF-8 (`№` always; umlaut/dash suffix classes by
    * doc_id residue — so every record's byte Content-Length differs
    * from its character count), every third response record is a
    * per-record gzip member between plain neighbours, and (r20) every
    * entity rides a real HTTP message with framing classes by
    * doc_id % 4: 0 = identity + Content-Length, 1 = chunked (single
    * chunk — octet-level chunk sizes over multi-byte content; the
    * doc_id % 9 == 4 subset plants a MALFORMED size line, the typed
    * `bad_chunk` class), 2 = `Content-Encoding: gzip`, 3 =
    * `Content-Encoding: deflate` (zlib-wrapped). doc_id % 5 == 2
    * responses carry a 404 status. The walk and the HTTP decode never
    * meet the compressors — only the formats. */
  private[graft] def syntheticBinaryContainers(docs: DataFrame): DataFrame = {
    val payload = concat(col("text"),
      lit(" №"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0, lit(" ünïcødé"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(" — résumé…"))
        .otherwise(lit("")))
    val crlf = "\r\n"
    val pbytes = encode(payload, "UTF-8")
    val hdr0 = concat(
      when(col("doc_id") % 5 === 2, lit("HTTP/1.1 404 Not Found" + crlf))
        .otherwise(lit("HTTP/1.1 200 OK" + crlf)),
      lit("Content-Type: text/plain" + crlf))
    val isBadChunk = col("doc_id") % 4 === 1 && col("doc_id") % 9 === 4
    val msg =
      when(col("doc_id") % 4 === 0, concat(
        encode(concat(hdr0, lit("Content-Length: "),
          octet_length(pbytes).cast("string"), lit(crlf + crlf)), "UTF-8"),
        pbytes))
      .when(isBadChunk, concat(
        encode(concat(hdr0, lit("Transfer-Encoding: chunked" + crlf + crlf +
          "zz" + crlf)), "UTF-8"), pbytes))
      .when(col("doc_id") % 4 === 1, concat(
        encode(concat(hdr0, lit("Transfer-Encoding: chunked" + crlf + crlf),
          lower(hex(octet_length(pbytes))), lit(crlf)), "UTF-8"),
        pbytes, encode(lit(crlf + "0" + crlf + crlf), "UTF-8")))
      .when(col("doc_id") % 4 === 2, concat(
        encode(concat(hdr0, lit("Content-Encoding: gzip" + crlf + crlf)),
          "UTF-8"),
        gzip(pbytes)))
      .otherwise(concat(
        encode(concat(hdr0, lit("Content-Encoding: deflate" + crlf + crlf)),
          "UTF-8"),
        zlib(pbytes)))
    val header = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:doc:"),
      col("doc_id").cast("string"),
      lit(">\r\nWARC-Target-URI: "), Web.rawUrl(col("doc_id"), col("source")),
      lit("\r\nContent-Type: application/http;msgtype=response\r\nContent-Length: "),
      octet_length(msg).cast("string"), lit("\r\n\r\n"))
    val recBin = concat(encode(header, "UTF-8"), msg,
      encode(lit("\r\n\r\n"), "UTF-8"))
    val member = when(col("doc_id") % 3 === 0, gzip(recBin)).otherwise(recBin)
    docs
      .select((col("doc_id") / 4).cast("long").as("gid"),
        col("doc_id"), member.as("rec"))
      .groupBy(col("gid"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")),
        encode(warcinfoRecord(col("gid")), "UTF-8"),
        (acc, r) => concat(acc, r)).as("container"))
  }

  /** The oracle never parses WARC text: it rebuilds each record's
    * expected headers and lengths from the generative formulas (URI from
    * the q158 fixture expression, Content-Length from the synthetic-HTML
    * string rebuilt in SQL, extracted-main-text length from the q168
    * block-verdict CTE chain) — so the parse, the length-delimited
    * payload cut, and the q168 chain on top are what's under test. */
  private lazy val WARC_ORACLE = s"""
    WITH ${Web.HTML_BLOCK_CTES},
    main AS (
      SELECT doc_id,
        (coalesce(sum(CASE WHEN cls = 'good' THEN text_chars END), 0)
         + greatest(count(CASE WHEN cls = 'good' THEN 1 END) - 1, 0))::BIGINT
          AS main_chars
      FROM verdicts GROUP BY doc_id),
    html AS (
      SELECT doc_id, source, concat(
        '<html><head><script>var x=1;</script><style>.b{k:1}</style></head><body><!-- layout -->',
        '<div class="nav"><a href="/">home</a> <a href="/archive">archive</a> <a href="/about">about</a></div>',
        '<h1>', ws[1], ' ', ws[2], ' ', ws[3], ' &amp; co&#8217;s</h1>',
        '<p><b>', ws[1], '</b>',
        (CASE WHEN h > 1 THEN ' ' || array_to_string(ws[2:h], ' ') ELSE '' END),
        '</p>',
        (CASE WHEN doc_id % 3 = 0 THEN
           '<div class="rel">see also <a href="/r/1">' || ws[2] ||
           '</a> <a href="/r/2">' || ws[3] || '</a></div>' ELSE '' END),
        (CASE WHEN doc_id % 5 = 0 THEN
           '<p>' || array_to_string(ws[2:5], ' ') || ' &#x2014;</p>'
         ELSE '' END),
        '<p>', array_to_string(ws[h+1:n], ' '), '</p>',
        '<div class="footer">copyright &amp;#169; <a href="/terms">terms</a> <a href="/privacy">privacy</a></div></body></html>')
          AS html
      FROM b0),
    framed AS (
      SELECT doc_id, source, html,
        CASE
          WHEN doc_id % 3 = 0 THEN
            'HTTP/1.1 200 OK' || e'\r\n' || 'Content-Type: text/html' ||
            e'\r\n' || 'Content-Length: ' || octet_length(encode(html)) ||
            e'\r\n\r\n' || html
          WHEN doc_id % 3 = 1 THEN
            'HTTP/1.1 200 OK' || e'\r\n' || 'Content-Type: text/html' ||
            e'\r\n' || 'Transfer-Encoding: chunked' || e'\r\n\r\n' ||
            '10' || e'\r\n' || substr(html, 1, 16) || e'\r\n' ||
            printf('%x', octet_length(encode(html)) - 16) || e'\r\n' ||
            substr(html, 17) || e'\r\n' || '0' || e'\r\n\r\n'
          ELSE
            'HTTP/1.1 200 OK' || e'\r\n' || 'Content-Type: text/html' ||
            e'\r\n' || 'Transfer-Encoding: chunked' || e'\r\n\r\n' ||
            printf('%x', octet_length(encode(html))) || ';x=1' || e'\r\n' ||
            html || e'\r\n' || '0' || e'\r\n' || 'X-Checksum: ok' ||
            e'\r\n\r\n'
        END AS msg
      FROM html),
    resp AS (
      SELECT doc_id, doc_id // 4 AS gid, 'response' AS warc_type,
             '<urn:graft:doc:' || doc_id || '>' AS record_id,
             ${Web.RAW_URL_SQL} AS target_uri,
             octet_length(encode(msg))::BIGINT AS content_length,
             len(msg)::BIGINT AS payload_chars,
             200 AS http_status,
             len(html)::BIGINT AS body_chars,
             main_chars
      FROM framed JOIN main USING (doc_id)),
    info AS (SELECT DISTINCT doc_id // 4 AS gid FROM d),
    rows_all AS (
      SELECT gid, 0::BIGINT AS rec_idx, 'warcinfo' AS warc_type,
             '<urn:graft:warcinfo:' || gid || '>' AS record_id,
             '' AS target_uri,
             ${INFO_PAYLOAD.length}::BIGINT AS content_length,
             ${INFO_PAYLOAD.length}::BIGINT AS payload_chars,
             NULL::INTEGER AS http_status,
             ${INFO_PAYLOAD.length}::BIGINT AS body_chars,
             0::BIGINT AS main_chars
      FROM info
      UNION ALL
      SELECT gid,
             (row_number() OVER (PARTITION BY gid ORDER BY doc_id))::BIGINT
               AS rec_idx,
             warc_type, record_id, target_uri, content_length,
             payload_chars, http_status, body_chars, main_chars
      FROM resp)
    SELECT gid, rec_idx, warc_type, record_id, target_uri, content_length,
           payload_chars, http_status, body_chars, main_chars,
           0::BIGINT AS leftover_chars
    FROM rows_all"""

  /** q183 oracle: the byte walk's and HTTP decode's outputs rebuilt
    * generatively — the entity string re-derived in SQL, framed octet
    * counts constructed arithmetically for identity/chunked classes
    * (`octet_length(encode(..))`, ≠ `length(..)` on every record by
    * the planted `№`; the compressed classes' framed lengths are
    * compressor-dependent and intentionally NULL on both sides — their
    * decode is pinned through the body columns instead), gzip
    * membership and all HTTP classes from the residue rules. The
    * oracle never sees compressed bytes; the inflate paths are under
    * test via the SAME decoded-body checks the plain records get. */
  private lazy val WARC_BINARY_ORACLE = s"""
    WITH d AS (
      SELECT doc_id, doc_id // 4 AS gid, source,
             text || ' ' || chr(8470) || CAST(doc_id AS VARCHAR) ||
             (CASE WHEN doc_id % 2 = 0 THEN ' ' || chr(252) || 'n' ||
                chr(239) || 'c' || chr(248) || 'd' || chr(233)
              ELSE '' END) ||
             (CASE WHEN doc_id % 5 = 0 THEN ' ' || chr(8212) || ' r' ||
                chr(233) || 'sum' || chr(233) || chr(8230)
              ELSE '' END) AS payload
      FROM documents),
    c AS (
      SELECT doc_id, gid, source, payload,
             octet_length(encode(payload)) AS po,
             (doc_id % 4 = 1 AND doc_id % 9 = 4) AS badchunk,
             (CASE WHEN doc_id % 5 = 2 THEN 'HTTP/1.1 404 Not Found'
                   ELSE 'HTTP/1.1 200 OK' END) || e'\r\n' ||
               'Content-Type: text/plain' || e'\r\n' AS hdr0
      FROM d),
    resp AS (
      SELECT gid, doc_id, 'response' AS warc_type,
             '<urn:graft:doc:' || doc_id || '>' AS record_id,
             ${Web.RAW_URL_SQL} AS target_uri,
             CASE
               WHEN doc_id % 4 = 0 THEN octet_length(encode(
                 hdr0 || 'Content-Length: ' || po || e'\r\n\r\n' || payload))
               WHEN badchunk THEN octet_length(encode(
                 hdr0 || 'Transfer-Encoding: chunked' || e'\r\n\r\n' ||
                 'zz' || e'\r\n' || payload))
               WHEN doc_id % 4 = 1 THEN octet_length(encode(
                 hdr0 || 'Transfer-Encoding: chunked' || e'\r\n\r\n' ||
                 printf('%x', po) || e'\r\n' || payload || e'\r\n' ||
                 '0' || e'\r\n\r\n'))
             END::BIGINT AS content_length,
             CASE WHEN doc_id % 5 = 2 THEN 404 ELSE 200 END AS http_status,
             CASE WHEN doc_id % 4 = 2 THEN 'gzip'
                  WHEN doc_id % 4 = 3 THEN 'deflate' END AS http_encoding,
             CASE WHEN badchunk THEN 'bad_chunk' END AS http_err,
             (CASE WHEN badchunk THEN NULL ELSE po END)::BIGINT
               AS body_octets,
             (CASE WHEN badchunk THEN NULL
                   ELSE length(payload) END)::BIGINT AS body_chars,
             (doc_id % 3 = 0) AS gzipped
      FROM c),
    info AS (SELECT DISTINCT gid FROM d),
    rows_all AS (
      SELECT gid, 0::BIGINT AS rec_idx, 'warcinfo' AS warc_type,
             '<urn:graft:warcinfo:' || gid || '>' AS record_id,
             '' AS target_uri,
             ${INFO_PAYLOAD.length}::BIGINT AS content_length,
             NULL::INTEGER AS http_status,
             NULL::VARCHAR AS http_encoding,
             NULL::VARCHAR AS http_err,
             ${INFO_PAYLOAD.length}::BIGINT AS body_octets,
             ${INFO_PAYLOAD.length}::BIGINT AS body_chars,
             false AS gzipped
      FROM info
      UNION ALL
      SELECT gid,
             (row_number() OVER (PARTITION BY gid ORDER BY doc_id))::BIGINT
               AS rec_idx,
             warc_type, record_id, target_uri, content_length,
             http_status, http_encoding, http_err, body_octets,
             body_chars, gzipped
      FROM resp)
    SELECT gid, rec_idx, warc_type, record_id, target_uri, content_length,
           http_status, http_encoding, http_err, body_octets, body_chars,
           gzipped, 0::BIGINT AS leftover_bytes
    FROM rows_all"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q171_warc_extract",
      (s, d) => {
        val recs = warcRecordsRel(syntheticContainers(documents(s, d)),
          col("container"), maxRecords = 6, keys = Seq("gid"))
        val ex = recs.select(col("gid"), col("leftover_chars"),
          posexplode_outer(col("records")).as(Seq("rec_idx", "r")))
        // r20: response payloads are HTTP MESSAGES — the transfer
        // framing (chunked, extensions, trailers) decodes before any
        // extractor sees the entity; non-HTTP payloads (the warcinfo
        // warc-fields) pass through the decoder whole. The q168
        // extractor then runs on the DECODED body; only response
        // records surface its length
        val dec = ex
          .select(col("gid"), col("leftover_chars"), col("rec_idx"),
            col("r"),
            httpPayload(encode(col("r.payload"), "UTF-8")).as("__hp"))
          .select(col("gid"), col("leftover_chars"), col("rec_idx"),
            col("r"), col("__hp"),
            decode(col("__hp.body"), "UTF-8").as("__body"))
        Web.withMainText(dec, col("__body"), "__main")
          .select(col("gid"),
            col("rec_idx").cast("long").as("rec_idx"),
            col("r.typ").as("warc_type"),
            col("r.rid").as("record_id"),
            col("r.uri").as("target_uri"),
            col("r.clen").as("content_length"),
            length(col("r.payload")).cast("long").as("payload_chars"),
            col("__hp.status").as("http_status"),
            length(col("__body")).cast("long").as("body_chars"),
            when(col("r.typ") === "response", length(col("__main")))
              .otherwise(lit(0)).cast("long").as("main_chars"),
            col("leftover_chars"))
      },
      Some(WARC_ORACLE),
      "WARC/WET container ingestion (ISO 28500): length-delimited multi-record walk — header parse, Content-Length payload cut, marker-in-payload immunity — then the RFC 9112 HTTP-layer decode (status/header split, dechunk with extension+trailer tolerance) feeding the q168 extractor on the DECODED entity, zero exchanges"),

    QueryDef(
      "q183_warc_binary",
      (s, d) => {
        val recs = warcBinaryRecordsRel(
          syntheticBinaryContainers(documents(s, d)),
          col("container"), maxRecords = 6, keys = Seq("gid"))
        recs
          .select(col("gid"), col("leftover_bytes"),
            posexplode_outer(col("records")).as(Seq("rec_idx", "r")))
          .select(col("gid"), col("leftover_bytes"), col("rec_idx"),
            col("r"), httpPayload(col("r.payload")).as("__hp"))
          .select(col("gid"),
            col("rec_idx").cast("long").as("rec_idx"),
            col("r.typ").as("warc_type"),
            col("r.rid").as("record_id"),
            col("r.uri").as("target_uri"),
            // the framed octet count is compressor-dependent for
            // content-encoded entities: report it only for identity /
            // chunked framing, where the oracle rebuilds it exactly
            when(col("__hp.encoding").isNull, col("r.clen"))
              .as("content_length"),
            col("__hp.status").as("http_status"),
            col("__hp.encoding").as("http_encoding"),
            col("__hp.err").as("http_err"),
            octet_length(col("__hp.body")).cast("long").as("body_octets"),
            length(decode(col("__hp.body"), "UTF-8")).cast("long")
              .as("body_chars"),
            col("r.gzipped").as("gzipped"),
            col("leftover_bytes"))
      },
      Some(WARC_BINARY_ORACLE),
      "byte-domain WARC ingestion over binary containers: octet Content-Length cut on multi-byte UTF-8 payloads, per-record RFC 1952 gzip members (the .warc.gz shape), then the HTTP-layer entity decode — chunked de-framing at octet level, Content-Encoding gzip/deflate inflate with the bomb bound, typed bad_chunk degrade — one native-expression cursor pass, zero exchanges"))
}
