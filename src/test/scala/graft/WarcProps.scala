package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sources.Warc

/** Property-based round-trip of the WARC container walk: for ANY randomly
  * generated container — random record counts, types, URIs and payloads,
  * where payloads may embed CRLFs, double-CRLFs, header-shaped lines
  * ("Content-Length: 7") and FULL fake records including the "WARC/1.0"
  * magic — parsing recovers every record's type, URI, Content-Length and
  * payload exactly, in order, with zero leftover. Random adversarial
  * payloads cover what the hand fixtures can't enumerate; any marker- or
  * header-sniffing shortcut in the parser fails this immediately. */
object WarcProps extends Properties("warc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val payloadPiece: Gen[String] = Gen.oneOf(
    Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString),
    Gen.const("\r\n"),
    Gen.const("\r\n\r\n"),
    Gen.const("Content-Length: 7\r\n"),
    Gen.const("WARC/1.0\r\n"),
    // a complete well-formed fake record as payload content
    Gen.const("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n"),
    Gen.const(""))

  private val record: Gen[(String, String, String)] = for {
    typ <- Gen.oneOf("response", "conversion", "warcinfo", "request")
    uriWord <- Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    pieces <- Gen.chooseNum(0, 6).flatMap(Gen.listOfN(_, payloadPiece))
  } yield (typ, s"http://$uriWord.example/x", pieces.mkString)

  private val containerGen: Gen[List[(String, String, String)]] =
    Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, record))

  private def render(recs: Seq[(String, String, String)]): String =
    recs.map { case (typ, uri, payload) =>
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:p:$typ>\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${payload.length}" +
        s"\r\n\r\n$payload\r\n\r\n"
    }.mkString

  property("random containers round-trip exactly, adversarial payloads included") =
    Prop.forAll(containerGen) { recs =>
      import spark.implicits._
      val df = Warc.warcRecordsRel(
        Seq((0L, render(recs))).toDF("gid", "c"), col("c"), 6, Seq("gid"))
      val row = df.select(col("records"), col("leftover_chars")).head
      val got = row.getSeq[Row](0).map(r => (
        r.getAs[String]("typ"), r.getAs[String]("uri"),
        r.getAs[Long]("clen"), r.getAs[String]("payload"),
        r.getAs[Boolean]("ok")))
      val want = recs.map { case (t, u, p) => (t, u, p.length.toLong, p, true) }
      val leftOk = row.getLong(1) == 0L
      if (got != want || !leftOk)
        println(s"MISMATCH:\n got=$got\n want=$want leftover=${row.getLong(1)}")
      got == want && leftOk
    }

  // ---- byte-domain walk (r18): multi-byte payloads, gzip members ----

  private val mbPiece: Gen[String] = Gen.oneOf(
    payloadPiece,
    Gen.const("ünïcødé…"), Gen.const("№ — résumé"),
    Gen.const("é́"), // precomposed + combining: odd byte runs
    Gen.const("日本語テキスト"))

  private val byteRecord: Gen[(String, String, String, Boolean)] = for {
    typ <- Gen.oneOf("response", "conversion", "warcinfo")
    uriWord <- Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    pieces <- Gen.chooseNum(0, 6).flatMap(Gen.listOfN(_, mbPiece))
    gz <- Gen.oneOf(false, true)
  } yield (typ, s"http://$uriWord.example/x", pieces.mkString, gz)

  private def gzipJdk(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  /** Independent byte render: octet Content-Length, per-record JDK gzip
    * (a compressor the engine's Inflater walk shares no code with). */
  private def renderBytes(recs: Seq[(String, String, String, Boolean)]): Array[Byte] =
    recs.flatMap { case (typ, uri, payload, gz) =>
      val p = payload.getBytes("UTF-8")
      val rec = (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:p:$typ>\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${p.length}" +
        s"\r\n\r\n").getBytes("UTF-8") ++ p ++ "\r\n\r\n".getBytes("UTF-8")
      (if (gz) gzipJdk(rec) else rec).toSeq
    }.toArray

  property("byte containers round-trip: octet lengths, random gzip members interleaved") =
    Prop.forAll(Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, byteRecord))) { recs =>
      import spark.implicits._
      val df = Warc.warcBinaryRecordsRel(
        Seq((0L, renderBytes(recs))).toDF("gid", "c"), col("c"), 6, Seq("gid"))
      val row = df.select(col("records"), col("leftover_bytes")).head
      val got = row.getSeq[Row](0).map(r => (
        r.getAs[String]("typ"), r.getAs[String]("uri"),
        r.getAs[Long]("clen"),
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8"),
        r.getAs[Boolean]("gzipped"), r.getAs[Boolean]("ok")))
      val want = recs.map { case (t, u, p, gz) =>
        (t, u, p.getBytes("UTF-8").length.toLong, p, gz, true) }
      val leftOk = row.getLong(1) == 0L
      if (got != want || !leftOk)
        println(s"MISMATCH:\n got=$got\n want=$want leftover=${row.getLong(1)}")
      got == want && leftOk
    }

  // ------------------------------------------------------------------
  // HTTP-layer entity decode (r20): for ANY body bytes, ANY chunk
  // split, and ANY content encoding, the decoder recovers the body
  // exactly. The assembler below is independent imperative code (JDK
  // compressors, hand chunker) sharing nothing with the engine walk.
  // ------------------------------------------------------------------

  private val bodyGen: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 300)
    bs <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
  } yield bs.toArray

  private def zlibJdk(b: Array[Byte], raw: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos,
      new java.util.zip.Deflater(-1, raw))
    d.write(b); d.close(); bos.toByteArray
  }

  /** Hand chunker: split the entity at the given cut fractions, hex
    * sizes in MIXED case, occasional chunk extension, a trailer. */
  private def chunkify(entity: Array[Byte], cuts: List[Double]): Array[Byte] = {
    val points = cuts.map(f => (f * entity.length).toInt).distinct.sorted
      .filter(p => p > 0 && p < entity.length)
    val bounds = (0 +: points :+ entity.length).distinct.sorted
    val parts = bounds.zip(bounds.tail).map { case (a, b) =>
      java.util.Arrays.copyOfRange(entity, a, b) }
    val bos = new java.io.ByteArrayOutputStream()
    parts.zipWithIndex.foreach { case (part, i) =>
      val hexSize = if (i % 2 == 0) Integer.toHexString(part.length)
        else Integer.toHexString(part.length).toUpperCase
      val ext = if (i % 3 == 1) ";q=z" else ""
      bos.write((hexSize + ext + "\r\n").getBytes("US-ASCII"))
      bos.write(part)
      bos.write("\r\n".getBytes("US-ASCII"))
    }
    bos.write("0\r\nX-Trail: t\r\n\r\n".getBytes("US-ASCII"))
    bos.toByteArray
  }

  private val encGen: Gen[String] =
    Gen.oneOf("identity", "gzip", "deflate", "deflate-raw")

  property("HTTP entities round-trip through any chunking and content encoding") =
    Prop.forAll(bodyGen, encGen, Gen.oneOf(true, false),
      Gen.listOfN(3, Gen.chooseNum(0.0, 1.0))) { (body, encName, chunked, cuts) =>
      import spark.implicits._
      val entity = encName match {
        case "identity" => body
        case "gzip" => gzipJdk(body)
        case "deflate" => zlibJdk(body, raw = false)
        case "deflate-raw" => zlibJdk(body, raw = true)
      }
      val ceHdr = encName match {
        case "identity" => ""
        case "deflate-raw" => "Content-Encoding: deflate\r\n"
        case e => s"Content-Encoding: $e\r\n"
      }
      val (teHdr, framed) =
        if (chunked) ("Transfer-Encoding: chunked\r\n", chunkify(entity, cuts))
        else (s"Content-Length: ${entity.length}\r\n", entity)
      val msg = (s"HTTP/1.1 200 OK\r\nContent-Type: application/x-t\r\n" +
        ceHdr + teHdr + "\r\n").getBytes("US-ASCII") ++ framed
      val row = Seq(Tuple1(msg)).toDF("b")
        .select(Warc.httpPayload(col("b")).as("h")).head.getStruct(0)
      val gotBody = row.getAs[Array[Byte]]("body")
      val wantEnc = encName match {
        case "identity" => null
        case "deflate-raw" => "deflate"
        case e => e
      }
      val ok = row.getAs[java.lang.Integer]("status") == 200 &&
        row.getAs[String]("err") == null &&
        row.getAs[String]("encoding") == wantEnc &&
        gotBody != null && java.util.Arrays.equals(gotBody, body)
      if (!ok) println(s"HTTP MISMATCH enc=$encName chunked=$chunked " +
        s"len=${body.length} row=$row")
      ok
    }
}
