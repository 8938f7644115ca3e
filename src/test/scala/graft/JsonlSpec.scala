package graft

import org.apache.spark.sql.functions._

import graft.sources.Jsonl

/** Per-line semantics of the JSONL ingest walk: malformed isolation,
  * escaping round-trips, blank accounting, positional provenance. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def rows(container: String): Seq[(Long, String, Option[Long])] =
    Jsonl.jsonlRecordsRel(
        Seq((1L, container)).toDF("gid", "container"),
        col("container"), Seq("gid"))
      .collect().map(r => (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
      .sortBy(_._1)

  test("a malformed line costs one typed row, never the container") {
    val c = Seq(
      """{"id": 1, "url": "https://a.com/x", "lang": "en", "text": "t one."}""",
      Jsonl.MALFORMED,
      """{"id": 2, "url": "https://b.com/y", "lang": "de", "text": "t two."}""")
      .mkString("\n")
    assert(rows(c) == Seq(
      (0L, "record", Some(1L)),
      (1L, "malformed", None), // PERMISSIVE partial parse must not leak an id
      (2L, "record", Some(2L))))
  }

  test("blank lines account as blank with correct line numbers") {
    val c = "\n" + """{"id": 7, "url": "u", "lang": "en", "text": "x."}""" + "\n\n"
    assert(rows(c).map(t => (t._1, t._2)) ==
      Seq((0L, "blank"), (1L, "record"), (2L, "blank"), (3L, "blank")))
  }

  test("nested metadata and tag arrays project; absent nesting stays null") {
    val c = Seq(
      """{"id": 1, "url": "u", "lang": "en", "text": "x.", """ +
        """"metadata": {"origin": "srcA", "score": 42}, "tags": ["b3", "en"]}""",
      """{"id": 2, "url": "u", "lang": "de", "text": "y."}""").mkString("\n")
    val got = Jsonl.jsonlRecordsRel(
        Seq((1L, c)).toDF("gid", "container"), col("container"), Seq("gid"))
      .orderBy("line_no")
      .select(col("id"), col("origin"), col("score"), col("n_tags"), col("tag0"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        Option(r.getString(4)))).toSeq
    assert(got == Seq(
      (1L, Some("srcA"), Some(42L), Some(2L), Some("b3")),
      // flat-only record: still a record; nested projections null
      (2L, None, None, None, None)), got)
  }

  test("gzip-compressed containers parse to identical rows; corrupt gzip is one typed row") {
    val c = """{"id": 9, "url": "https://z.com/p", "lang": "en", "text": "zz."}"""
    val plain = c.getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(plain); g.close()
    val gzBytes = bos.toByteArray
    def parse(b: Array[Byte]) = Jsonl.jsonlBinaryRecordsRel(
        Seq((1L, b)).toDF("gid", "container"), col("container"), Seq("gid"))
      .select(col("line_no"), col("kind"), col("id")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(parse(plain) == parse(gzBytes) &&
      parse(plain) == Seq((0L, "record", 9L)))
    val corrupt = gzBytes.clone()
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x5a).toByte
    assert(parse(corrupt) == Seq((-1L, "malformed", -1L)), parse(corrupt))
  }

  test("to_json/from_json round-trips quotes, backslashes and newlines in text") {
    val tricky = "he said \"hi\\there\"\nnew line\ttab"
    val df = Seq((5L, "https://h.com/p", "en", tricky))
      .toDF("doc_id", "url", "lang", "text")
      .select(lit(1L).as("gid"),
        to_json(struct(col("doc_id").as("id"), col("url"),
          col("lang"), col("text"))).as("container"))
    val got = Jsonl.jsonlRecordsRel(df, col("container"), Seq("gid"))
      .filter(col("kind") === "record")
      .select(col("id"), col("host"), col("n_text_chars")).head
    // the escaped \n keeps the record on ONE line; parsed text length
    // equals the original string's
    assert(got.getLong(0) == 5L && got.getString(1) == "h.com" &&
      got.getLong(2) == tricky.length, got.toString)
  }
}
