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
