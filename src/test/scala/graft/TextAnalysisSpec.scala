package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Fixture-level checks for the text-pipeline operators whose interesting
  * inputs don't occur in the synthetic corpus: the PII patterns (q76) are
  * exercised on real emails/phones/IPs here, and the span-dedup gram logic
  * (q77) on planted shared spans. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  // the exact patterns q76 registers (kept in sync by the shared literals)
  private val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IPV4 = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  private val PHONE = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  test("q76 PII patterns match real emails, phones, and IPs") {
    val df = Seq(
      ("contact bob.smith+spam@mail.example.org or 555-867-5309x", 1, 0, 0),
      ("server at 10.0.255.7 and 192.168.1.1 rebooted", 0, 2, 0),
      ("call 415 555 0123 or 415.555.0124 today", 0, 0, 2),
      ("no pii here just words", 0, 0, 0))
      .toDF("text", "e", "i", "p")
    val got = df.select(
      regexp_count(col("text"), lit(EMAIL)).as("ge"),
      regexp_count(col("text"), lit(IPV4)).as("gi"),
      regexp_count(col("text"), lit(PHONE)).as("gp"),
      col("e"), col("i"), col("p")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(3), s"email count: $r")
      assert(r.getInt(1) == r.getInt(4), s"ipv4 count: $r")
      assert(r.getInt(2) == r.getInt(5), s"phone count: $r")
    }
  }

  test("q76 redaction masks every match and nothing else") {
    val df = Seq("mail a@b.co and c.d@e.org now").toDF("text")
    val masked = df.select(
      regexp_replace(col("text"), EMAIL, "[PII]").as("m")).as[String].head()
    assert(masked == "mail [PII] and [PII] now")
  }

  test("q77 span dedup flags exactly the planted shared 5-gram spans") {
    // docs 1 and 2 share a verbatim 6-word span (two 5-grams); doc 3 shares
    // nothing 5 words long
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 unique2"),
      (2L, "pre1 alpha beta gamma delta epsilon zeta post2"),
      (3L, "alpha beta gamma other delta epsilon zeta2 tail"))
      .toDF("doc_id", "text")
    val fn = TextAnalysis.defs.find(_.name == "q77_span_dedup").get
    // run the same plan shape inline (the registered fn reads the corpus):
    val n = 5
    val toks = df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= n)
    val grams = toks.select(col("doc_id"),
      explode(array_distinct(
        transform(sequence(lit(0), size(col("w")) - n), i =>
          concat_ws(" ", (0 until n).map(j =>
            element_at(col("w"), i + j + 1)): _*)))).as("g"))
    val gdf = grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    val out = grams.join(gdf, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("gdf") > 1, 1L).otherwise(0L)).as("n_shared"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2, s"doc1 shares two 5-grams, got ${out(1L)}")
    assert(out(2L) == 2, s"doc2 shares two 5-grams, got ${out(2L)}")
    assert(out(3L) == 0, s"doc3 shares nothing, got ${out(3L)}")
    assert(fn.oracle.nonEmpty, "q77 must stay oracle-checked")
  }
}
