package graft

import org.apache.spark.sql.functions._

import graft.functions.Web

/** Per-rule semantics of the URL canonicalizer: each variant class the
  * collapse claims to merge, plus the things it must NOT merge. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u").select(Web.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme case, www., trailing slash, fragment and trackers all collapse") {
    val got = canon(
      "https://www.Example.com/a/b",
      "HTTP://EXAMPLE.COM/a/b/",
      "https://example.com/a/b#frag",
      "https://example.com/a/b?utm_source=x&utm_campaign=y",
      "http://www.example.com/a/b/?ref=rss#sec")
    assert(got.distinct == Seq("example.com/a/b"), got)
  }

  test("surviving params are kept, sorted, and distinguish pages") {
    val Seq(a, b, c) = canon(
      "https://example.com/s?b=2&a=1&utm_medium=m",
      "https://example.com/s?a=1&b=2",
      "https://example.com/s?a=1&b=3")
    assert(a == "example.com/s?a=1&b=2")
    assert(a == b)     // order + tracker variants merge
    assert(a != c, s"different param VALUES must not merge: $a vs $c")
  }

  test("different hosts and paths never merge; www is stripped only as a prefix") {
    val Seq(a, b, c, d) = canon(
      "https://example.com/x",
      "https://examp1e.com/x",
      "https://example.com/y",
      "https://wwwexample.com/x") // no dot: NOT a www. prefix
    assert(Seq(a, b, c, d).distinct.size == 4, Seq(a, b, c, d))
    assert(d == "wwwexample.com/x")
  }

  test("bare-host URLs and tracker-only queries collapse to the bare host") {
    val Seq(a, b) = canon("https://example.com", "https://example.com?utm_x=1")
    assert(a == "example.com", a)
    assert(b == "example.com", b)
  }

  test("canonicalization is idempotent over the fixture's variant space") {
    // every (scheme x www x slash x query x fragment) combination the
    // q158 fixture plants: canon(canon(u)) must equal canon(u) — the
    // property that lets a pipeline re-canonicalize defensively
    val urls = for {
      sch <- Seq("https://", "HTTP://")
      host <- Seq("www.Example.com", "EXAMPLE.COM", "sub.example.com")
      path <- Seq("/docs/7", "/docs/7/", "")
      q <- Seq("", "?utm_source=feed&b=1&a=2", "?a=2&b=1&utm_campaign=x", "?ref=rss")
      f <- Seq("", "#sec")
    } yield s"$sch$host$path$q$f"
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(once == twice,
      once.zip(twice).filter { case (a, b) => a != b }.take(3).toString)
  }
}
