package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Sitemap

/** Parse and scheduling semantics of the sitemap/frontier rungs:
  * comment stripping, positional ordinals, entity decode (non-cascade),
  * optional-tag nulls, path derivation, robots composition, and the
  * politeness window's ordering contract. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private val ROBOTS = "User-agent: *\nDisallow: /private/\nAllow: /\n"

  private def entries(xml: String, robots: String = ROBOTS)
      : Seq[(Long, String, Option[String], Option[String], String, String, Boolean)] =
    Sitemap.sitemapAdmissionRel(
        Seq((xml, robots)).toDF("xml", "robots"),
        col("xml"), col("robots"), "graftbot", keys = Nil)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)),
        r.getString(4), r.getString(5), r.getBoolean(6))).toSeq
      .sortBy(_._1)

  test("url blocks walk positionally; commented-out blocks never surface") {
    val xml =
      """<?xml version="1.0"?>
        |<!-- header note -->
        |<!--<url><loc>https://decoy.example/x</loc></url>-->
        |<urlset>
        |  <url><loc>https://a.example.com/one</loc></url>
        |  <url><loc>https://a.example.com/two</loc></url>
        |</urlset>""".stripMargin
    val got = entries(xml)
    assert(got.map(e => (e._1, e._2)) == Seq(
      (0L, "https://a.example.com/one"), (1L, "https://a.example.com/two")), got)
    assert(got.forall(_._7), got) // nothing under /private/
  }

  test("loc entity decode: &amp; round-trips; escaped escapes never cascade") {
    val xml =
      """<url><loc>https://h.example.com/p?a=1&amp;b=2</loc></url>
        |<url><loc>https://h.example.com/q?x=&amp;lt;tag&amp;gt;</loc></url>""".stripMargin
    val got = entries(xml)
    assert(got(0)._2 == "https://h.example.com/p?a=1&b=2", got(0))
    // "&amp;lt;" is an ESCAPED "&lt;" — one decode, not two
    assert(got(1)._2 == "https://h.example.com/q?x=&lt;tag&gt;", got(1))
  }

  test("optional lastmod/priority stay null; whitespace around values trims") {
    val xml =
      """<url>
        |  <loc>  https://h.example.com/a  </loc>
        |  <lastmod> 2026-02-03 </lastmod>
        |  <priority>0.8</priority>
        |</url>
        |<url><loc>https://h.example.com/b</loc></url>""".stripMargin
    val got = entries(xml)
    assert(got(0)._2 == "https://h.example.com/a")
    assert(got(0)._3 == Some("2026-02-03") && got(0)._4 == Some("0.8"), got(0))
    assert(got(1)._3 == None && got(1)._4 == None, got(1))
  }

  test("path re-derives through the scheme/authority strip; robots verdict applies per entry") {
    val xml =
      """<url><loc>HTTPS://WWW.H.Example.com/private/x?q=1</loc></url>
        |<url><loc>https://h.example.com/open/y#frag</loc></url>
        |<url><loc>https://h.example.com</loc></url>""".stripMargin
    val got = entries(xml)
    assert(got.map(e => (e._5, e._6, e._7)) == Seq(
      ("h.example.com", "/private/x", false), // case/www/query strip; refused
      ("h.example.com", "/open/y", true),     // fragment cut
      ("h.example.com", "/", true)), got)     // authority-only loc = root
  }

  test("frontier schedule: priority desc nulls last, ord ties, delay spacing per host") {
    val cands = Seq(
      ("h1", 0L, "u0", null.asInstanceOf[String]),
      ("h1", 1L, "u1", "0.9"),
      ("h1", 2L, "u2", "0.9"),
      ("h1", 3L, "u3", "0.2"),
      ("h2", 0L, "v0", null.asInstanceOf[String]))
      .toDF("host", "ord", "loc", "priority")
    val config = Seq(("h1", 2000L), ("h2", 5000L)).toDF("host", "delay_ms")
    val got = Sitemap.frontierSchedule(cands, config)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3),
        r.getLong(5))).toSeq.sortBy(t => (t._1, t._2))
    assert(got == Seq(
      ("h1", 0L, "u1", 0L),     // 0.9, ord 1 before ord 2
      ("h1", 1L, "u2", 2000L),
      ("h1", 2L, "u3", 4000L),
      ("h1", 3L, "u0", 6000L),  // null priority LAST
      ("h2", 0L, "v0", 0L)), got)
  }

  test("frontier schedule carries NO window: a mega host never serializes into one partition") {
    // one deliberately mega host (h1: 2000 admitted URLs) beside a tiny
    // one — the r18 per-host row_number window put all 2000 in ONE
    // partition; the range-sort + partition-offset construction must
    // (a) keep Window out of the physical plan entirely and (b) still
    // produce exact dense per-host ranks
    val cands = ((0L until 2000L).map(i =>
        ("h1", i, s"u$i", if (i % 3 == 0) "0.9" else null)) :+
        (("h2", 0L, "v0", null.asInstanceOf[String])))
      .toDF("host", "ord", "loc", "priority")
    val config = Seq(("h1", 1000L), ("h2", 5000L)).toDF("host", "delay_ms")
    val sched = Sitemap.frontierSchedule(cands, config)
    val plan = sched.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(30).mkString("\n"))
    // r20: neither host-keyed join (config, host-min) may carry a FORCED
    // broadcast hint — both sides are one-row-per-host relations, and at
    // crawl scale distinct hosts run 10^8+, so a forced broadcast is a
    // driver-memory cliff. AQE choosing broadcast at this toy size is
    // fine (size-based, reversible); a hint in the optimized plan is not.
    val opt = sched.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("strategy=broadcast"),
      opt.linesIterator.take(30).mkString("\n"))
    val got = sched.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(3), r.getLong(5)))
    val h1 = got.filter(_._1 == "h1").sortBy(_._2)
    // dense 0..1999, delay-spaced, 0.9-priority block (ords 0,3,6,..)
    // before the null block, ord ascending within each
    assert(h1.map(_._2).toSeq == (0L until 2000L), h1.take(5).toSeq)
    assert(h1.forall(t => t._4 == t._2 * 1000L))
    val expectLocs = ((0L until 2000L by 3) ++
      (0L until 2000L).filter(_ % 3 != 0)).map(i => s"u$i")
    assert(h1.map(_._3).toSeq == expectLocs, h1.take(5).toSeq)
    assert(got.filter(_._1 == "h2").toSeq == Seq(("h2", 0L, "v0", 0L)))
    graft.Caches.release()
  }

  test("a corrupt gz child contributes ZERO entries — never a phantom null row") {
    val idx = Seq((
      "<sitemapindex><sitemap><loc>https://h.example.com/a.xml</loc></sitemap>" +
        "<sitemap><loc>https://h.example.com/b.xml.gz</loc></sitemap></sitemapindex>",
      "User-agent: *\nAllow: /\n")).toDF("xml", "robots")
    val good = "<urlset><url><loc>https://h.example.com/ok</loc></url></urlset>"
      .getBytes("UTF-8")
    // gzip magic then garbage: GunzipBytes degrades to NULL
    val bad = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 1, 2, 3)
    val got = Sitemap.sitemapIndexAdmissionRel(
        idx, col("xml"), col("robots"),
        Seq(("https://h.example.com/a.xml", good),
          ("https://h.example.com/b.xml.gz", bad)).toDF("child_loc", "body"),
        "graftbot", keys = Nil)
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(got.toSeq == Seq(("https://h.example.com/a.xml",
      "https://h.example.com/ok")), got.toSeq)
  }

  test("frontier delta: statuses from the lastmod merge; changed schedules ahead of new; unchanged/gone never schedule") {
    val stored = Seq(
      ("h", "u/old", "2026-01-01"),   // batch has newer -> changed
      ("h", "u/same", "2026-02-02"),  // equal -> unchanged
      ("h", "u/gone", "2026-01-01"))  // absent from batch -> gone
      .toDF("host", "loc", "known_lastmod")
    val batch = Seq(
      ("h", "u/old", 0L, Some("0.5"), Some("2026-03-03")),
      ("h", "u/same", 1L, Some("0.9"), Some("2026-02-02")),
      ("h", "u/new1", 2L, Some("0.9"), None),    // new, high priority
      ("h", "u/new2", 3L, None, Some("2026-01-05"))) // new, no priority
      .toDF("host", "loc", "ord", "priority", "lastmod")
    val config = Seq(("h", 1000L)).toDF("host", "delay_ms")
    val got = Sitemap.frontierDelta(stored, batch, config)
      .collect().map(r => (r.getString(1), r.getString(3),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long]))).toSeq.sortBy(_._1)
    assert(got == Seq(
      // the changed entry outranks BOTH new entries despite 0.5 < 0.9
      ("u/gone", "gone", None, None),
      ("u/new1", "new", Some(1L), Some(1000L)),
      ("u/new2", "new", Some(2L), Some(2000L)),
      ("u/old", "changed", Some(0L), Some(0L)),
      ("u/same", "unchanged", None, None)), got)
    graft.Caches.release()
  }

  test("index discovery starts from robots Sitemap: lines; unnamed and unfetched indexes contribute nothing") {
    val hosts = Seq(
      // names its index (plus a loc the fetcher never returned)
      ("h1", "User-agent: *\nAllow: /\nSitemap: https://h1.example/idx.xml\n" +
        "Sitemap: https://h1.example/missing.xml"),
      // robots with NO Sitemap line: the fetched decoy below must not leak in
      ("h2", "User-agent: *\nAllow: /\n")).toDF("hk", "robots")
    val fetchedIdx = Seq(
      ("https://h1.example/idx.xml",
        "<sitemapindex><sitemap><loc>https://h1.example/c.xml</loc></sitemap></sitemapindex>"),
      ("https://h2.example/decoy.xml",
        "<sitemapindex><sitemap><loc>https://h2.example/d.xml</loc></sitemap></sitemapindex>"))
      .toDF("sitemap_loc", "xml")
    val children = Seq(
      ("https://h1.example/c.xml",
        "<urlset><url><loc>https://h1.example/page</loc></url></urlset>".getBytes("UTF-8")),
      ("https://h2.example/d.xml",
        "<urlset><url><loc>https://h2.example/page</loc></url></urlset>".getBytes("UTF-8")))
      .toDF("child_loc", "body")
    val got = Sitemap.discoveredIndexAdmissionRel(
        hosts, col("robots"), fetchedIdx, children, "graftbot",
        keys = Seq("hk"))
      .select("hk", "child_loc", "loc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("h1", "https://h1.example/c.xml",
      "https://h1.example/page")), got)
  }

  test("fixture sitemaps: one per host, entries in doc order, robots attached") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
    val sm = Sitemap.syntheticSitemaps(docs)
    assert(sm.count() == docs.select("source").distinct().count())
    val row = sm.orderBy("source").select("xml", "robots").head
    assert(row.getString(0).contains("<urlset") &&
      row.getString(0).contains("&amp;"), row.getString(0).take(200))
    assert(row.getString(1).contains("User-agent: *"))
  }
}
