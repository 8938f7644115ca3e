package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sources.Sitemap

/** Property-based check of the sitemap walk: for ANY randomly generated
  * sitemap — random entry counts, entity-escaped locs (every generated
  * query string carries `&`), scheme/case/`www.` variation, optional
  * lastmod/priority with random internal whitespace, random comments
  * INCLUDING commented-out decoy `<url>` blocks — extraction recovers
  * every entry's ordinal, decoded loc, optional tags, canonical host,
  * path and admission verdict, matching an INDEPENDENT imperative
  * parser/decoder (the LinkProps/RobotsProps/WarcProps convention:
  * diversifying the oracle beyond the generative fixture). */
object SitemapProps extends Properties("sitemap") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  // robots under test is property-pinned separately (RobotsProps); here
  // a fixed two-rule file keeps the verdict reference trivial while
  // still exercising the per-entry composition
  private val ROBOTS = "User-agent: *\nDisallow: /private/\nAllow: /\n"

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private case class E(loc: String, lastmod: Option[String],
      priority: Option[String])

  private val entryGen: Gen[E] = for {
    sch <- Gen.oneOf("https://", "HTTP://", "HtTps://")
    www <- Gen.oneOf("", "www.", "WWW.")
    h <- word.map(w => s"$w.example.com")
    priv <- Gen.frequency(3 -> Gen.const(""), 1 -> Gen.const("private/"))
    p1 <- word; p2 <- word
    q <- Gen.oneOf("", s"?a=1&b=2", s"?x=$p2&y=<z>&n='q'")
    frag <- Gen.oneOf("", "#top")
    lm <- Gen.option(Gen.chooseNum(1, 28).map(d => f"2026-03-$d%02d"))
    pr <- Gen.option(Gen.chooseNum(0, 9).map(k => s"0.$k"))
  } yield E(s"$sch$www$h/$priv$p1/$p2$q$frag", lm, pr)

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("'", "&apos;").replace("\"", "&quot;")

  private val wsGen: Gen[String] = Gen.oneOf("", " ", "  ", "\n    ")

  private def render(es: List[E], decoy: String, pad: String): String = {
    val blocks = es.map { e =>
      s"  <url>\n    <loc>$pad${esc(e.loc)}$pad</loc>\n" +
        e.lastmod.map(l => s"    <lastmod>$l</lastmod>\n").getOrElse("") +
        e.priority.map(p => s"    <priority>$p</priority>\n").getOrElse("") +
        "  </url>\n"
    }.mkString
    "<?xml version=\"1.0\"?>\n" + decoy +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      blocks + "</urlset>\n"
  }

  // ---- independent reference (imperative, shares no code) ----

  /** Single-pass entity decode: a recognized entity decodes ONCE; its
    * replacement text is never rescanned (non-cascading by scan order,
    * where the engine achieves it by replacement order). */
  private def refDecode(s: String): String = {
    val out = new StringBuilder
    var i = 0
    val ents = List("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&apos;" -> "'", "&quot;" -> "\"")
    while (i < s.length) {
      ents.find { case (e, _) => s.startsWith(e, i) } match {
        case Some((e, r)) => out.append(r); i += e.length
        case None => out.append(s.charAt(i)); i += 1
      }
    }
    out.toString
  }

  private def refEntries(xml: String): List[(String, Option[String], Option[String])] = {
    // strip comments by index scan
    val sb = new StringBuilder
    var i = 0
    while (i < xml.length) {
      if (xml.startsWith("<!--", i)) {
        val e = xml.indexOf("-->", i)
        i = if (e < 0) xml.length else e + 3
      } else { sb.append(xml.charAt(i)); i += 1 }
    }
    val body = sb.toString
    def inner(block: String, tag: String): Option[String] = {
      val a = block.indexOf(s"<$tag>")
      if (a < 0) None
      else {
        val b = block.indexOf(s"</$tag>", a)
        Some(block.substring(a + tag.length + 2, b).trim)
      }
    }
    var out = List.empty[(String, Option[String], Option[String])]
    var j = 0
    while (true) {
      val a = body.indexOf("<url>", j)
      if (a < 0) return out.reverse
      val b = body.indexOf("</url>", a)
      val block = body.substring(a + 5, b)
      out = ((refDecode(inner(block, "loc").getOrElse("")),
        inner(block, "lastmod"), inner(block, "priority"))) :: out
      j = b + 6
    }
    out.reverse
  }

  private def refHostPath(loc: String): (String, String) = {
    val noScheme = loc.replaceFirst("(?i)^https?://", "")
    val auth = noScheme.takeWhile(c => c != '/' && c != '?' && c != '#')
    val host0 = auth.takeWhile(_ != ':').toLowerCase
    val host = if (host0.startsWith("www.")) host0.drop(4) else host0
    val rest = noScheme.drop(auth.length)
    val path = rest.takeWhile(c => c != '?' && c != '#')
    (host, if (path.isEmpty) "/" else path)
  }

  property("entries round-trip: ordinals, decoded locs, tags, host/path, verdicts") =
    Prop.forAll(
      Gen.chooseNum(1, 6).flatMap(Gen.listOfN(_, entryGen)),
      Gen.oneOf("", "<!-- note -->\n",
        "<!--<url><loc>https://decoy.example/x</loc></url>-->\n"),
      wsGen) { (es, decoy, pad) =>
      import spark.implicits._
      val xml = render(es, decoy, pad)
      val got = Sitemap.sitemapAdmissionRel(
          Seq((xml, ROBOTS)).toDF("xml", "robots"),
          col("xml"), col("robots"), "graftbot", keys = Nil)
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)),
          r.getString(4), r.getString(5), r.getBoolean(6)))
        .sortBy(_._1).toList
      val want = refEntries(xml).zipWithIndex.map {
        case ((loc, lm, pr), i) =>
          val (host, path) = refHostPath(loc)
          (i.toLong, loc, lm, pr, host, path,
            !path.startsWith("/private/"))
      }
      Prop(got == want) :| s"got=$got\nwant=$want\nxml=\n$xml"
    }
}
