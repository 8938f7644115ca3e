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

  /** Loc transport form: named entities only, or additionally carrying
    * path slashes / ampersands as NUMERIC charrefs (the r19 decode
    * class — decimal and hex variants; the decoded loc is identical,
    * so the reference decode below pins the numeric pass). The charref
    * choices never recreate an entity prefix (the decoded '&' is
    * always followed by 'b='/'y=' query text), mirroring how the
    * escaped transport can never cascade. */
  private val charrefModeGen: Gen[String] = Gen.oneOf("none", "dec", "hex")

  private def escMode(s: String, mode: String): String = mode match {
    case "dec" => esc(s).replace("&amp;", "&#38;").replace("/", "&#47;")
    case "hex" => esc(s).replace("&amp;", "&#x26;").replace("/", "&#x2F;")
    case _ => esc(s)
  }

  private val wsGen: Gen[String] = Gen.oneOf("", " ", "  ", "\n    ")

  private def render(es: List[E], decoy: String, pad: String,
      mode: String = "none"): String = {
    val blocks = es.map { e =>
      s"  <url>\n    <loc>$pad${escMode(e.loc, mode)}$pad</loc>\n" +
        e.lastmod.map(l => s"    <lastmod>$l</lastmod>\n").getOrElse("") +
        e.priority.map(p => s"    <priority>$p</priority>\n").getOrElse("") +
        "  </url>\n"
    }.mkString
    "<?xml version=\"1.0\"?>\n" + decoy +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      blocks + "</urlset>\n"
  }

  // ---- independent reference (imperative, shares no code) ----

  /** Single-pass entity decode: a recognized NUMERIC charref (checked
    * first — the engine's numeric-before-named order) or named entity
    * decodes ONCE; its replacement text is never rescanned
    * (non-cascading by scan order, where the engine achieves it by
    * replacement order; the generators never emit the one corner where
    * those differ — a charref whose decoded '&' is followed by literal
    * entity text). */
  private val NumRef = "^&#(?:[xX]([0-9a-fA-F]{1,6})|([0-9]{1,8}));".r
  private def refDecode(s: String): String = {
    val out = new StringBuilder
    var i = 0
    val ents = List("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&apos;" -> "'", "&quot;" -> "\"")
    while (i < s.length) {
      NumRef.findFirstMatchIn(s.substring(i)) match {
        case Some(m) =>
          val cp = Option(m.group(1)).map(Integer.parseInt(_, 16))
            .getOrElse(m.group(2).toInt)
          out.appendAll(Character.toChars(cp)); i += m.matched.length
        case None =>
          ents.find { case (e, _) => s.startsWith(e, i) } match {
            case Some((e, r)) => out.append(r); i += e.length
            case None => out.append(s.charAt(i)); i += 1
          }
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
      Gen.chooseNum(0, 6).flatMap(Gen.listOfN(_, entryGen)),
      Gen.oneOf("", "<!-- note -->\n",
        "<!--<url><loc>https://decoy.example/x</loc></url>-->\n"),
      wsGen, charrefModeGen) { (es, decoy, pad, mode) =>
      import spark.implicits._
      val xml = render(es, decoy, pad, mode)
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

  // ---- index-of-children (r19): gz bodies, join-by-decoded-loc ----

  private case class Child(loc: String, gz: Boolean, fetched: Boolean,
      es: List[E])

  private val childGen: Gen[Child] = for {
    w <- word
    gz <- Gen.oneOf(true, false)
    fetched <- Gen.frequency(4 -> Gen.const(true), 1 -> Gen.const(false))
    q <- Gen.oneOf("", "?v=1&k=2")
    // n = 0 allowed: an EMPTY child urlset must contribute zero rows,
    // not a phantom null entry (the r19 posexplode_outer fix)
    n <- Gen.chooseNum(0, 4)
    es <- Gen.listOfN(n, entryGen)
  } yield Child(
    s"https://idx.example.com/maps/$w${if (gz) ".xml.gz" else ".xml"}$q",
    gz, fetched, es)

  private def gzipJdk(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  property("index round-trip: child ordinals, gz inflate, join by DECODED loc, per-child entries") =
    Prop.forAll(
      Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, childGen))
        // distinct child locs — the loc is the fetch join key
        .map(_.groupBy(_.loc).map(_._2.head).toList.sortBy(_.loc)),
      Gen.oneOf("", "<!-- note -->\n",
        "<!--<sitemap><loc>https://decoy.example/s.xml</loc></sitemap>-->\n"),
      charrefModeGen) { (children, decoy, mode) =>
      import spark.implicits._
      val indexXml = "<?xml version=\"1.0\"?>\n" + decoy +
        "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        children.map(c =>
          s"  <sitemap>\n    <loc>${escMode(c.loc, mode)}</loc>\n  </sitemap>\n")
          .mkString +
        "</sitemapindex>\n"
      val fetched = children.filter(_.fetched).map { c =>
        val bytes = render(c.es, "", "", mode).getBytes("UTF-8")
        (c.loc, if (c.gz) gzipJdk(bytes) else bytes)
      }
      // an all-unfetched draw would join to nothing by design; keep the
      // property's body meaningful by always fetching the first child
      val fetchedNonEmpty =
        if (fetched.nonEmpty) fetched
        else children.take(1).map(c =>
          (c.loc, render(c.es, "", "", mode).getBytes("UTF-8")))
      val fetchedSet = fetchedNonEmpty.map(_._1).toSet
      val got = Sitemap.sitemapIndexAdmissionRel(
          Seq((indexXml, ROBOTS)).toDF("xml", "robots"),
          col("xml"), col("robots"),
          fetchedNonEmpty.toDF("child_loc", "body"), "graftbot", keys = Nil)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3), Option(r.getString(4)), Option(r.getString(5)),
          r.getString(6), r.getString(7), r.getBoolean(8)))
        .sortBy(t => (t._2, t._3)).toList
      val want = children.zipWithIndex
        .filter(ci => fetchedSet(ci._1.loc))
        .flatMap { case (c, k) =>
          refEntries(render(c.es, "", "", mode)).zipWithIndex.map {
            case ((loc, lm, pr), i) =>
              val (host, path) = refHostPath(loc)
              (c.loc, k.toLong, i.toLong, loc, lm, pr, host, path,
                !path.startsWith("/private/"))
          }
        }.sortBy(t => (t._2, t._3))
      Prop(got == want) :| s"got=$got\nwant=$want\nindex=\n$indexXml"
    }
}
