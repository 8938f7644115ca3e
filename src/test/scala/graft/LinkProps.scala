package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.Web

/** Property-based check of the q173/q176 link walk: for ANY randomly
  * generated page — random anchor counts, random href classes
  * (absolute with case-varied scheme and optional `www.`,
  * protocol-relative, root-relative, document-relative, fragment,
  * javascript:, mailto:, empty), random attribute noise around href,
  * random tag casing, decoy `<a name=..>` elements without href —
  * extraction preserves order, and the host graph and anchor-term
  * index equal an INDEPENDENT plain-Scala resolver (diversifying the
  * oracle beyond the shared generative fixture, the q165/q169-props
  * convention). */
object LinkProps extends Properties("links") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val hostGen: Gen[String] = for {
    a <- word; tld <- Gen.oneOf("com", "org", "net")
  } yield s"$a.example.$tld"

  private val hrefGen: Gen[String] = Gen.frequency(
    3 -> (for {
      sch <- Gen.oneOf("https://", "HTTP://", "HtTpS://")
      www <- Gen.oneOf("", "www.", "WWW.")
      h <- hostGen; p <- Gen.oneOf("", "/x", "/a/b?q=1", "/z#frag")
    } yield s"$sch$www$h$p"),
    2 -> (for { h <- hostGen; p <- Gen.oneOf("", "/i.png") }
      yield s"//$h$p"),
    // userinfo@ and :port in the authority — one physical host must
    // not split into host / host:8080 / user@host graph keys
    1 -> (for {
      u <- Gen.oneOf("", "u@", "u:pw@")
      h <- hostGen; pt <- Gen.oneOf("", ":8080", ":80")
      p <- Gen.oneOf("", "/x")
    } yield s"https://$u$h$pt$p"),
    // empty-authority hrefs (real-crawl artifacts) — must resolve to
    // NULL, never an empty-string graph vertex
    1 -> Gen.oneOf("https://", "//", "///x", "HTTPS:///p"),
    3 -> (for { w <- word } yield s"/$w"),
    2 -> (for { w <- word } yield s"$w/rel.html"),
    1 -> Gen.const("#top"),
    1 -> Gen.const("javascript:void(0)"),
    1 -> Gen.const("MAILTO:ops@example.org"),
    1 -> Gen.const(""))

  private case class A(href: String, words: List[String], html: String)

  private val anchorGen: Gen[A] = for {
    href <- hrefGen
    n <- Gen.chooseNum(0, 4)
    ws <- Gen.listOfN(n, word)
    pre <- Gen.oneOf("", " rel='nofollow'", " class=k", " data-x=\"1\"")
    post <- Gen.oneOf("", " target=_blank")
    tag <- Gen.oneOf("a", "A")
    deco <- Gen.chooseNum(0, 2) // 0 plain, 1 <b>-wrap first word, 2 entity
  } yield {
    val inner = (deco, ws) match {
      case (1, h :: t) => (s"<b>$h</b>" :: t).mkString(" ")
      case (2, h :: t) => (s"$h&amp;" :: t).mkString(" ")
      case _ => ws.mkString(" ")
    }
    val text = (deco, ws) match {
      case (2, h :: t) => (s"$h&" :: t).mkString(" ")
      case _ => ws.mkString(" ")
    }
    A(href, text.split(" ").filter(_.nonEmpty).toList,
      s"""<$tag$pre href="$href"$post>$inner</$tag>""")
  }

  private val pageGen: Gen[(String, List[A])] = for {
    n <- Gen.chooseNum(0, 8)
    as <- Gen.listOfN(n, anchorGen)
    filler <- Gen.listOfN(3, word).map(_.mkString(" "))
    decoy <- Gen.oneOf("", "<a name=\"no-href\">w</a>", "<a>bare</a>")
  } yield (s"<p>$filler</p>$decoy" + as.map(_.html).mkString(s" $filler "),
    as)

  /** Independent resolver — same contract, different code path.
    * Userinfo (`user@`, up to the first `@` in the authority) and
    * `:port` strip off; an empty resolved authority is None. */
  private def refHost(href: String, src: String): Option[String] = {
    val h = href.trim
    val lo = h.toLowerCase
    def norm(s: String): Option[String] = {
      val auth = s.takeWhile(c => c != '/' && c != '?' && c != '#')
      val i = auth.indexOf('@')
      val hp = if (i >= 0) auth.substring(i + 1) else auth
      val host0 = hp.takeWhile(_ != ':').toLowerCase
      val host = if (host0.startsWith("www.")) host0.drop(4) else host0
      if (host.isEmpty) None else Some(host)
    }
    if (lo.startsWith("http://") || lo.startsWith("https://"))
      norm(h.substring(h.indexOf("//") + 2))
    else if (h.startsWith("//")) norm(h.drop(2))
    else if (h.isEmpty || h.startsWith("#") ||
      lo.startsWith("javascript:") || lo.startsWith("mailto:")) None
    else Some(src)
  }

  property("href extraction preserves order; decoys never match") =
    Prop.forAll(pageGen) { case (page, as) =>
      import spark.implicits._
      val got = Seq(page).toDF("h")
        .select(Web.hrefTargets(col("h")).as("t")).head.getSeq[String](0).toList
      Prop(got == as.map(_.href)) :| s"got=$got want=${as.map(_.href)}"
    }

  property("host graph equals the independent resolver's multiset") =
    Prop.forAll(pageGen) { case (page, as) =>
      import spark.implicits._
      val src = "page.example.com"
      val got = Web.outlinkHostGraph(
          Seq((1L, page)).toDF("doc_id", "html")
            .select(col("doc_id"), col("html"), lit(src).as("s")),
          col("html"), col("s"))
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      val want = as.flatMap(a => refHost(a.href, src))
        .groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
      Prop(got == want) :| s"got=$got\nwant=$want\npage=$page"
    }

  property("anchor terms equal the independent resolver's term multiset") =
    Prop.forAll(pageGen) { case (page, as) =>
      import spark.implicits._
      val src = "page.example.com"
      val got = Web.anchorTermIndex(
          Seq((1L, page)).toDF("doc_id", "html")
            .select(col("doc_id"), col("html"), lit(src).as("s")),
          col("html"), col("s"))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val want = as.flatMap(a => refHost(a.href, src).toList.flatMap(h =>
          a.words.map(w => (h, w))))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      Prop(got == want) :| s"got=$got\nwant=$want\npage=$page"
    }
}
