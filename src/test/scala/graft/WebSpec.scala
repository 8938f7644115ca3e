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

  // ---- HTML boilerplate extraction (q168) fixture pins ----

  private def blocksOf(html: String): Seq[(String, String, String)] =
    Seq(html).toDF("h")
      .select(explode(Web.classifiedBlocks(col("h"))).as("b"))
      .select(col("b.text"), col("b.cf"), col("b.cls"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  private val GOOD_P = "the second paragraph of the article holds a calm " +
    "and steady line of prose to close the story and a tidy end" // 22 words, 10 stopwords

  test("jusText block decisions: chrome vanishes, context pass promotes and demotes") {
    val html = s"""<html><head><title>ignored title tag splits</title>
      |<script type="text/javascript">var hidden = "script words must not appear";</script>
      |<style>p { color: red }</style></head>
      |<body><!-- comment words must not appear -->
      |<div id="nav"><a href="/">Home</a> | <a href="/x">Archive</a></div>
      |<p>the quick brown fox and a lazy dog of the meadow keep the garden warm and green to a fault today</p>
      |<H2>A Short Heading</H2>
      |<p>$GOOD_P</p>
      |<div>tiny</div>
      |<div class="footer"><a href="/t">Terms</a> <a href="/p">Privacy</a></div>
      |</body></html>""".stripMargin
    val got = blocksOf(html)
    // no script/style/comment content anywhere
    assert(!got.exists(b => b._1.contains("hidden") || b._1.contains("comment")),
      got.map(_._1).mkString(" | "))
    val byText = got.map { case (t, cf, cls) => (t.split(" ").head, cf, cls) }
    assert(byText == Seq(
      ("ignored", "short", "bad"), // title: short, edge neighbour => bad
      ("Home", "bad", "bad"), // nav: link density 11*5 > 14
      ("the", "good", "good"), // 21 words, 9 stopwords => good
      ("A", "short", "good"), // short BETWEEN two good => promoted
      ("the", "good", "good"), // 22 words, 10 stopwords => good
      ("tiny", "short", "bad"), // short with a bad (footer) neighbour
      ("Terms", "bad", "bad")), // footer: link density
      got.toString)
    // the user-facing extractor returns exactly the final-good blocks
    val main = Seq(html).toDF("h")
      .select(Web.extractMainText(col("h"))).head.getString(0)
    assert(main.startsWith("the quick brown fox") &&
      main.contains("\nA Short Heading\n") && main.endsWith("a tidy end"), main)
  }

  test("inline tags strip, entities decode, uppercase block tags segment") {
    val got = blocksOf(
      "<DIV>rock &amp; roll &lt;tags&gt; stay &quot;quoted&quot; and " +
        "<b>bold</b> words survive with a nod to the close</DIV>")
    assert(got.map(_._1) == Seq(
      "rock & roll <tags> stay \"quoted\" and bold words survive with a nod to the close"),
      got)
  }

  // ---- numeric character references (r17 directive 3) ----

  private def inner(frag: String): String =
    Seq(frag).toDF("f").select(Web.htmlInnerText(col("f"))).head.getString(0)

  test("numeric charrefs decode: decimal, hex, interleaved, next to named entities") {
    assert(inner("it&#8217;s &#x2019; fine") == "it’s ’ fine")
    assert(inner("&#65;&#66;c&#8212;d") == "ABc—d")
    assert(inner("&lt;&#8217;&gt;") == "<’>")
    // uppercase hex marker and hex digits both accepted
    assert(inner("&#X2014; &#x201C;") == "— “")
  }

  test("double-escaped refs do NOT cascade: &amp;#8217; surfaces literal") {
    assert(inner("&amp;#8217;") == "&#8217;")
    assert(inner("a &amp;#169; b &#169; c") == "a &#169; b © c")
  }

  test("out-of-printable-BMP refs stay literal text") {
    // control char, lone surrogate, past-BMP (hex and decimal), overlong digits
    assert(inner("&#8;") == "&#8;")
    assert(inner("&#55296;") == "&#55296;")
    assert(inner("&#x110000;") == "&#x110000;")
    assert(inner("&#1114111;") == "&#1114111;")
    assert(inner("&#000000065;") == "&#000000065;") // 9 digits: outside the bound
    // malformed refs (no digits / unterminated) never match
    assert(inner("&#; &#x; &#8217") == "&#; &#x; &#8217")
  }

  test("br runs segment paragraphs; single br is a soft wrap; no-good pages extract empty") {
    // two-plus <br> = the old-style-HTML paragraph break; one <br> stays
    // inside its block as whitespace
    val split = blocksOf(s"<div>$GOOD_P<br><br>$GOOD_P</div>")
    assert(split.size == 2 && split.forall(_._3 == "good"), split)
    val soft = blocksOf("<div>one line<br>same block here ok</div>")
    assert(soft.map(_._1) == Seq("one line same block here ok"), soft)
    val mixed = blocksOf(s"<div>$GOOD_P<br/><BR >$GOOD_P</div>")
    assert(mixed.size == 2, s"self-closing/cased br runs must split: $mixed")
    // a page with no good blocks extracts the empty string, not nulls
    val none = Seq("<div><a href=\"/\">only nav links here</a></div>").toDF("h")
      .select(Web.extractMainText(col("h"))).head.getString(0)
    assert(none == "", s"expected empty extraction, got '$none'")
  }

  test("neargood resolves by neighbours: one good side promotes, none demotes") {
    val ng = "a stream of nine plain words for filler here" // 9 words, 2 stop
    val nav = "<div><a href=\"/\">home</a> <a href=\"/x\">links</a></div>"
    val isolated = blocksOf(s"$nav<p>$ng</p>$nav")
    assert(isolated.map(b => (b._2, b._3)) ==
      Seq(("bad", "bad"), ("neargood", "bad"), ("bad", "bad")), isolated)
    val nextToGood = blocksOf(s"<p>$GOOD_P</p><p>$ng</p>$nav")
    assert(nextToGood.map(b => (b._2, b._3)) ==
      Seq(("good", "good"), ("neargood", "good"), ("bad", "bad")), nextToGood)
  }

  test("link-density alone kills a long-enough block") {
    val got = blocksOf("<p>read <a href=\"/x\">this great linked article " +
      "now</a> ok fine yes</p>")
    // 9 words (not short), link chars 29 vs text 47: 29*5 > 47 => bad
    assert(got.map(b => (b._2, b._3)) == Seq(("bad", "bad")), got)
  }

  // ---- line-level quality rules (q169) fixture pins ----

  private def lineReport(page: String): Map[String, Long] = {
    val df = Web.lineQualityRel(
      Seq((1L, page)).toDF("doc_id", "page"), col("page"))
    val row = df.head
    df.columns.zip(row.toSeq).collect {
      case (c, v: Long) => c -> v
    }.toMap
  }

  test("line rules: precedence js > punctuation > short, page verdict on both axes") {
    val page = Seq(
      "a good first line with plenty of words here.", // kept
      "powered by JavaScript widgets.", // js (case-insensitive, punct irrelevant)
      "this line never ends", // nopunct
      "so?", // punct ok, 1 word => short
      "a second proper sentence closes well!", // kept
      "quoted lines count as terminated\"", // kept
      "ok then.", // 2 words => short
      "the third full sentence lands the page over the keep floor.", // kept
      "a good first line with plenty of words here.", // duplicate + kept
      "one more decent sentence for margin?" // kept
    ).mkString("\n")
    val r = lineReport(page)
    assert(r("n_lines") == 10 && r("n_distinct") == 9, r)
    assert(r("n_js") == 1 && r("n_nopunct") == 1 && r("n_short") == 2, r)
    assert(r("n_kept") == 6, r)
    // kept words: 9 + 6 + 5 + 11 + 9 + 6
    assert(r("kept_words") == 46, r)
    // 6 kept >= 5 and dup fraction 1/10 <= 0.3
    assert(r("page_pass") == 1, r)
    // duplicate-heavy page fails even with enough kept lines
    val dupPage = (Seq.fill(4)("the same sentence repeats again and again.") ++
      Seq("one honest line to vary the set.", "and a closing line lands here."))
      .mkString("\n")
    val d = lineReport(dupPage)
    assert(d("n_kept") == 6 && d("n_distinct") == 3, d)
    assert(d("page_pass") == 0, s"dup fraction 3/6 must fail the 0.3 gate: $d")
    // a page below the kept floor fails on the other axis
    val thin = lineReport(Seq(
      "a first honest line lands fine.",
      "a second honest line lands fine too.").mkString("\n"))
    assert(thin("n_kept") == 2 && thin("page_pass") == 0, thin)
  }

  // ---- C4 banned-word page filter (q172) pins ----

  private def hits(page: String, words: Seq[String] = Web.BANNED_WORDS): Long =
    Seq(page).toDF("p").select(Web.bannedHits(col("p"), words))
      .head.getLong(0)

  test("banned words match whole words only, case-insensitively, across lines") {
    assert(hits("the word frelk lands here") == 1)
    assert(hits("Snarg and PLUGH and fRELk") == 3)
    // superstrings never match: boundary on both sides
    assert(hits("frelking unfrelk frelks snargy") == 0)
    // punctuation and line breaks are boundaries
    assert(hits("frelk, snarg.\nplugh!") == 3)
    assert(hits("clean page with ordinary words") == 0)
    // parameterized set: a different list matches its own words
    assert(hits("frelk ordinary", Seq("ordinary")) == 1)
  }

  test("banned filter composes with the line verdict into final_pass") {
    import org.apache.spark.sql.Row
    val passing = (1 to 6).map(i => s"an honest line number $i lands fine.")
    val cases = Seq(
      (1L, passing.mkString("\n"), 0L, 1L, 1L), // clean + passing page
      (2L, (passing :+ "and one frelk slips in late.").mkString("\n"), 1L, 1L, 0L),
      (3L, "too thin. to pass, frelk aside.", 1L, 0L, 0L))
    val df = cases.map(c => (c._1, c._2)).toDF("doc_id", "page")
      .select(col("doc_id"), col("page"),
        Web.bannedHits(col("page")).as("banned_hits"))
    val rep = Web.lineQualityRel(df, col("page"), passthrough = Seq("banned_hits"))
      .withColumn("final_pass",
        (col("page_pass") === 1 && col("banned_hits") === 0).cast("long"))
      .select(col("doc_id"), col("banned_hits"), col("page_pass"), col("final_pass"))
      .collect().map { case Row(id: Long, b: Long, p: Long, f: Long) => (id, b, p, f) }
      .sortBy(_._1).toSeq
    assert(rep == cases.map(c => (c._1, c._3, c._4, c._5)), rep)
  }

  test("line rules compose downstream of extraction (q168 -> q169 shape)") {
    // main-content text from the HTML extractor feeds the line gate the
    // way a production pipeline chains them; block texts become lines
    val html = s"<p>$GOOD_P.</p><div><a href=\"/\">nav nav nav</a></div>" +
      s"<p>$GOOD_P!</p><p>$GOOD_P</p>"
    val main = Seq(html).toDF("h")
      .select(Web.extractMainText(col("h")).as("page"))
    val r = Web.lineQualityRel(
      main.select(lit(1L).as("doc_id"), col("page")), col("page")).head
    // three good blocks survive extraction; the unterminated one then
    // falls to the punctuation line rule
    assert(r.getAs[Long]("n_lines") == 3 && r.getAs[Long]("n_kept") == 2 &&
      r.getAs[Long]("n_nopunct") == 1, r.toString)
  }

  // ---------------------------------------------------------------- q175

  test("gopher rules: each rule kills its own pathology, the clean page passes") {
    // every page but the target's keeps the other seven rules satisfied
    val stop = "the of and to a the of and" // required-word coverage
    val goodLine = s"alpha beta gamma delta $stop words."
    val clean = Seq.fill(5)(goodLine).mkString("\n")
    val cases = Seq(
      ("clean", clean, 1L),
      ("too-few-words", s"$stop.", 0L), // 9 words < 20
      ("short-words", ("a b " * 15 + stop + ".").trim, 0L), // mean len < 3
      ("symbol-heavy", Seq.fill(5)(s"$goodLine ## ## ##").mkString("\n"), 0L),
      ("all-bullets", Seq.fill(5)(s"- $goodLine").mkString("\n"), 0L),
      ("ellipsis-heavy", Seq.fill(5)(s"$goodLine..").mkString("\n"), 0L),
      ("numeric-words", Seq.fill(5)(s"12 345 6789 01 23 45 $stop.").mkString("\n"), 0L),
      ("no-required-words", Seq.fill(5)("alpha beta gamma delta epsilon zeta.").mkString("\n"), 0L))
    val got = cases.map(c => (c._1, c._2)).toDF("doc_id", "page")
    // doc_id here is the case label: gopherRulesRel only reads it through
    val rep = Web.gopherRulesRel(got, col("page"))
      .select(col("doc_id"), col("gopher_pass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((name, _, want) <- cases)
      assert(rep(name) == want, s"$name: got ${rep(name)}, want $want")
  }

  test("gopher signals count what they claim on a hand-built page") {
    val page = "- the of and to a first." + "\n" +
      "plain words here with no marks..." + "\n" +
      "symbols ## here and more." // '##' + the '...' = 3 symbol hits
    val r = Web.gopherRulesRel(
      Seq((1L, page)).toDF("doc_id", "page"), col("page")).head
    assert(r.getAs[Long]("n_lines") == 3 && r.getAs[Long]("n_bullet") == 1 &&
      r.getAs[Long]("n_ellipsis_end") == 1 && r.getAs[Long]("n_symbols") == 3 &&
      r.getAs[Long]("req_stop_hits") == 5, r.toString)
  }

  // ---------------------------------------------------------------- q182

  test("head metadata: decode, absence semantics, first-match, SURT shape") {
    val html = """<HTML LANG="en-US"><head>
      |<title>A &amp; B &#8212; site</title>
      |<meta name="description" content="first desc">
      |<meta name="description" content="second desc">
      |<link rel="canonical" href="https://ex.com/a">
      |</head><body></body></html>""".stripMargin
    val r = Seq(html).toDF("h").select(
      Web.htmlLangAttr(col("h")).as("lang"),
      Web.htmlTitle(col("h")).as("title"),
      Web.metaContent(col("h"), "description").as("d"),
      Web.metaContent(col("h"), "keywords").as("k"),
      Web.relCanonical(col("h")).as("c"),
      Web.surtKey(lit("sub.example.com"), lit("/docs/7/")).as("s")).head
    assert(r.getString(0) == "en-US")
    assert(r.getString(1) == "A & B \u2014 site", r.getString(1))
    assert(r.getString(2) == "first desc") // first matching meta wins
    assert(r.isNullAt(3)) // absent meta is NULL, not ''
    assert(r.getString(4) == "https://ex.com/a")
    assert(r.getString(5) == "com,example,sub)/docs/7/", r.getString(5))
    val bare = Seq("<html><head></head><body>x</body></html>").toDF("h")
      .select(Web.htmlLangAttr(col("h")).as("l"),
        Web.htmlTitle(col("h")).as("t"), Web.relCanonical(col("h")).as("c")).head
    assert(bare.getString(0) == "" && bare.getString(1) == "" && bare.isNullAt(2))
  }

  // ---------------------------------------------------------------- q181

  test("extract->admission boundary: rules run on the EXTRACTED population") {
    // a page whose RAW words would sail through the doc-shape gate but
    // whose every block is link-heavy boilerplate: extraction yields
    // the empty page, so the composed verdict must fail on n_words —
    // the exact boundary drift a composition oracle exists to catch
    // stopword-dense enough for the jusText good class (>= 8%), long
    // enough words for the Gopher mean-length floor (>= 3)
    val base = "the of and alpha beta gamma delta epsilon"
    val stop = Seq.fill(4)(base).mkString(" ")
    val boiler = (1 to 4).map(i =>
      s"""<div><a href="/$i">$stop</a></div>""").mkString
    val good = s"<p>$stop</p>"
    val rows = Web.gopherRulesRel(
      Web.classifiedBlocksRel(
          Seq((1L, boiler), (2L, good + boiler)).toDF("doc_id", "h"),
          col("h"))
        .select(col("doc_id"), array_join(transform(
          filter(col("blocks"), b => b.getField("cls") === "good"),
          b => b.getField("text")), "\n").as("p")),
      col("p"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("gopher_pass"))).toMap
    assert(rows(1L) == (0L, 0L), rows) // all-boilerplate: empty extraction fails
    assert(rows(2L)._1 > 20L && rows(2L)._2 == 1L, rows) // content block passes
  }

  // ---------------------------------------------------------------- q178

  test("host rank: internal self-loops are excluded; sinks hold rank via symmetrization") {
    // one page linking itself (internal) and one external host: the
    // internal edge must NOT feed the rank (a host voting for itself),
    // and the pure-sink external host must still receive rank mass
    val pages = Seq(
      (1L, """<a href="/self">i</a><a href="https://sink.org/x">e</a>"""))
      .toDF("doc_id", "html")
      .select(col("doc_id"), col("html"), lit("page.com").as("s"))
    val ext = Web.outlinkHostGraph(pages, col("html"), col("s"))
      .filter(col("internal") === 0)
      .select(col("src_host").as("src"), col("dst_host").as("dst"),
        col("n_links").as("w"))
    val sym = ext.unionAll(ext.select(col("dst").as("src"),
      col("src").as("dst"), col("w")))
    val ranks = graft.operators.IterativeGraph
      .pageRankWeighted(sym, 2, 10000000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.keySet == Set("page.com", "sink.org"), ranks)
    // two-vertex symmetric graph: equal mass both sides
    assert(ranks("page.com") == ranks("sink.org"), ranks)
  }

  // ---------------------------------------------------------------- q173

  private def resolved(pairs: (String, String)*): Seq[Option[String]] =
    pairs.toSeq.toDF("href", "src")
      .select(Web.resolveLinkHost(col("href"), col("src")).as("h"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("href extraction: document order, attribute noise, case, multiline tags") {
    val html = """<a href="/a">x</a><A CLASS="z" HREF="/b">y</A>
      |<a rel="nofollow"
      |   href="https://ex.org/c">z</a><a name="no-href">w</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(Web.hrefTargets(col("h")).as("t")).head.getSeq[String](0)
    assert(got == Seq("/a", "/b", "https://ex.org/c"), got)
  }

  test("link-host resolution: every scheme class lands on the right host") {
    val got = resolved(
      "https://CDN2.Example.org/x" -> "page.com", // absolute: own authority
      "HTTP://www.Partner.example.COM/d?x=1" -> "page.com", // caps + www strip
      "//img.example.net/i.png" -> "page.com", // protocol-relative
      "/root/path" -> "page.com", // root-relative: page host
      "notes/rel.html" -> "page.com", // document-relative: page host
      "#frag" -> "page.com", // fragment-only: dropped
      "javascript:void(0)" -> "page.com", // pseudo-link: dropped
      "MAILTO:ops@example.org" -> "page.com", // pseudo-link: dropped
      "" -> "page.com") // empty href: dropped
    assert(got == Seq(Some("cdn2.example.org"), Some("partner.example.com"),
      Some("img.example.net"), Some("page.com"), Some("page.com"),
      None, None, None, None), got)
  }

  test("host extraction: userinfo/port strip and IPv6 bracket carve-out") {
    val got = resolved(
      "https://Example.org:8080/x" -> "page.com", // :port strips
      "https://user:pw@Example.org/x" -> "page.com", // userinfo strips
      "https://u@www.Example.org:443/x" -> "page.com", // both + www
      // bracketed IP-literals (RFC 3986): the whole bracket group IS the
      // host — the r18 ':port' cut truncated these to '[' (advisor-found)
      "https://[::1]:8080/x" -> "page.com",
      "https://[2001:DB8::1]/x" -> "page.com",
      "https://u@[::1]:8080/x" -> "page.com")
    assert(got == Seq(Some("example.org"), Some("example.org"),
      Some("example.org"), Some("[::1]"), Some("[2001:db8::1]"),
      Some("[::1]")), got)
  }

  test("anchor terms: inline markup strips, entities decode, drop classes drop") {
    val pages = Seq(
      (1L, """<a href="/guide">the <b>full</b> guide</a>
             |<a href="https://ex.org/">Smith &amp; Sons</a>
             |<a href="javascript:void(0)">never counted</a>""".stripMargin),
      (2L, """<a href="/guide">the guide</a><a href="#top">skip</a>"""),
      (3L, "anchor-free page")).toDF("doc_id", "html")
    val got = Web.anchorTermIndex(
        pages.select(col("doc_id"), col("html"), lit("page.com").as("src")),
        col("html"), col("src"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("ex.org", "&", 1L), ("ex.org", "Smith", 1L), ("ex.org", "Sons", 1L),
      ("page.com", "full", 1L), ("page.com", "guide", 2L),
      ("page.com", "the", 2L)), got)
  }

  test("host graph aggregates: multiplicity vs page counts, zero-href page drops") {
    val pages = Seq(
      (1L, """<a href="/a">i</a><a href="/b">i</a><a href="https://ex.org/">e</a>"""),
      (2L, """<a href="https://ex.org/x">e</a><a href="#top">f</a>"""),
      (3L, "no links at all")).toDF("doc_id", "html")
    val g = Web.outlinkHostGraph(
        pages.select(col("doc_id"), col("html"), lit("page.com").as("src")),
        col("html"), col("src"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(g == Seq(
      ("page.com", "ex.org", 2L, 2L, 0L),      // 1 link from each of 2 pages
      ("page.com", "page.com", 2L, 1L, 1L)), g) // 2 links from 1 page
  }

  test("canonical collapse: declared canonical beats string canonicalization; self-canonical target survives; noindex opts out") {
    import graft.functions.Web
    val pages = Seq(
      // cluster /p/1: two declaring variants (ids 1, 2), the clean page
      // (id 7 — NOT the min), one non-declaring variant (id 9)
      (1L, "https://s.com/p/1?v=0",
        "<html><head><link rel=\"canonical\" href=\"https://s.com/p/1\"></head><body></body></html>"),
      (2L, "https://s.com/p/1?v=1",
        "<html><head><link rel=\"canonical\" href=\"https://s.com/p/1\"></head><body></body></html>"),
      (7L, "https://s.com/p/1", "<html><head></head><body></body></html>"),
      (9L, "https://s.com/p/1?v=9", "<html><head></head><body></body></html>"),
      // cluster /p/2: declaring variants ONLY (clean page opted out via
      // noindex) -> fallback survivor = min doc_id among the variants
      (4L, "https://s.com/p/2?v=0",
        "<html><head><link rel=\"canonical\" href=\"https://s.com/p/2\"></head><body></body></html>"),
      (6L, "https://s.com/p/2?v=1",
        "<html><head><link rel=\"canonical\" href=\"https://s.com/p/2\"></head><body></body></html>"),
      (3L, "https://s.com/p/2",
        "<html><head><meta name=\"robots\" content=\"noindex\"></head><body></body></html>"))
      .toDF("doc_id", "u", "h")
    val got = Web.canonicalCollapse(pages, col("u"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(got == Seq(
      ("s.com/p/1", 3L, 2L, 7L),      // clean page survives, not id 1
      ("s.com/p/1?v=9", 1L, 0L, 9L),  // non-declaring variant stays apart
      ("s.com/p/2", 2L, 2L, 4L)), got) // noindex page gone; fallback min
  }
}
