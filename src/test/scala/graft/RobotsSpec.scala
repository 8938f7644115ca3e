package graft

import org.apache.spark.sql.functions._

import graft.functions.Robots

/** Parse and precedence semantics of the robots.txt evaluator: group
  * selection, header-run widening, comments/blank lines, the empty
  * Disallow, and the RFC 9309 longest-match + Allow-tie verdict. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(robots: String, agent: String, paths: String*)
      : Seq[(Boolean, String)] =
    paths.toSeq.toDF("path")
      .select(Robots.robotsVerdict(col("path"),
        Robots.robotsRules(lit(robots), agent)).as("v"))
      .collect().map(r => (r.getStruct(0).getBoolean(0),
        r.getStruct(0).getString(1))).toSeq

  test("longest match wins; Allow wins length ties; no match allows") {
    val robots =
      """User-agent: *
        |Disallow: /docs/
        |Allow: /docs/pub/
        |Disallow: /tmp
        |Allow: /tmp""".stripMargin
    val got = verdicts(robots, "anybot",
      "/docs/secret", "/docs/pub/x", "/tmp/y", "/open/z")
    assert(got == Seq(
      (false, "/docs/"), // only the Disallow matches
      (true, "/docs/pub/"), // longer Allow beats shorter Disallow
      (true, "/tmp"), // exact length tie: Allow wins
      (true, "")), got) // nothing matches: crawlable by default
  }

  test("agent-specific groups replace the wildcard groups entirely") {
    val robots =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: GraftBot
        |Disallow: /private/""".stripMargin
    // the * group's root Disallow must NOT leak into graftbot's view
    assert(verdicts(robots, "graftbot", "/a", "/private/x") ==
      Seq((true, ""), (false, "/private/")))
    // an unrelated agent sees only the wildcard group
    assert(verdicts(robots, "otherbot", "/a") == Seq((false, "/")))
    // a specific group with ZERO rules still preempts (RFC 9309 §2.2.1:
    // a matching group means "these are your restrictions" — none)
    val emptySpec =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: GraftBot""".stripMargin
    assert(verdicts(emptySpec, "graftbot", "/a") == Seq((true, "")))
  }

  test("consecutive user-agent lines share one group; a UA line after rules starts a new one") {
    val robots =
      """User-agent: badbot
        |User-agent: graftbot
        |Disallow: /shared/
        |User-agent: badbot
        |Disallow: /badonly/""".stripMargin
    // first group names graftbot too -> its rule applies; the second
    // group (started by a UA line AFTER rules) names only badbot
    assert(verdicts(robots, "graftbot", "/shared/x", "/badonly/y") ==
      Seq((false, "/shared/"), (true, "")))
  }

  test("comments strip, directive names are case-insensitive, empty Disallow is no restriction") {
    val robots =
      """# top comment
        |USER-AGENT: *   # trailing comment
        |DISALLOW: /a  # comment after value
        |disallow:
        |ALLOW: /a/b""".stripMargin
    assert(verdicts(robots, "anybot", "/a/x", "/a/b/c", "/z") ==
      Seq((false, "/a"), (true, "/a/b"), (true, "")))
  }

  test("RFC 9309 wildcards: * spans any sequence, trailing $ anchors, elsewhere $ is literal") {
    val robots =
      """User-agent: *
        |Disallow: /a/*/secret
        |Disallow: /*.pdf$
        |Allow: /$
        |Disallow: /e$f""".stripMargin
    assert(verdicts(robots, "anybot",
      "/a/x/secret", "/a/x/y/secretz", "/a/secret",
      "/files/doc.pdf", "/files/doc.pdfx",
      "/", "/e$f/zz") == Seq(
      (false, "/a/*/secret"), // * spans one segment
      (false, "/a/*/secret"), // unanchored pattern tolerates a suffix
      (true, ""),             // * never matches "backwards" past its cursor
      (false, "/*.pdf$"),     // anchored extension rule
      (true, ""),             // $ means END: .pdfx escapes
      (true, "/$"),           // exact-root Allow (anchor, no star)
      (false, "/e$f")))       // mid-pattern $ is a literal octet
  }

  test("longest raw pattern wins across wildcard and literal rules; Allow wins pattern-length ties") {
    val robots =
      """User-agent: *
        |Allow: /docs/
        |Disallow: /docs/*.js$
        |Disallow: /p/q
        |Allow: /p/*""".stripMargin
    assert(verdicts(robots, "anybot",
      "/docs/app.js", "/docs/app.jsx", "/p/q") == Seq(
      (false, "/docs/*.js$"), // 11-char wildcard beats the 6-char Allow
      (true, "/docs/"),       // anchored rule misses: literal Allow rules
      (true, "/p/*")))        // literal-vs-wildcard 4-char tie: Allow wins
  }

  test("percent normalization: unreserved decodes, reserved uppercases, raw non-ASCII encodes") {
    val got = Seq("/caf%c3%a9", "/café", "/%61%41%7e", "/a%2Fb", "/%zz",
      "/a/b", "/%2f%24", "/*%a9$")
      .toDF("s").select(Robots.pctNormalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "/caf%C3%A9",  // reserved-range hex uppercases
      "/caf%C3%A9",  // raw é percent-encodes to the same form
      "/aA~",        // unreserved octets decode
      "/a%2Fb",      // encoded slash NEVER becomes a path slash
      "/%25zz",      // stray '%' encodes to its own octet form (r20)
      "/a/b",        // ASCII no-op (guard path)
      "/%2F%24",     // $ and / are reserved: uppercase, never decode
      "/*%A9$"), got) // metacharacters survive normalization
  }

  test("§2.2.2 equivalence: encoded rules govern decoded paths and vice versa") {
    val robots =
      """User-agent: *
        |Disallow: /caf%c3%a9
        |Allow: /t%69lde*~$
        |Disallow: /ti*""".stripMargin
    val got = verdicts(robots, "anybot",
      "/café/menu",   // raw path vs encoded rule
      "/caf%C3%A9/x", // encoded path (either hex case) vs encoded rule
      "/tilde/%7E",   // raw %69='i' decodes in the rule; path %7E -> ~
      "/tilde/x")     // the Allow's ~$ anchor fails; the /ti* Disallow governs
    assert(got == Seq(
      (false, "/caf%c3%a9"),
      (false, "/caf%c3%a9"),
      (true, "/t%69lde*~$"), // longer raw pattern (11) beats /ti* (4)
      (false, "/ti*")), got)
  }

  test("rules before any user-agent line are ignored") {
    val robots =
      """Disallow: /orphan/
        |User-agent: *
        |Disallow: /real/""".stripMargin
    assert(verdicts(robots, "anybot", "/orphan/x", "/real/x") ==
      Seq((true, ""), (false, "/real/")))
  }

  private def delayOf(robots: String, agent: String): Option[Double] =
    Option(Seq(robots).toDF("r")
      .select(Robots.robotsCrawlDelay(col("r"), agent).as("d"))
      .head.get(0)).map(_.asInstanceOf[Double])

  test("Crawl-delay is group-scoped: specific preempts wildcard, decoys never leak") {
    val robots =
      """User-agent: badbot
        |Disallow: /
        |Crawl-delay: 99
        |
        |User-agent: *
        |Disallow: /x
        |Crawl-delay: soon
        |Crawl-delay: 2.5
        |Crawl-delay: 7
        |
        |User-agent: GraftBot
        |Allow: /
        |CRAWL-DELAY: 4""".stripMargin
    // specific group wins; key case-insensitive
    assert(delayOf(robots, "graftbot") == Some(4.0))
    // wildcard class: the invalid 'soon' skips, first VALID (2.5) wins
    assert(delayOf(robots, "otherbot") == Some(2.5))
    // a preempting specific group with NO delay = no declared delay
    val noSpecDelay = "User-agent: *\nCrawl-delay: 3\n\nUser-agent: GraftBot\nAllow: /"
    assert(delayOf(noSpecDelay, "graftbot") == None)
    assert(delayOf(noSpecDelay, "anybot") == Some(3.0))
    assert(delayOf("User-agent: *\nDisallow: /x", "anybot") == None)
  }

  test("a Crawl-delay line ends a header run like a rule; Sitemap lines do not") {
    // crawl-delay between UA runs: the second UA line starts a NEW
    // group, so the Disallow belongs to graftbot only
    val cd =
      """User-agent: *
        |Crawl-delay: 1
        |User-agent: GraftBot
        |Disallow: /g/""".stripMargin
    assert(verdicts(cd, "otherbot", "/g/x") == Seq((true, "")))
    assert(verdicts(cd, "graftbot", "/g/x") == Seq((false, "/g/")))
    // a global Sitemap line between UA lines leaves the header run
    // open: both agents share one group
    val sm =
      """User-agent: *
        |Sitemap: https://x.example/s.xml
        |User-agent: GraftBot
        |Disallow: /g/""".stripMargin
    assert(verdicts(sm, "otherbot", "/g/x") == Seq((false, "/g/")))
  }

  test("Sitemap: lines collect globally in file order, any case, empties dropped") {
    val robots =
      """Sitemap: https://h.example/a.xml
        |User-agent: badbot
        |Disallow: /
        |sitemap: https://h.example/b.xml.gz
        |User-agent: *
        |Allow: /
        |Sitemap:
        |SITEMAP: https://h.example/c.xml # note""".stripMargin
    val got = Seq(robots).toDF("r")
      .select(Robots.robotsSitemaps(col("r")).as("s"))
      .head.getSeq[String](0).toList
    assert(got == List("https://h.example/a.xml",
      "https://h.example/b.xml.gz", "https://h.example/c.xml"), got)
  }
}
