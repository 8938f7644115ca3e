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
      "/%zz",        // invalid escape stays literal
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
}
