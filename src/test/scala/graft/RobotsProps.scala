package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.Robots

/** Property-based check of the robots.txt evaluator: for ANY randomly
  * generated file — random group counts, multi-UA header runs, rules
  * before any group, comments, blank lines, empty directives, case
  * variation — and any path, the Spark fold + longest-match verdict
  * equal an INDEPENDENT imperative parser/matcher (diversifying the
  * oracle beyond the generative fixture, the LinkProps convention). */
object RobotsProps extends Properties("robots") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(16)

  private lazy val spark = SparkSpec.session

  private val AGENT = "graftbot"

  private val uaGen: Gen[String] =
    Gen.oneOf("*", "graftbot", "GraftBot", "badbot", "otherbot")
  private val prefixGen: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("/a", "/a/b", "/docs/", "/docs/1", "/r/", "/", "/x"),
    // RFC 9309 §2.2.3 wildcard patterns over the same path alphabet —
    // mid-*, leading *, anchored, *-then-anchor, bare * and bare $
    // (the r18 advisor gap: bare '$' strips to the empty segment, which
    // the engine's pass-through once turned into match-everything), a
    // literal mid-$
    3 -> Gen.oneOf("/a*", "/*", "/docs/*", "/a/*/c", "/*7$", "/docs/1$",
      "/a/b$", "*", "/a$", "/*c*", "/docs/*2$", "$", "*$"),
    // §2.2.2 percent-equivalence classes (r19): encoded-unreserved
    // (%61='a', %41='A', %7E='~'), encoded-reserved in both hex cases
    // (%2F, %c3%a9 = é's UTF-8 octets), raw non-ASCII, an invalid
    // escape ('%zz' — stays literal), and wildcard/percent compounds
    2 -> Gen.oneOf("/caf%C3%A9", "/caf%c3%a9", "/café", "/%61", "/a%2Fb",
      "/%7E", "/~", "/b%41*", "/*%a9$", "/%zz", "/caf%C3%A9$"))
  private val pathGen: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("/a", "/a/bc", "/a/b/c", "/docs/1", "/docs/12", "/r/7",
      "/x", "/zzz", "/"),
    2 -> Gen.oneOf("/café", "/caf%c3%a9", "/caf%C3%A9", "/a", "/A", "/%41",
      "/a/b", "/a%2Fb", "/~", "/%7E", "/%7e", "/%zz", "/bA7"))

  private val ruleLineGen: Gen[String] = for {
    dir <- Gen.oneOf("Allow", "allow", "Disallow", "DISALLOW")
    p <- Gen.frequency(6 -> prefixGen.map(x => x), 1 -> Gen.const(""))
    pad <- Gen.oneOf("", " ", "  ")
    cmt <- Gen.frequency(4 -> Gen.const(""), 1 -> Gen.const(" # note"))
  } yield s"$dir:$pad$p$cmt"

  // r20: Crawl-delay group rules — valid integers/decimals, invalid
  // values ('soon', empty, negative) that must be skipped without
  // ending the parse, and case-varied keys
  private val delayLineGen: Gen[String] = for {
    key <- Gen.oneOf("Crawl-delay", "crawl-delay", "CRAWL-DELAY")
    v <- Gen.frequency(4 -> Gen.chooseNum(0, 99).map(_.toString),
      2 -> Gen.oneOf("0.5", "2.25", "10"),
      2 -> Gen.oneOf("soon", "", "-1", "1s"))
    cmt <- Gen.frequency(4 -> Gen.const(""), 1 -> Gen.const(" # pace"))
  } yield s"$key: $v$cmt"

  // r20: global Sitemap lines — case-varied key, occasionally empty
  private val sitemapLineGen: Gen[String] = for {
    key <- Gen.oneOf("Sitemap", "sitemap", "SiteMap")
    v <- Gen.frequency(5 -> Gen.oneOf(
      "https://x.example/s.xml", "https://x.example/a/b.xml.gz",
      "http://y.example/idx.xml"), 1 -> Gen.const(""))
  } yield s"$key: $v"

  private val groupGen: Gen[List[String]] = for {
    nUa <- Gen.chooseNum(1, 3)
    uas <- Gen.listOfN(nUa, uaGen)
    nR <- Gen.chooseNum(0, 4)
    rules <- Gen.listOfN(nR,
      Gen.frequency(4 -> ruleLineGen, 1 -> delayLineGen,
        1 -> sitemapLineGen))
    blanks <- Gen.oneOf(List(""), Nil)
  } yield uas.map(u => s"User-agent: $u") ++ rules ++ blanks

  private val robotsGen: Gen[String] = for {
    orphan <- Gen.frequency(3 -> Gen.const(Nil),
      1 -> ruleLineGen.map(List(_))) // rules before any group: ignored
    nG <- Gen.chooseNum(0, 4)
    gs <- Gen.listOfN(nG, groupGen)
    head <- Gen.oneOf(Nil, List("# policy file"))
    tailSm <- Gen.frequency(3 -> Gen.const(Nil),
      1 -> sitemapLineGen.map(List(_))) // global directive at EOF
  } yield (head ++ orphan ++ gs.flatten ++ tailSm).mkString("\n")

  // ---- independent reference (imperative, shares no code) ----

  /** One parsed group: UA names, rules, first valid Crawl-delay. */
  private case class RefGroup(uas: List[String],
    rules: List[(Boolean, String)], delay: Option[Double])

  private def refParse(robots: String): (List[RefGroup], List[String]) = {
    var groups = List.empty[RefGroup]
    var sitemaps = List.empty[String]
    var uas = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var delay = Option.empty[Double]
    var inHeader = false
    def flush(): Unit = {
      if (uas.nonEmpty) groups = groups :+ RefGroup(uas, rules, delay)
      uas = Nil; rules = Nil; delay = None
    }
    for (raw <- robots.split("\n", -1)) {
      val l = raw.replaceAll("#.*", "").trim
      val lo = l.toLowerCase
      if (lo.startsWith("user-agent:")) {
        if (!inHeader) flush()
        uas = uas :+ l.substring(l.indexOf(":") + 1).trim
        inHeader = true
      } else if (lo.startsWith("allow:") || lo.startsWith("disallow:")) {
        inHeader = false
        val v = l.substring(l.indexOf(":") + 1).trim
        if (v.nonEmpty) rules = rules :+ (lo.startsWith("allow:"), v)
      } else if (lo.startsWith("crawl-delay:")) {
        // a recognized group rule: ends the header run even when the
        // value is invalid; first VALID value per group run wins
        inHeader = false
        val v = l.substring(l.indexOf(":") + 1).trim
        if (v.matches("[0-9]+(\\.[0-9]+)?") && delay.isEmpty)
          delay = Some(v.toDouble)
      } else if (lo.startsWith("sitemap:")) {
        // GLOBAL directive (sitemaps.org): collected independent of any
        // group, and it neither joins nor ends a header run
        val v = l.substring(l.indexOf(":") + 1).trim
        if (v.nonEmpty) sitemaps = sitemaps :+ v
      }
      // blank / comment-only lines change nothing (a header run survives them)
    }
    flush()
    (groups, sitemaps)
  }

  private def refPool(robots: String, agent: String): List[RefGroup] = {
    val groups = refParse(robots)._1
    val spec = groups.filter(_.uas.exists(_.equalsIgnoreCase(agent)))
    if (spec.nonEmpty) spec else groups.filter(_.uas.contains("*"))
  }

  private def refRules(robots: String, agent: String): List[(Boolean, String)] =
    refPool(robots, agent).flatMap(_.rules)

  /** First valid delay across the selected group class — the same
    * first-wins discipline as the engine's fold (groups concatenate in
    * file order in both). */
  private def refCrawlDelay(robots: String, agent: String): Option[Double] =
    refPool(robots, agent).flatMap(_.delay).headOption

  private def refSitemaps(robots: String): List[String] =
    refParse(robots)._2

  /** Independent §2.2.2 comparison form: valid %XX decodes when the
    * octet is unreserved, uppercases otherwise; raw non-ASCII
    * percent-encodes its UTF-8 octets; everything else literal.
    * Imperative StringBuilder walk — shares no code with the engine's
    * token-array fold. */
  private def refNormalize(s: String): String = {
    def unreserved(v: Int): Boolean =
      (v >= '0' && v <= '9') || (v >= 'A' && v <= 'Z') ||
        (v >= 'a' && v <= 'z') || v == '-' || v == '.' || v == '_' || v == '~'
    val hex = "0123456789abcdefABCDEF".toSet
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (unreserved(v)) out.append(v.toChar)
        else out.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else if (ch == '%') {
        // stray '%' (no valid escape): its own §2.2.2 octet form — also
        // what makes the comparison form a fixed point (r20; the r19
        // pass-through let '%a%41' -> '%aA' re-parse as an escape)
        out.append("%25"); i += 1
      } else if (ch < 0x80) { out.append(ch); i += 1 }
      else {
        val n = Character.charCount(s.codePointAt(i))
        for (b <- s.substring(i, i + n).getBytes("UTF-8"))
          out.append(f"%%${b & 0xff}%02X")
        i += n
      }
    }
    out.toString
  }

  /** Independent RFC 9309 §2.2.3 matcher: `*` = any sequence (greedy-
    * leftmost segment walk), trailing `$` = end anchor, `$` elsewhere
    * literal. Shares no code with the engine's column fold. */
  private def refMatch(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs.head)) return false
    if (segs.length == 1) return if (anchored) path == pat else true
    var pos = segs.head.length
    for (k <- 1 until segs.length) {
      val seg = segs(k)
      if (seg.isEmpty) () // '**', leading/trailing '*': constrains nothing
      else if (k == segs.length - 1 && anchored)
        return path.endsWith(seg) && path.length - seg.length >= pos
      else {
        val p = path.indexOf(seg, pos)
        if (p < 0) return false
        pos = p + seg.length
      }
    }
    true
  }

  private def refVerdict(path: String,
      rules: List[(Boolean, String)]): (Boolean, String) = {
    // match on the §2.2.2 comparison forms; precedence and the winning
    // rule string stay on the RAW pattern (the engine contract)
    val m = rules.filter(r => refMatch(refNormalize(path), refNormalize(r._2)))
    if (m.isEmpty) (true, "")
    else {
      val maxLen = m.map(_._2.length).max
      val top = m.filter(_._2.length == maxLen)
      // engine fold: a later equal-length Allow overwrites; Disallow
      // never overwrites an equal -> last max-length allow, else first
      val w = if (top.exists(_._1)) top.filter(_._1).last else top.head
      (w._1, w._2)
    }
  }

  // gnarlier strings than the path alphabet: truncated/invalid escapes,
  // mixed hex case, multi-octet codepoints (2- and 3-byte UTF-8),
  // metacharacters adjacent to escapes, bare '%' at end-of-string
  private val gnarlyGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    parts <- Gen.listOfN(n, Gen.oneOf(
      "%", "%2", "%2F", "%2f", "%zz", "%7E", "%7e", "%41", "%c3", "%C3%A9",
      "a", "/", "é", "€", "~", "*", "$", ".", "_", "-", "9", "%%41", "Z"))
  } yield parts.mkString

  property("pctNormalize equals the independent normalizer and is idempotent") =
    Prop.forAll(Gen.listOfN(8, gnarlyGen)) { ss =>
      import spark.implicits._
      val got = ss.toDF("s")
        .select(Robots.pctNormalize(col("s")).as("n"))
        .collect().map(_.getString(0)).toList
      val want = ss.map(refNormalize)
      // idempotence: the comparison form is a fixed point, so matching
      // an already-normalized side can never drift
      val twice = got.toDF("s")
        .select(Robots.pctNormalize(col("s")).as("n"))
        .collect().map(_.getString(0)).toList
      (Prop(got == want) :| s"got=$got want=$want in=$ss") &&
        (Prop(twice == got) :| s"not idempotent: $got -> $twice")
    }

  property("verdicts equal the independent parser on random files and paths") =
    Prop.forAll(robotsGen, Gen.listOfN(6, pathGen)) { (robots, paths) =>
      import spark.implicits._
      val got = paths.toDF("path")
        .select(Robots.robotsVerdict(col("path"),
          Robots.robotsRules(lit(robots), AGENT)).as("v"))
        .collect().map(r => (r.getStruct(0).getBoolean(0),
          r.getStruct(0).getString(1))).toList
      val rules = refRules(robots, AGENT)
      val want = paths.map(refVerdict(_, rules))
      Prop(got == want) :| s"got=$got\nwant=$want\nrules=$rules\nrobots=\n$robots"
    }

  property("a specific-agent group anywhere makes wildcard groups irrelevant") =
    Prop.forAll(robotsGen) { robots =>
      val withSpec = robots + "\nUser-agent: GraftBot\nDisallow: /only/"
      val rules = refRules(withSpec, AGENT)
      import spark.implicits._
      val got = Seq("/only/x").toDF("path")
        .select(Robots.robotsVerdict(col("path"),
          Robots.robotsRules(lit(withSpec), AGENT)).as("v"),
          Robots.robotsRules(lit(withSpec), AGENT).as("r")).head
      // the ENGINE's surviving rule list must be exactly the graftbot
      // groups' rules per the independent parser (wildcard groups
      // irrelevant), and the planted Disallow always governs /only/x
      // (no longer graftbot rule is generable: /only/ isn't in the
      // prefix alphabet)
      val engineRules = got.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getBoolean(0), r.getString(1))).toList
      Prop(!got.getStruct(0).getBoolean(0) && engineRules == rules) :|
        s"engine=$engineRules ref=$rules"
    }

  property("Crawl-delay equals the independent parser: group-scoped, first valid wins") =
    Prop.forAll(robotsGen) { robots =>
      import spark.implicits._
      val got = Option(Seq(robots).toDF("r")
        .select(Robots.robotsCrawlDelay(col("r"), AGENT).as("d"))
        .head.get(0)).map(_.asInstanceOf[Double])
      val want = refCrawlDelay(robots, AGENT)
      Prop(got == want) :| s"got=$got want=$want robots=\n$robots"
    }

  property("Sitemap: extraction equals the independent parser (global, file order)") =
    Prop.forAll(robotsGen) { robots =>
      import spark.implicits._
      val got = Seq(robots).toDF("r")
        .select(Robots.robotsSitemaps(col("r")).as("s"))
        .head.getSeq[String](0).toList
      val want = refSitemaps(robots)
      Prop(got == want) :| s"got=$got want=$want robots=\n$robots"
    }
}
