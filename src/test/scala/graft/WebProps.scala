package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.Web

/** Property-based round-trip of the q168 HTML parser: for ANY randomly
  * generated page — random block tags with random attributes, random
  * inline decorations (<b>/<i>/<span>, single soft-wrap <br>s, entity
  * escapes, <a> wraps), random chrome (script/style/comment bodies),
  * random inter-tag whitespace and tag-name casing — the recovered block
  * texts equal the generating word sequences exactly, in order, and each
  * block's link_chars equals the total length of its <a>-wrapped words.
  * Random pages cover shapes the hand fixtures can't enumerate. */
object WebProps extends Properties("web") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  /** One block: the plain words, plus the decorated HTML fragment and the
    * expected link-char count. */
  private case class Block(html: String, text: String, linkChars: Int)

  private val blockGen: Gen[Block] = for {
    n <- Gen.chooseNum(1, 20)
    ws <- Gen.listOfN(n, word)
    // per-word decoration: 0=plain, 1=<b>, 2=<i>, 3=<span attr>, 4=<a>,
    // 5=entity-injected (&amp; inside the word)
    deco <- Gen.listOfN(n, Gen.chooseNum(0, 5))
    brAt <- Gen.chooseNum(0, math.max(0, n - 2)) // single soft-wrap <br>
    useBr <- Gen.oneOf(true, false)
    tag <- Gen.oneOf("p", "div", "h2", "li", "blockquote", "DIV", "P")
    attrs <- Gen.oneOf("", " class=\"c1 c2\"", " id='x7' data-k=v", " style=\"a:b\"")
  } yield {
    val pieces = ws.zip(deco).zipWithIndex.map { case ((w, d), i) =>
      val h = d match {
        case 1 => s"<b>$w</b>"
        case 2 => s"<I>$w</I>"
        case 3 => s"<span data-z='1'>$w</span>"
        case 4 => s"""<a href="/r/$i">$w</a>"""
        case 5 => w.grouped(math.max(1, w.length / 2)).mkString("&amp;")
        case _ => w
      }
      val sep = if (useBr && i == brAt && i < n - 1) s"$h<br>" else h
      sep
    }
    val expected = ws.zip(deco).map { case (w, d) =>
      if (d == 5) w.grouped(math.max(1, w.length / 2)).mkString("&") else w
    }
    val linkChars = ws.zip(deco).collect { case (w, 4) => w.length }.sum
    Block(s"<$tag$attrs>${pieces.mkString(" ")}</$tag>", expected.mkString(" "), linkChars)
  }

  private val pageGen: Gen[(String, List[Block])] = for {
    nb <- Gen.chooseNum(1, 6)
    blocks <- Gen.listOfN(nb, blockGen)
    ws1 <- Gen.oneOf("", "\n", "  ", "\n  \n")
    scriptBody <- Gen.listOfN(4, word).map(_.mkString(" "))
    comment <- Gen.listOfN(3, word).map(_.mkString(" "))
    emptyBlock <- Gen.oneOf("", "<div>   </div>", "<p></p>")
  } yield {
    val page =
      s"""<html><head><title></title><script type="x">var q = "$scriptBody";</script>""" +
        s"<style>.k{v:0}</style></head><body><!-- $comment -->$ws1" +
        blocks.map(_.html).mkString(ws1) + emptyBlock + "</body></html>"
    (page, blocks)
  }

  property("random pages round-trip: block texts, order, and link chars exact") =
    Prop.forAll(pageGen) { case (page, blocks) =>
      import spark.implicits._
      val got = Seq(page).toDF("h")
        .select(explode(Web.classifiedBlocks(col("h"))).as("b"))
        .select(col("b.text"), col("b.link_chars"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toList
      val want = blocks.map(b => (b.text, b.linkChars))
      Prop(got == want) :| s"got=$got\nwant=$want\npage=$page"
    }

  // ---- q169 line rules vs an INDEPENDENT plain-Scala reference ----
  // (the DuckDB oracle shares the rule formulas with the Spark side; this
  // reimplementation diversifies the oracle the way the q165 brute-force
  // interval oracle does)

  private val lineGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 9)
    ws <- Gen.listOfN(n, word)
    js <- Gen.frequency(4 -> Gen.const(""), 1 -> Gen.oneOf(" javascript", " JavaScript widget"))
    punct <- Gen.oneOf("", "", ".", "!", "?", "\"")
    pad <- Gen.oneOf("", " ", "  ")
  } yield s"$pad${ws.mkString(" ")}$js$punct"

  private val linesGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 14)
    ls <- Gen.listOfN(n, lineGen)
    dupFrom <- Gen.chooseNum(0, n - 1)
    addDup <- Gen.oneOf(true, false)
  } yield if (addDup) ls :+ ls(dupFrom) else ls

  private def refLineReport(lines: List[String]): Map[String, Long] = {
    def nw(l: String) = l.trim.split(" ").count(_.nonEmpty)
    def cls(l: String) =
      if (l.toLowerCase.contains("javascript")) "js"
      else if (!l.exists(_ => true) || !"[.!?\"]$".r.findFirstIn(l).isDefined) "nopunct"
      else if (nw(l) < 3) "short"
      else "kept"
    val cs = lines.map(cls)
    val kept = lines.zip(cs).collect { case (l, "kept") => nw(l).toLong }
    val nKept = cs.count(_ == "kept").toLong
    val nDistinct = lines.distinct.size.toLong
    val nLines = lines.size.toLong
    Map(
      "n_lines" -> nLines, "n_distinct" -> nDistinct, "n_kept" -> nKept,
      "n_js" -> cs.count(_ == "js").toLong,
      "n_nopunct" -> cs.count(_ == "nopunct").toLong,
      "n_short" -> cs.count(_ == "short").toLong,
      "kept_words" -> kept.sum,
      "page_pass" -> (if (nKept >= 5 && (nLines - nDistinct) * 10 <= nLines * 3) 1L else 0L))
  }

  property("line rules equal an independent reference on random pages") =
    Prop.forAll(linesGen) { lines =>
      import spark.implicits._
      val row = Web.lineQualityRel(
        Seq((1L, lines.mkString("\n"))).toDF("doc_id", "page"), col("page")).head
      val got = row.schema.fieldNames.filter(_ != "doc_id")
        .map(f => f -> row.getAs[Long](f)).toMap
      val want = refLineReport(lines)
      Prop(got == want) :| s"got=$got\nwant=$want\nlines=$lines"
    }
}
