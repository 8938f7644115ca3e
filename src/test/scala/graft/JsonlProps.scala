package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sources.Jsonl

/** Property-based check of the JSONL walk: containers are assembled by
  * an INDEPENDENT hand-rolled JSON escaper (no to_json, no shared
  * code), with random record values — quotes, backslashes, newlines,
  * tabs, control characters in text — interleaved with random blank
  * and malformed lines; the engine must recover every line's kind,
  * position, id, host and exact text length. */
object JsonlProps extends Properties("jsonl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(16)

  private lazy val spark = SparkSpec.session

  /** Independent escaper: the RFC 8259 two-character escapes plus
    * \u00XX for remaining controls. */
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case '\r' => "\\r"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val textGen: Gen[String] = for {
    ws <- Gen.listOfN(4, word)
    tricky <- Gen.oneOf("", " \"q\" ", " back\\slash ", " line\nbreak ",
      " tab\there ", " ctrlchar ")
  } yield ws.mkString(" ") + tricky

  private sealed trait L
  private case class Rec(id: Long, host: String, text: String) extends L
  private case object Blank extends L
  private case class Bad(raw: String) extends L

  private val lineGen: Gen[L] = Gen.frequency(
    5 -> (for {
      id <- Gen.chooseNum(0L, 999L)
      h <- word; t <- textGen
    } yield Rec(id, s"$h.example.com", t)),
    1 -> Gen.const(Blank),
    1 -> Gen.oneOf(Bad("{\"id\": broken"), Bad("not json at all"),
      Bad("[1,2,3]"), Bad("{\"url\": \"https://x.com/\"}")))

  private val containerGen: Gen[List[L]] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, lineGen))

  property("every line's kind, position, id, host and text length recover") =
    Prop.forAll(containerGen) { lines =>
      import spark.implicits._
      val text = lines.map {
        case Rec(id, host, t) =>
          s"""{"id": $id, "url": "https://WWW.$host/p", "lang": "en", "text": "${esc(t)}"}"""
        case Blank => ""
        case Bad(raw) => raw
      }.mkString("\n")
      val got = Jsonl.jsonlRecordsRel(
          Seq((1L, text)).toDF("gid", "container"),
          col("container"), Seq("gid"))
        .collect().map(r => (r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
        .sortBy(_._1).toList
      val want = lines.zipWithIndex.map {
        case (Rec(id, host, t), i) =>
          (i.toLong, "record", Some(id), Some(host), Some(t.length.toLong))
        case (Blank, i) => (i.toLong, "blank", None, None, None)
        // a valid object without an id lands in the same malformed
        // bucket (id is the record contract); arrays/garbage likewise
        case (Bad(_), i) => (i.toLong, "malformed", None, None, None)
      }
      Prop(got == want) :| s"got=$got\nwant=$want\ncontainer=\n$text"
    }
}
