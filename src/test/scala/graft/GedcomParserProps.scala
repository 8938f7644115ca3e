package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.gedcom.GedcomParser

/** The hand-rolled line scanner must agree with the regex specification on
  * every input — structured GEDCOM lines, pathological near-misses, and
  * pure garbage. */
object GedcomParserProps extends Properties("gedcom-parser") {

  private val wsGen = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t')).map(_.mkString)
  private val tokenGen = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val valueGen = Gen.chooseNum(0, 20).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '@', '/', '.', '-'))))

  private val structuredGen: Gen[String] = for {
    lead <- Gen.oneOf(Gen.const(""), wsGen)
    level <- Gen.chooseNum(0, 99)
    sep1 <- wsGen
    xref <- Gen.option(tokenGen.map(t => s"@$t@"))
    sep2 <- wsGen
    tag <- tokenGen
    value <- Gen.option(valueGen)
  } yield {
    val x = xref.map(_ + sep2).getOrElse("")
    val v = value.map(" " + _).getOrElse("")
    s"$lead$level$sep1$x$tag$v"
  }

  private val nearMissGen: Gen[String] = Gen.oneOf(
    Gen.const(""),
    wsGen,
    tokenGen,                                  // no level
    Gen.chooseNum(0, 9).map(_.toString),       // level only
    tokenGen.map(t => s"0 @$t@"),              // xref, nothing after
    tokenGen.map(t => s"0 @$t@   "),           // xref, trailing ws only
    tokenGen.map(t => s"0 @$t TAG"),           // unclosed xref
    tokenGen.map(t => s"0 @$t@@x@ TAG"),       // double @
    Gen.const("0 @@ TAG"),                     // empty xref
    valueGen.map(v => s"0INDI $v"))            // level glued to tag

  private val garbageGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.stringOfN(n,
      Gen.frequency(5 -> Gen.asciiPrintableChar, 1 -> Gen.oneOf('@', ' ', '\t'))))

  private def agree(s: String): Prop = {
    val fast = GedcomParser.parseLine(s, 7L)
    val spec = GedcomParser.parseLineRegex(s, 7L)
    Prop(fast == spec) :| s"input=${s.map(c => if (c == '\t') "\\t" else c.toString).mkString}|fast=$fast|spec=$spec"
  }

  property("scanner == regex on structured lines") = Prop.forAll(structuredGen)(agree)
  property("scanner == regex on near-misses") = Prop.forAll(nearMissGen)(agree)
  property("scanner == regex on garbage") = Prop.forAll(garbageGen)(agree)
}
