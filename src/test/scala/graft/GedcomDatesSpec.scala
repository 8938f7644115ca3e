package graft

import graft.gedcom.GedcomDates
import graft.gedcom.GedcomDates.GedDate

class GedcomDatesSpec extends SparkSpec {
  import spark.implicits._

  test("simple and qualified dates") {
    assert(GedcomDates.parse("12 JAN 1900") ==
      GedDate("EXACT", Some(1900), Some(1), Some(12), None, None, None))
    assert(GedcomDates.parse("JAN 1900") ==
      GedDate("EXACT", Some(1900), Some(1), None, None, None, None))
    assert(GedcomDates.parse("1900") ==
      GedDate("EXACT", Some(1900), None, None, None, None, None))
    assert(GedcomDates.parse("ABT 1900").qualifier == "ABT")
    assert(GedcomDates.parse("BEF 3 MAR 1850") ==
      GedDate("BEF", Some(1850), Some(3), Some(3), None, None, None))
    assert(GedcomDates.parse("aft 1900").qualifier == "AFT") // case-insensitive
  }

  test("interpreted dates with phrases and dual years") {
    assert(GedcomDates.parse("INT 1900 (guessed from census)") ==
      GedDate("INT", Some(1900), None, None, None, None, None))
    // dual (old/new style) year "1750/51" keeps the first year
    assert(GedcomDates.parse("12 MAR 1750/51") ==
      GedDate("EXACT", Some(1750), Some(3), Some(12), None, None, None))
    assert(GedcomDates.parse("ABT 1750/51").qualifier == "ABT")
    // 4-digit dual years appear in real exports even though 5.5 says 2
    assert(GedcomDates.parse("12 MAR 1750/1751").year.contains(1750))
  }

  test("ranges") {
    assert(GedcomDates.parse("BET 1900 AND 1910") ==
      GedDate("BET", Some(1900), None, None, Some(1910), None, None))
    assert(GedcomDates.parse("FROM 1 JAN 1900 TO 5 FEB 1901") ==
      GedDate("FROM", Some(1900), Some(1), Some(1), Some(1901), Some(2), Some(5)))
  }

  test("calendar-invalid dates degrade to None, never throw") {
    assert(GedcomDates.toDate(GedcomDates.parse("31 FEB 1900")).isEmpty)
    assert(GedcomDates.toDate(GedcomDates.parse("99 JAN 1900")).isEmpty)
    assert(GedcomDates.toDate(GedcomDates.parse("29 FEB 2000")).contains(
      java.sql.Date.valueOf("2000-02-29"))) // leap day is valid
    val df = Seq("31 FEB 1900").toDF("d")
    val out = GedcomDates.withParsedDate(df, org.apache.spark.sql.functions.col("d"), "b")
      .select("b_qualifier", "b_date").collect().head
    assert(out.getString(0) == "EXACT" && out.isNullAt(1))
  }

  test("garbage degrades to RAW, never throws") {
    for (s <- Seq("", "unknown", "13 XXX 1", "SOMEDAY", null))
      assert(GedcomDates.parse(s).qualifier == "RAW")
  }

  test("column-level parse") {
    val df = Seq("12 JAN 1900", "ABT 1850", "garbage").toDF("d")
    val out = GedcomDates.withParsedDate(df, org.apache.spark.sql.functions.col("d"), "b")
      .select("b_qualifier", "b_date").as[(String, Option[java.sql.Date])].collect()
    assert(out(0) == ("EXACT", Some(java.sql.Date.valueOf("1900-01-12"))))
    assert(out(1) == ("ABT", Some(java.sql.Date.valueOf("1850-01-01"))))
    assert(out(2)._1 == "RAW" && out(2)._2.isEmpty)
  }
}
