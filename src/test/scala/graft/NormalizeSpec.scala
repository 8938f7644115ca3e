package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Normalize
import graft.functions.expressions.UnicodeNormalize

/** Semantics of the native Unicode-normalization expression: NFC on the
  * planted classes (the registered query's transform), NFKC's
  * compatibility folds (not oracle-reachable — DuckDB has no NFKC),
  * the identity fast paths, and codegen/interpreted agreement. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(ss: String*): Seq[String] =
    ss.toSeq.toDF("s")
      .select(Normalize.unicodeNormalize(col("s"), "NFC").as("n"))
      .collect().map(_.getString(0)).toSeq

  test("NFC composes decomposed sequences and passes precomposed through") {
    val got = nfc(
      "cafe\u0301", // e + COMBINING ACUTE -> é
      "A\u030angstro\u0308m", // ring + diaeresis compose
      "caf\u00e9", // already precomposed: unchanged
      "plain ascii text.")
    assert(got == Seq("caf\u00e9", "\u00c5ngstr\u00f6m", "caf\u00e9",
      "plain ascii text."), got.map(_.codePoints().toArray.toSeq))
  }

  test("NFKC additionally folds compatibility forms; NFC leaves them alone") {
    val lig = "\ufb01le \uff21 x\u00b2" // fi-ligature, fullwidth A, superscript 2
    val Seq(kc) = Seq(lig).toDF("s")
      .select(Normalize.unicodeNormalize(col("s"), "NFKC").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(kc == "file A x2", kc)
    assert(nfc(lig) == Seq(lig)) // canonical form keeps compatibility chars
  }

  test("identity fast paths return the input OBJECT: ASCII and already-NFC") {
    val ascii = UTF8String.fromString("nothing to do here")
    assert(UnicodeNormalize.normalize(ascii, Normalizer.Form.NFC) eq ascii)
    val nfcAlready = UTF8String.fromString("caf\u00e9")
    assert(UnicodeNormalize.normalize(nfcAlready, Normalizer.Form.NFC) eq nfcAlready)
    val changes = UTF8String.fromString("cafe\u0301")
    assert(UnicodeNormalize.normalize(changes, Normalizer.Form.NFC) ne changes)
  }

  test("codegen path == interpreted eval == java.text.Normalizer, nulls pass through") {
    val cases = Seq("cafe\u0301", "A\u030angstro\u0308m", "man\u0303ana",
      "\u00e9clair", "", "ascii only", "\ufb01 mixed caf\u00e9 e\u0301")
    // DataFrame run exercises whole-stage codegen (doGenCode)
    val viaCodegen = cases.toDF("s")
      .select(Normalize.unicodeNormalize(col("s"), "NFC").as("n"))
      .collect().map(_.getString(0)).toSeq
    // direct eval exercises the interpreted path
    val viaEval = cases.map(s => UnicodeNormalize.normalize(
      UTF8String.fromString(s), Normalizer.Form.NFC).toString)
    val reference = cases.map(Normalizer.normalize(_, Normalizer.Form.NFC))
    assert(viaCodegen == viaEval && viaEval == reference,
      (viaCodegen, viaEval, reference).toString)
    val nulls = Seq[Option[String]](None, Some("e\u0301"))
      .toDF("s").select(Normalize.unicodeNormalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(nulls == Seq(None, Some("\u00e9")), nulls)
  }

  test("unknown form and non-string input are rejected") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("s")
        .select(Normalize.unicodeNormalize(col("s"), "NFX")).collect()
    }
    val err = intercept[Exception] {
      Seq(1).toDF("i")
        .select(Normalize.unicodeNormalize(col("i"), "NFC")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"), err.getMessage)
  }
}
