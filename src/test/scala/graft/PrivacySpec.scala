package graft

import org.apache.spark.sql.functions._

import graft.functions.Privacy

/** Privacy-operator contracts: tokenization must preserve referential
  * structure without leaking the identifier; k-anonymity must flag
  * exactly the undersized classes. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("pseudonymization preserves joins and group cardinalities") {
    val ev = Tables.events(spark, SF).limit(2000).cache()
    val tok = ev.select(col("user_id"), Privacy.token(col("user_id"), "s1").as("t"))
    // same id -> same token; distinct ids -> distinct tokens (no collision
    // at fixture scale), so grouping structure is exactly preserved
    assert(tok.select("user_id", "t").distinct().count() ==
      tok.select("user_id").distinct().count())
    assert(tok.select("t").distinct().count() ==
      tok.select("user_id").distinct().count())
    // a different salt yields a disjoint token universe (release rotation)
    val tok2 = ev.select(Privacy.token(col("user_id"), "s2").as("t"))
    assert(tok.select("t").intersect(tok2.select("t")).count() == 0)
    ev.unpersist()
  }

  test("k-anonymity flags exactly the classes smaller than k") {
    val df = (Seq.fill(7)(("en", "a")) ++ Seq.fill(3)(("en", "b")) ++ Seq.fill(1)(("de", "a")))
      .toDF("lang", "source")
    val got = Privacy.kAnonymity(df, Seq(col("lang"), col("source")), 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got == Map(
      ("en", "a") -> ((7L, false)),
      ("en", "b") -> ((3L, true)),
      ("de", "a") -> ((1L, true))))
  }

  test("PII redaction scrubs emails/IPs/phones and spares the lookalikes") {
    def redact(s: String): String =
      Seq(s).toDF("t").select(Privacy.redactPii(col("t"))).head.getString(0)
    // multiple hits of mixed kinds in one string
    assert(redact("mail a.b+c@sub.ex.org or x_1%y@ex.co, host 192.168.0.1, " +
      "call +44-201-5550 or +1-555-1234.") ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> or <PHONE>.")
    // negatives: TLD-less mailto, 4-digit octet, bare dotted version,
    // plus-number without the full shape
    for (neg <- Seq("admin@localhost stays", "build 1.2.3.4000 ok",
        "version 1.2.3 tag", "sum +12-34-56 here", "a@b.c single-letter tld"))
      assert(redact(neg) == neg, neg)
    // an email wrapping a dotted quad redacts as ONE email (precedence)
    assert(redact("odd user@10.1.2.3.net case") == "odd <EMAIL> case")
    // idempotent: placeholders contain no redactable material
    val once = redact("x y9@z.io 1.2.3.4 +1-555-0000")
    assert(redact(once) == once, once)
  }
}
