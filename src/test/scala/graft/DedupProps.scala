package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.Dedup

/** Property-based check of the q65 prefix-filter's central claim: for ANY
  * corpus and threshold, prefix-filtered candidate generation loses no
  * qualifying pair — `jaccardPairsPrefix` is row-identical (pairs AND
  * jaccard values) to the exhaustive inverted-index join. Random corpora
  * cover shapes the planted-dup spec can't: skewed token frequencies,
  * single-token docs, all-identical docs, multi-bucket (lang, source)
  * scopes. */
object DedupProps extends Properties("dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs several Spark jobs

  private lazy val spark = SparkSpec.session

  private val corpusGen: Gen[(List[(Long, String, String, String)], Double)] =
    for {
      vocabSize <- Gen.chooseNum(5, 30)
      nDocs <- Gen.chooseNum(2, 18)
      nLangs <- Gen.chooseNum(1, 2)
      t <- Gen.oneOf(0.5, 0.7, 0.8, 0.9)
      docs <- Gen.sequence[List[(Long, String, String, String)], (Long, String, String, String)](
        (0 until nDocs).toList.map { i =>
          for {
            n <- Gen.chooseNum(1, 10)
            ws <- Gen.listOfN(n, Gen.chooseNum(0, vocabSize - 1).map(w => s"w$w"))
            lang <- Gen.chooseNum(0, nLangs - 1).map(l => s"l$l")
          } yield (i.toLong, ws.distinct.mkString(" "), lang, "src")
        })
    } yield (docs, t)

  property("prefix filtering is lossless at every threshold") =
    Prop.forAll(corpusGen) { case (docs, t) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val toks = df.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(graft.functions.TextAnalysis.tokens(col("text")))).as("word"))
      val exact = Dedup.jaccardPairsExact(toks, t)
        .as[(Long, Long, Double)].collect().toSeq
      val prefix = Dedup.jaccardPairsPrefix(toks, t)
        .as[(Long, Long, Double)].collect().toSeq
      Prop(exact == prefix) :| s"exact=${exact.size} prefix=${prefix.size} t=$t"
    }

  property("incremental probe equals the full relation filtered to incoming") =
    Prop.forAll(corpusGen, Gen.chooseNum(2, 5)) { case ((docs, t), mod) =>
      // for ANY corpus, threshold, and incoming predicate (doc_id % mod
      // == 0), probing only the incoming prefixes against the full index
      // must reproduce exactly the incoming-involving subset of the full
      // pair relation — the Bayardo per-member guarantee q96 rests on
      import spark.implicits._
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val toks = df.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(graft.functions.TextAnalysis.tokens(col("text")))).as("word"))
      val full = Dedup.jaccardPairsPrefix(toks, t)
        .as[(Long, Long, Double)].collect().toSeq
        .filter { case (a, b, _) => a % mod == 0 || b % mod == 0 }
      val inc = Dedup.jaccardPairsIncremental(toks, t, _ % mod === 0)
        .orderBy(col("ia"), col("ib"))
        .as[(Long, Long, Double)].collect().toSeq
      Prop(inc == full) :| s"inc=${inc.size} full-filtered=${full.size} t=$t mod=$mod"
    }
}
