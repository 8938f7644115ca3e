package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based pin of q165's central arithmetic: for ANY corpus, the
  * per-doc removal report equals a brute-force oracle that (a) counts
  * gram SITES (so intra-doc repeats duplicate), (b) unions the n-token
  * cover intervals of duplicated starts with the standard
  * merge-if-overlapping-or-adjacent rule. The query computes the same
  * thing via a lag/sum window run-split on start gaps — the equivalence
  * (gap <= n on starts == interval overlap-or-adjacency for n-covers) is
  * exactly what random corpora can break and planted fixtures can't:
  * runs that chain through staircase overlaps, adjacent-but-disjoint
  * extents at gap n+1, docs that are one giant duplicated run. */
object TextAnalysisProps extends Properties("textanalysis") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case writes parquet + runs Spark jobs

  private lazy val spark = SparkSpec.session
  private val N = 5 // q165's gram length

  // tiny vocab + medium docs => duplicated grams arise naturally, both
  // cross-doc and intra-doc
  private val corpusGen: Gen[List[(Long, String)]] =
    for {
      vocab <- Gen.chooseNum(3, 8)
      nDocs <- Gen.chooseNum(2, 7)
      docs <- Gen.sequence[List[(Long, String)], (Long, String)](
        (0 until nDocs).toList.map { i =>
          for {
            len <- Gen.chooseNum(1, 30)
            ws <- Gen.listOfN(len, Gen.chooseNum(0, vocab - 1).map(w => s"w$w"))
          } yield (i.toLong, ws.mkString(" "))
        })
    } yield docs

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force q165: site-frequency duplicated grams -> interval union
    * of their [p, p+N-1] covers (merge when overlapping or adjacent). */
  private def brute(docs: List[(Long, String)])
      : Map[Long, (Long, Long, Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toVector
    }.toMap
    val sites = for {
      (id, w) <- toks.toList if w.size >= N
      p <- 0 to w.size - N
    } yield (id, p, w.slice(p, p + N).mkString(" "))
    val freq = sites.groupBy(_._3).view.mapValues(_.size).toMap
    sites.filter(s => freq(s._3) > 1).groupBy(_._1).map { case (id, ss) =>
      val merged = ss.map(_._2).sorted
        .foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
          acc match {
            case (s0, e0) :: rest if p <= e0 + 1 => (s0, math.max(e0, p + N - 1)) :: rest
            case _ => (p, p + N - 1) :: acc
          }
        }.reverse
      val nt = toks(id).size.toLong
      val dup = merged.map { case (s, e) => (e - s + 1).toLong }.sum
      id -> ((nt, merged.size.toLong, dup,
        merged.map { case (s, e) => (e - s + 1).toLong }.max,
        merged.head._1.toLong, round4(dup.toDouble / nt)))
    }
  }

  property("q165 extents equal the brute-force interval union") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("ssprops").toString
      docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q165_substring_dedup")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))))
        .toMap
      val want = brute(docs)
      Prop(got == want) :| s"got=$got want=$want"
    }

  /** Brute-force q166: per-doc distinct grams; a train doc (id % 10 != 0)
    * is flagged with the count of its grams present in the eval set's
    * distinct-gram pool. */
  private def bruteDecon(docs: List[(Long, String)])
      : Map[Long, (Long, Long, Double)] = {
    val grams = docs.map { case (id, t) =>
      val w = t.split(" ").filter(_.nonEmpty).toVector
      id -> (if (w.size >= N) (0 to w.size - N)
        .map(p => w.slice(p, p + N).mkString(" ")).distinct else Seq.empty)
    }.toMap
    val evalG = grams.collect { case (id, gs) if id % 10 == 0 => gs }
      .flatten.toSet
    grams.collect { case (id, gs) if id % 10 != 0 && gs.nonEmpty =>
      val overlap = gs.count(evalG)
      id -> ((gs.size.toLong, overlap.toLong,
        round4(overlap.toDouble / gs.size)))
    }.filter(_._2._2 > 0)
  }

  property("q166 overlap report equals the brute-force eval-gram check") =
    Prop.forAll(corpusGen) { docs0 =>
      import spark.implicits._
      // stride-5 ids put ~half the docs in the eval slice (% 10 == 0);
      // sequential 0..6 ids would leave a single-doc eval pool
      val docs = docs0.map { case (id, t) => (id * 5, t) }
      val dir = java.nio.file.Files.createTempDirectory("deconprops").toString
      docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q166_decontamination")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      val want = bruteDecon(docs)
      Prop(got == want) :| s"got=$got want=$want"
    }
}
