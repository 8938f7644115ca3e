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

  property("stored band probe covers new-new pairs on ANY corpus split") =
    Prop.forAll(corpusGen, Gen.chooseNum(2, 4)) { case ((docs, t), mod) =>
      // the r16 no-containment contract at property level: index the
      // doc_id % mod != 0 population ONLY, probe with the % mod == 0
      // batch (genuinely absent from the index), and the output must
      // equal the full band-pair relation restricted to incoming-
      // involving pairs — including pairs where BOTH members are new
      // (the batch x batch self-join's reason to exist)
      import spark.implicits._
      val scope = Seq("lang", "source")
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val sigs = Dedup.minhashSignaturesRowwise(df, scope)
      val stored = sigs.filter(col("doc_id") % mod =!= 0)
      val incoming = sigs.filter(col("doc_id") % mod === 0)
      val probed = Dedup.probeMinhashBands(
          Dedup.minhashBandIndex(stored, scope), sigs, incoming, scope, t)
        .as[(Long, Long, Double)].collect().toSet
      val full: Set[(Long, Long, Double)] =
        Dedup.minhashPairsFromSigs(sigs, scope, t)
          .as[(Long, Long, Double)].collect().toSet
      val fullInc = full.filter { case (a, b, _) =>
        a % mod == 0 || b % mod == 0 }
      Prop(probed == fullInc) :| s"probed=${probed.size} full=${fullInc.size} mod=$mod t=$t"
    }

  property("salt guard auto-arms on a mass-dup corpus and stays row-identical") = {
    // planted mass-duplication skew — one viral boilerplate shared by 60
    // docs (every one a >= 0.8 neighbor of every other: a single hot ia
    // neighborhood, and a 60-doc prefix-token bucket for the probe to
    // find) plus distinct fillers. With the threshold lowered under the
    // bucket size, auto must ARM the salted plan (visible as the __slt
    // grouping key) and emit exactly the unsalted rows: an ib hashes to
    // exactly one salt bucket, so salting can neither drop nor duplicate
    // a pair. At the default threshold (65536) the same corpus must stay
    // on the single-exchange unsalted plan — healthy runs pay nothing.
    import spark.implicits._
    val viral = (0L until 60L).map(i =>
      (i, "the same viral boilerplate text shared by every mirror page", "l0", "src"))
    val fill = (60L until 75L).map(i =>
      (i, s"unique filler document number $i about topic${i % 7}", "l0", "src"))
    val df = (viral ++ fill).toDF("doc_id", "text", "lang", "source")
    val toks = df.select(col("doc_id"), col("lang"), col("source"),
      explode(array_distinct(graft.functions.TextAnalysis.tokens(col("text")))).as("word"))
    def run(conf: Map[String, String]): (Seq[(Long, Long, Double)], Boolean) = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val frame = Dedup.jaccardPairsPrefix(toks, 0.8)
        val salted = frame.queryExecution.analyzed.toString.contains("__slt")
        (frame.orderBy(col("ia"), col("ib"))
          .as[(Long, Long, Double)].collect().toSeq, salted)
      } finally conf.keys.foreach(spark.conf.unset)
    }
    val (off, offSalted) = run(Map("spark.graft.dedupSalt" -> "off"))
    val (autoArmed, armedSalted) =
      run(Map("spark.graft.dedupSaltThreshold" -> "16")) // default salt=auto
    val (autoIdle, idleSalted) = run(Map.empty) // default threshold: not armed
    val (s4, s4Salted) = run(Map("spark.graft.dedupSalt" -> "4"))
    val expectedViralPairs = 60L * 59L / 2
    (Prop(!offSalted) :| "off must not salt") &&
      (Prop(armedSalted) :| "auto did not arm on the planted hot bucket") &&
      (Prop(!idleSalted) :| "auto armed below the default threshold") &&
      (Prop(s4Salted) :| "explicit width must salt") &&
      (Prop(off == autoArmed) :| s"armed auto diverges: off=${off.size} auto=${autoArmed.size}") &&
      (Prop(off == autoIdle) :| "idle auto diverges") &&
      (Prop(off == s4) :| s"salt=4 diverges: off=${off.size} s4=${s4.size}") &&
      (Prop(off.count { case (a, b, _) => a < 60 && b < 60 } == expectedViralPairs) :|
        "planted corpus did not produce the hot neighborhood")
  }

  property("dedupSalt conf spellings parse, probes gate arming, garbage fails loud") = {
    def width(conf: Map[String, String], hint: Option[Long]): Either[String, Int] = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try Right(Dedup.dedupSaltWidth(spark, hint))
      catch { case e: IllegalArgumentException => Left(e.getMessage) }
      finally conf.keys.foreach(spark.conf.unset)
    }
    def salt(v: String) = Map("spark.graft.dedupSalt" -> v)
    (Prop(width(Map.empty, Some(100L)) == Right(1)) :| "auto below threshold -> off") &&
      (Prop(width(Map.empty, None) == Right(1)) :| "auto without a probe -> off") &&
      (Prop(width(Map.empty, Some(100000L)) == Right(Dedup.AUTO_SALT)) :| "auto just past threshold -> base width") &&
      (Prop(width(Map.empty, Some(65536L * 1000)) == Right(256)) :| "massive overflow clamps at 256") &&
      (Prop(width(Map("spark.graft.dedupSaltThreshold" -> "10"), Some(100L)) ==
        Right(Dedup.AUTO_SALT)) :| "lowered threshold arms") &&
      (Prop(width(salt(" AUTO "), Some(100L)) == Right(1)) :| "trimmed/cased auto parses") &&
      (Prop(width(salt("off"), Some(1000000L)) == Right(1)) :| "off ignores the probe") &&
      (Prop(width(salt("3"), None) == Right(3)) :| "explicit int") &&
      (Prop(width(salt(" 4 "), None) == Right(4)) :| "whitespace int") &&
      (Prop(width(salt("banana"), None).left.exists(_.contains("spark.graft.dedupSalt"))) :| "garbage names the key") &&
      (Prop(width(salt("0"), None).isLeft && width(salt("-2"), None).isLeft) :| "non-positive rejected") &&
      (Prop(width(Map("spark.graft.dedupSaltThreshold" -> "zero"), Some(1L))
        .left.exists(_.contains("dedupSaltThreshold"))) :| "bad threshold names its key")
  }

  private val vecCorpusGen: Gen[(List[(Long, List[Double])], Double)] =
    for {
      dim <- Gen.chooseNum(2, 8)
      nVecs <- Gen.chooseNum(2, 20)
      t <- Gen.oneOf(0.3, 0.4, 0.7)
      vecs <- Gen.sequence[List[(Long, List[Double])], (Long, List[Double])](
        (0 until nVecs).toList.map { i =>
          // small integer coords make near-parallel (and exactly zero)
          // vectors common, so the cosine threshold and the zero-norm
          // edge both get exercised
          Gen.listOfN(dim, Gen.chooseNum(-3, 3).map(_.toDouble))
            .map(v => (i.toLong, v))
        })
    } yield (vecs, t)

  property("incremental embedding probe equals the exact relation filtered to incoming") =
    Prop.forAll(vecCorpusGen, Gen.chooseNum(2, 5)) { case ((vecs, t), mod) =>
      // the q98 exactness claim over ANY corpus, threshold, batch
      // predicate, and (via tiny clusterTarget) non-trivial cell count:
      // probing only the cells the spherical triangle inequality cannot
      // rule out reproduces exactly the incoming-involving subset of the
      // brute-force cosine pair relation
      import spark.implicits._
      import graft.functions.VectorOps
      val e = vecs.toDF("vec_id", "v")
        .withColumn("nrm", VectorOps.norm(col("v")))
      val a = e.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
      val brute = a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          round(VectorOps.cosinePre(VectorOps.dot(col("va"), col("vb")),
            col("na"), col("nb")), 6).as("cos"))
        .filter(col("cos") >= t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
        .filter { case (x, y, _) => x % mod == 0 || y % mod == 0 }
      val inc = Dedup.embeddingPairsIncrementalExact(e, t, _ % mod === 0,
          clusterTarget = 3)
        .as[(Long, Long, Double)].collect().toSeq
      Prop(inc == brute) :| s"inc=${inc.size} brute-filtered=${brute.size} t=$t mod=$mod"
    }

  property("cluster-level split (q139) admits zero near-dup leakage on ANY corpus") =
    Prop.forAll(corpusGen) { case (docs, _) =>
      // the q139 theorem at property level: for any generated corpus —
      // transitive chains, all-identical docs, singleton clusters — no
      // exact near-dup pair (q139's fixed 0.8 threshold) may straddle the
      // cluster-assigned split, and every doc gets exactly one coin
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("clsplit").toString
      val df = docs.toDF("doc_id", "text", "lang", "source")
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val split = SparkEntry.queries("q139_cluster_split")(spark, dir)
        .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
      val toks = df.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(graft.functions.TextAnalysis.tokens(col("text")))).as("word"))
      val crossing = Dedup.jaccardPairsExact(toks, 0.8)
        .as[(Long, Long, Double)].collect()
        .filter { case (a, b, _) => split(a) != split(b) }
      Prop(crossing.isEmpty && split.size == docs.size) :|
        s"crossings=${crossing.length} assigned=${split.size}/${docs.size}"
    }
}
