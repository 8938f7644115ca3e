package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.SkewJoin

/** Property checks of the salt-factor soundness claim: for ANY key
  * distribution, `S * targetRowsPerTask >= true max multiplicity`
  * (unless the maxSalt clamp binds) — the Misra-Gries upper bound can
  * only over-ask, never under-cover the hottest key — and the salted
  * join is value-identical to the plain join at that derived S. */
object SaltProps extends Properties("salt") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val distGen: Gen[(List[Long], Long)] = for {
    nKeys <- Gen.chooseNum(1, 20)
    // per-key multiplicities, one optionally-hot head key
    hot <- Gen.chooseNum(1, 400)
    tails <- Gen.listOfN(nKeys, Gen.chooseNum(1, 25))
    target <- Gen.oneOf(1L, 5L, 50L, 1000L)
  } yield ((hot.toLong :: tails.map(_.toLong)), target)

  property("S * target covers the hottest key, or the clamp binds") =
    Prop.forAll(distGen) { case (mults, target) =>
      import spark.implicits._
      val rows = mults.zipWithIndex.flatMap { case (m, k) =>
        Seq.fill(m.toInt)(k.toLong)
      }
      val keys = rows.toDF("k")
      val maxSalt = 64
      val s = SkewJoin.saltFactor(keys, target, maxSalt)
      val maxMult = mults.max
      Prop(s >= 1 && (s.toLong * target >= maxMult || s == maxSalt)) :|
        s"S=$s target=$target maxMult=$maxMult"
    }

  property("salted join at the derived S equals the plain join") =
    Prop.forAll(distGen) { case (mults, target) =>
      import spark.implicits._
      val fact = mults.zipWithIndex.flatMap { case (m, k) =>
        (0 until m.toInt).map(i => (k.toLong, k * 1000L + i))
      }.toDF("k", "event_id")
      val dim = mults.indices.map(k => (k.toLong, s"seg$k")).toDF("k", "seg")
      val s = SkewJoin.saltFactor(fact.select(col("k")), target)
      val salted = SkewJoin
        .saltedJoin(fact, dim, "k", s, saltCoin = Some(col("event_id")))
        .collect().map(_.toString).sorted.toSeq
      val plain = fact.join(dim, Seq("k"))
        .collect().map(_.toString).sorted.toSeq
      Prop(salted == plain) :| s"S=$s rows ${salted.size}/${plain.size}"
    }
}
