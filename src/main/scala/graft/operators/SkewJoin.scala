package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §2.2 / builder scale mandate).
  *
  * When one join key carries a disproportionate share of rows, the shuffle
  * partition holding it becomes the straggler. Salting splits each key into
  * `buckets` synthetic sub-keys: the skewed side gets a deterministic salt
  * from a per-row coin, the (smaller) build side is replicated across all
  * salts. Equivalent rows, `buckets`-way parallelism on the hot key.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * aggregation-free hash joins and for engines/pipelines where AQE can't
  * see the skew (e.g. streaming joins), and for the hot-key tail AQE's
  * split doesn't reach (one key so hot a single shuffle partition holds
  * it even after splits).
  */
object SkewJoin {

  /** Salt by row position, not row content: duplicate-heavy hot keys (the
    * classic skew shape) would all hash to one bucket under a content
    * salt. Exposed so tests assert the spread of the expression actually
    * shipped. */
  def saltColumn(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Data-driven salt factor: upper-bound the hottest key's multiplicity
    * with ONE Misra-Gries pass over the key column `k` (k-bounded
    * buffers, partial-agg — the fact never shuffles), then size
    * S = ceil(upper / targetRowsPerTask), clamped to [1, maxSalt].
    *
    * Why Misra-Gries and not the q134 KMV sketch: KMV estimates DISTINCT
    * counts (with n it gives the AVERAGE multiplicity n/d̂); the salted
    * join is sized by the MAXIMUM multiplicity, which is a frequency
    * question — exactly what the q109 heavy-hitter sketch answers. The MG
    * residual undercounts by at most n/(k+1) (Misra & Gries 1982), so
    * `top_residual + n/(k+1)` is a sound upper bound on the hottest key's
    * true count. On near-uniform corpora the error term dominates and the
    * bound is loose — conservatism that costs only dim replication, never
    * correctness (every fact row still meets its dim row at exactly one
    * salt). MG residuals vary with partial-merge order, so S may differ
    * run to run by a little; S changes the exchange layout and nothing
    * else, so results are unaffected.
    *
    * `targetRowsPerTask` is the per-reducer row budget for one (key,salt)
    * group — the scale adapter: a production corpus sets it in the
    * millions; the sf0.01/sf0.1 gates pass a small budget so the same
    * formula exercises a genuinely multi-salt exchange at test scale. */
  def saltFactor(factKeys: DataFrame, targetRowsPerTask: Long,
      maxSalt: Int = 64): Int = {
    val K = 64
    val hh = udaf(new Aggregates.HeavyHitters(K),
      org.apache.spark.sql.Encoders.STRING)
    val row = factKeys
      .agg(count(lit(1)).as("n"), hh(col("k").cast("string")).as("sk"))
      .head()
    val n = row.getLong(0)
    val top = row.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getLong(1)).maxOption.getOrElse(0L)
    val upper = top + n / (K + 1) + 1
    val s = (upper + targetRowsPerTask - 1) / targetRowsPerTask
    math.max(1L, math.min(maxSalt.toLong, s)).toInt
  }

  /** Inner-join `skewed` with `dim` on `key`, spreading each key over
    * `buckets` salts. `dim` is replicated `buckets` times — keep it the
    * small side.
    *
    * `buckets == 1` degenerates to the PLAIN join — same plan, no salt
    * column, no replication, no forced-shuffle hint (SaltSpec pins this):
    * combined with [[saltFactor]], "don't salt a uniform corpus" is the
    * automatic production behavior.
    *
    * `saltCoin`: per-row salt source for the skewed side (e.g. an event
    * id — deterministic across retries); defaults to row position, which
    * spreads duplicate-heavy hot keys but is not retry-stable.
    * `forceShuffle`: hold the join on the shuffle-merge path — a
    * replicated dim small enough to broadcast needs no salt, so a salted
    * DEMO under broadcast would be vacuous; production leaves this off
    * and lets AQE decide.
    *
    * 100 TB shape: `buckets` bounds the per-reducer share of the hottest
    * key at max_mult/buckets rows. Cost: buckets*|dim| replicated rows
    * through the dim exchange — the standard trade. Result identity is
    * the whole contract: every skewed row meets its dim row at exactly
    * one salt, so salting changes the exchange layout and nothing else. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, buckets: Int,
      saltCoin: Option[Column] = None, forceShuffle: Boolean = false): DataFrame = {
    require(buckets > 0)
    if (buckets == 1) skewed.join(dim, Seq(key))
    else {
      val coin = saltCoin.getOrElse(monotonically_increasing_id())
      val salted = skewed.withColumn("_salt", pmod(coin, lit(buckets.toLong)))
      val rep = dim.withColumn("_salt",
        explode(sequence(lit(0L), lit(buckets.toLong - 1))))
      val replicated = if (forceShuffle) rep.hint("SHUFFLE_MERGE") else rep
      salted.join(replicated, Seq(key, "_salt")).drop("_salt")
    }
  }
}
