package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §2.2 / builder scale mandate).
  *
  * When one join key carries a disproportionate share of rows, the shuffle
  * partition holding it becomes the straggler. Salting splits each key into
  * `buckets` synthetic sub-keys: the skewed side gets a deterministic salt
  * from a row hash, the (smaller) build side is replicated across all
  * salts. Equivalent rows, `buckets`-way parallelism on the hot key.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * aggregation-free hash joins and for engines/pipelines where AQE can't
  * see the skew (e.g. streaming joins).
  */
object SkewJoin {

  /** Inner-join `skewed` with `dim` on `key`, spreading each key over
    * `buckets` salts. `dim` is replicated `buckets` times — keep it the
    * small side. */
  /** Salt by row position, not row content: duplicate-heavy hot keys (the
    * classic skew shape) would all hash to one bucket under a content
    * salt. Exposed so tests assert the spread of the expression actually
    * shipped. */
  def saltColumn(buckets: Int): org.apache.spark.sql.Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = skewed.withColumn("_salt", saltColumn(buckets))
    val replicated = dim.withColumn(
      "_salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
