package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Fuzzy string matching (entity resolution): join a dirty feed of
  * strings back to a clean roster within a small edit distance.
  *
  * Candidate generation is the SymSpell deletion-neighborhood trick, not
  * a cross join: every string expands to itself plus each single-char
  * deletion (L+1 keys for length L), and ANY two strings within
  * Levenshtein distance 1 share at least one key — a substitution at
  * position i means deleting i from both sides collides, an
  * insertion/deletion means the longer side's deletion collides with the
  * shorter side's identity key. Candidates therefore come from a plain
  * equi join on the key column, each is verified with exact
  * `levenshtein`, and completeness is structural. (Distance-2 matching
  * is the same construction at deletion depth 2.)
  *
  * 100 TB shape: the expansion is map-side (L+1 rows per string, bounded
  * by string length), the join shuffles on deletion keys (AQE broadcasts
  * a small roster side), and nothing is quadratic — the only blowup axis
  * is genuinely-colliding key groups, i.e. actual near-duplicate mass.
  */
object Fuzzy {
  import Tables._

  /** The string plus every single-char-deletion variant, deduped.
    * Guarded for the empty string: Spark's `sequence(1, 0)` DESCENDS
    * ([1, 0]) rather than producing an empty range, so "" gets only its
    * identity key explicitly. */
  def deletionKeys(w: Column): Column =
    when(length(w) === 0, array(w)).otherwise(
      array_distinct(concat(
        array(w),
        transform(sequence(lit(1), length(w)), i =>
          concat(w.substr(lit(1), i - lit(1)), w.substr(i + lit(1), length(w)))))))

  /** All (feed row, roster string) pairs within Levenshtein distance
    * `maxDist` (1 unless the deletion depth is raised), via the deletion-
    * neighborhood candidate join. `feed` must expose `id` and `name`;
    * `roster` must expose `name`. */
  def fuzzyJoin(feed: DataFrame, roster: DataFrame, maxDist: Int = 1): DataFrame = {
    val fk = feed.select(col("id"), col("name").as("feed_name"),
      explode(deletionKeys(col("name"))).as("k"))
    val rk = roster.select(col("name").as("matched_name"),
      explode(deletionKeys(col("name"))).as("k"))
    fk.join(rk, Seq("k"))
      // several deletion keys can collide for one pair (repeated chars);
      // dedupe candidates before the exact verify
      .select(col("id"), col("feed_name"), col("matched_name")).distinct()
      // threshold form: the banded DP abandons a row as soon as the
      // distance provably exceeds maxDist (returns -1), so verify cost is
      // O(len * maxDist) per candidate instead of O(len^2)
      .withColumn("d", levenshtein(col("feed_name"), col("matched_name"), maxDist))
      .filter(col("d") >= 0)
  }

  // The dirty feed both engines derive identically: each part's name with
  // the character at 0-based position (p_partkey % length) dropped —
  // a deterministic one-edit corruption of a known-good roster.
  private val DROP = "p_partkey % length(p_name)"
  private val CORRUPT =
    s"substring(p_name, 1, $DROP) || substring(p_name, $DROP + 2)"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q108_fuzzy_join",
      (s, d) => {
        val p = part(s, d)
        val feed = p.selectExpr("p_partkey AS id", s"$CORRUPT AS name")
        val roster = p.select(col("p_name").as("name")).distinct()
        fuzzyJoin(feed, roster)
          .withColumnRenamed("id", "p_partkey")
      },
      Some(s"""
        WITH feed AS (
          SELECT p_partkey, $CORRUPT AS feed_name FROM part),
        roster AS (SELECT DISTINCT p_name AS matched_name FROM part)
        SELECT f.p_partkey, f.feed_name, r.matched_name,
               levenshtein(f.feed_name, r.matched_name) AS d
        FROM feed f JOIN roster r
          ON levenshtein(f.feed_name, r.matched_name) <= 1"""),
      "fuzzy string join: SymSpell deletion-key candidates + exact levenshtein verify, no cross join")
  )
}
