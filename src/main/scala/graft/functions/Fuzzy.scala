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
      "fuzzy string join: SymSpell deletion-key candidates + exact levenshtein verify, no cross join"),

    QueryDef(
      "q123_entity_resolution",
      (s, d) => {
        // End-to-end entity resolution, composed from this repo's own
        // stages so stage-boundary drift can't hide behind individually
        // green pieces (the q97 lesson): two record systems — the clean
        // part roster and a deterministically corrupted feed (ids offset
        // by 10M) — are resolved into entity clusters by
        //   (1) blocking+matching: SymSpell deletion-key candidates +
        //       exact banded levenshtein (q108's operator, structurally
        //       complete for distance <= 1),
        //   (2) exact-name identity edges WITHIN each system (same-name
        //       records are duplicates even when no fuzzy bridge exists),
        //   (3) clustering: the large-star/small-star CC fixpoint over
        //       the match edges (q50/q61's operator),
        //   (4) survivorship: min-id record (clean roster ids sort below
        //       feed ids, so clean records win) donates the canonical
        //       name; singletons survive as their own entity.
        // 100 TB shape: every stage is a keyed join or bounded
        // aggregation — candidates are deletion-key equi joins, identity
        // edges group by name, CC is the log-round star iteration, and
        // survivorship is one join back on the component id. Nothing is
        // quadratic in the corpus; the only blowup axis is true
        // duplicate mass.
        val FEED_OFFSET = 10000000L
        val roster = part(s, d)
          .select(col("p_partkey").cast("long").as("rid"),
            col("p_name").as("name"))
        val feed = part(s, d)
          .selectExpr(s"p_partkey + $FEED_OFFSET AS id", s"$CORRUPT AS name")
          .select(col("id").cast("long").as("id"), col("name"))
        val recs = roster.select(col("rid").as("id"), col("name"))
          .unionAll(feed)
        // EVERYTHING pairwise happens on the DISTINCT NAME DOMAIN, never
        // the record stream: records fold into per-name groups (min-id
        // representative + count) with ONE aggregation, the
        // deletion-key/levenshtein match runs over distinct strings, and
        // CC runs on the name-representative graph. Record-level identity
        // edges (a clique, or even a star, per duplicate group) would
        // make the match and the CC grow with duplicate mass — the viral-
        // duplicate axis a 100 TB corpus guarantees — while the name
        // domain is bounded by string entropy. Components are identical:
        // every record is its group's rep by definition of the grouping,
        // and a component's min rep id IS the cluster's min record id
        // (each record's id >= its group's min).
        val groups = recs.groupBy(col("name"))
          .agg(min(col("id")).as("mn"), count(lit(1)).as("cnt"))
        val feedNames = feed.select(col("name")).distinct()
          .join(groups, "name")
          .select(col("mn").as("id"), col("name"))
        val namePairs = fuzzyJoin(feedNames, roster.select(col("name")).distinct())
          .select(col("id").as("src"), col("matched_name").as("name"))
          .join(groups.select(col("name"), col("mn").as("dst")), "name")
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"))
        val labels = graft.operators.IterativeGraph.connectedComponents(namePairs)
          .select(col("xref").cast("long").as("mn"),
            col("component").cast("long").as("comp"))
        val labeled = groups.join(labels, Seq("mn"), "left")
          .select(col("mn"), coalesce(col("comp"), col("mn")).as("cluster"),
            col("cnt"), col("name"))
        labeled.groupBy(col("cluster")).agg(sum(col("cnt")).as("size"))
          .join(labeled.filter(col("cluster") === col("mn"))
            .select(col("cluster"), col("name").as("survivor_name")), "cluster")
          .select(col("cluster"), col("size"), col("survivor_name"))
      },
      Some(s"""
        WITH RECURSIVE roster AS (
          SELECT cast(p_partkey AS bigint) AS id, p_name AS name FROM part),
        feed AS (
          SELECT cast(p_partkey + 10000000 AS bigint) AS id, $CORRUPT AS name
          FROM part),
        recs AS (SELECT id, name FROM roster UNION ALL SELECT id, name FROM feed),
        rep AS (SELECT name, min(id) AS mn FROM recs GROUP BY name),
        fuzzy AS (
          SELECT f.id AS a, p.mn AS b
          FROM feed f JOIN roster r ON levenshtein(f.name, r.name) <= 1
          JOIN rep p ON p.name = r.name),
        exact AS (
          SELECT p.mn AS a, x.id AS b
          FROM recs x JOIN rep p ON p.name = x.name
          WHERE x.id <> p.mn),
        edges AS (SELECT a, b FROM fuzzy UNION SELECT a, b FROM exact),
        sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
        reach(v, r) AS (
          SELECT id, id FROM recs
          UNION
          SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        labels AS (SELECT v, min(r) AS cluster FROM reach GROUP BY v),
        clusters AS (SELECT cluster, count(*) AS size FROM labels GROUP BY cluster)
        SELECT c.cluster, c.size, r.name AS survivor_name
        FROM clusters c JOIN recs r ON r.id = c.cluster"""),
      "entity resolution pipeline: deletion-key blocking -> levenshtein match -> CC clustering -> min-id survivorship")
  )
}
