package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph algorithms expressed purely in the DataFrame API —
  * the Catalyst-planned alternative to GraphX's RDD machinery for the
  * simple label-propagation family.
  */
object IterativeGraph {

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Converges in O(log n) rounds vs O(diameter) for naive
    * hash-min propagation — on chain-heavy graphs (genealogies) that is
    * the difference between a handful of shuffle rounds and hundreds.
    *
    * State is a canonically oriented edge set (u > v). Per round:
    *   large-star: each vertex links its LARGER neighbors to its
    *               minimum neighbor (or itself);
    *   small-star: each vertex links its smaller neighbors and itself
    *               to its minimum neighbor.
    * At the fixpoint every component is a star rooted at its minimum
    * member, so edge (u, root) IS the label assignment. Returns
    * (xref, component) where component is the smallest member.
    *
    * Physical shape (the part that must survive 100 TB):
    *   - per-vertex minima come from `groupBy(u).agg(min(v))` + an equi
    *     join back — partial (map-side) aggregation absorbs hub skew. A
    *     window `min().over(partitionBy(u))` would instead shuffle every
    *     neighbor row of a vertex into ONE task and sort it; at the
    *     fixpoint the component root's partition holds the entire
    *     component — a single-task straggler by construction, i.e.
    *     exactly the skew large-star exists to avoid.
    *   - the edge set's lineage is truncated EVERY round: the round's rows
    *     are persisted as a raw-row RDD and the frame is rebuilt from it
    *     (LogicalRDD), so the plan never grows. cache() alone does not
    *     truncate the logical plan — without per-round truncation the plan
    *     doubles each round and driver-side Catalyst analysis dominates
    *     late rounds (geometric subtree blowup). Doing the truncation by
    *     hand (instead of an eager localCheckpoint) lets the convergence
    *     signature be the SAME job that materializes the round — one job
    *     per round, not two.
    *
    * Convergence: equal (count, bit_xor(xxhash64(u,v))) signatures on
    * consecutive rounds mean the set reached the fixpoint. XOR is a safe
    * set checksum here: the set is distinct (no cancelling duplicates)
    * and XOR cannot overflow under ANSI mode. A cross-round signature
    * collision (~2^-64 per round) would terminate early with an
    * unconverged labeling — accepted and documented.
    *
    * Throws if maxIter is exhausted before the fixpoint: a non-star
    * intermediate edge set maps one vertex to several targets, so
    * returning it would yield duplicate xrefs with conflicting labels —
    * worse than a silently-wrong answer.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession

    // pin a frame's rows and rebuild it lineage-free: rows must be copied
    // (toRdd reuses per-partition buffers) before persisting. The RDD
    // localCheckpoint truncates PHYSICAL lineage at first materialization,
    // so a lost block late in the loop cannot cascade recomputation
    // through every earlier round.
    def pin(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
      val rdd = df.queryExecution.toRdd.map(_.copy())
        .persist(StorageLevel.MEMORY_AND_DISK)
      rdd.localCheckpoint()
      (GraftSqlBridge.internalCreateDataFrame(spark, rdd, df.schema), rdd)
    }

    // canonical orientation u > v, self-loops dropped
    var (e, eRdd) = pin(edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var prevSig: (Long, Long) = null
    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star over the symmetric neighbor relation. m = min(N(u) ∪ u);
      // emit (v, m) for larger neighbors v — output stays (u > v)-oriented.
      // No distinct here: duplicate rows can't change small-star's min and
      // the round's final distinct drops them — saves a shuffle per round.
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val minL = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym.join(minL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: neighbors of u are all smaller, m = their minimum;
      // relink them (and u itself) to m. minS(u, m) already IS the
      // distinct (u, m) row set, so only the relinked neighbors join.
      val minS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(minS, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minS.select(col("u"), col("m").as("v")))
        .distinct()
      val (mat, matRdd) = pin(next)
      // ONE job: computes the round, fills the persisted blocks, and
      // produces the convergence signature from them
      val row = mat
        .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .head()
      val sig = (row.getLong(0), row.getLong(1))
      eRdd.unpersist(blocking = false)
      e = mat
      eRdd = matRdd
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }
    if (!converged) {
      eRdd.unpersist(blocking = false) // don't leak the pinned blocks on failure
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds " +
          "(intermediate edge sets carry conflicting labels; raise maxIter)")
    }

    // at the fixpoint e maps every non-root vertex to its component root;
    // roots (never on the u side) map to themselves
    val verts = edges.select(col("src").as("xref"))
      .union(edges.select(col("dst").as("xref")))
      .distinct()
    val nonRoots = e.select(col("u").as("xref"), col("v").as("component"))
    val roots = verts.join(nonRoots.select(col("xref")), Seq("xref"), "left_anti")
      .select(col("xref"), col("xref").as("component"))
    nonRoots.union(roots)
  }
}
