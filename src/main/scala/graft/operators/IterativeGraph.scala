package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * One action per round: the new edge set is materialized by the same
    * aggregation that computes its convergence signature
    * (count, bit_xor(xxhash64(u,v))) — equal signatures on consecutive
    * rounds mean the set reached the fixpoint (the changed-row join +
    * count() of the old hash-min loop was a second job per round).
    * XOR is a safe set checksum here: the set is distinct (no
    * cancelling duplicates) and XOR cannot overflow under ANSI mode.
    * localCheckpoint every few rounds keeps lineage flat.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical orientation u > v, self-loops dropped
    var e = edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .cache()

    val byU = Window.partitionBy("u")
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
      val large = sym
        .withColumn("m", least(min(col("v")).over(byU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: neighbors of u are all smaller, m = their minimum;
      // relink them (and u itself) to m.
      val withM = large.withColumn("m", min(col("v")).over(byU))
      val next = withM.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .distinct()
      val mat =
        if ((iter + 1) % 5 == 0) next.localCheckpoint(false) else next.cache()
      val row = mat
        .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .head()
      val sig = (row.getLong(0), row.getLong(1))
      e.unpersist(blocking = false)
      e = mat
      converged = sig == prevSig
      prevSig = sig
      iter += 1
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
