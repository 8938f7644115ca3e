package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms expressed purely in the DataFrame API —
  * the Catalyst-planned alternative to GraphX's RDD machinery for the
  * simple label-propagation family. Each round is one shuffle
  * (join + min-aggregate); AQE re-plans every round on the real sizes,
  * and there is no vertex-id hashing or RDD serialization overhead.
  */
object IterativeGraph {

  /** Connected components by hash-min label propagation: every vertex
    * repeatedly takes the smallest label among itself and its neighbors
    * until a fixpoint. Returns (xref, component) where component is the
    * lexicographically smallest member of the vertex's component.
    *
    * Caching each iteration's labels and unpersisting the previous frame
    * keeps the lineage flat (without it the plan doubles per round).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // undirected neighbor relation
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .cache()
    var labels = und.select(col("a").as("v")).distinct()
      .withColumn("label", col("v"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborLabels = und
        .join(labels.withColumnRenamed("v", "b").withColumnRenamed("label", "nl"), "b")
        .select(col("a").as("v"), col("nl"))
      val next = labels.select(col("v"), col("label"))
        .union(neighborLabels.select(col("v"), col("nl"))) // positional union
        .groupBy("v").agg(min(col("label")).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "v")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    und.unpersist(blocking = false)
    labels.select(col("v").as("xref"), col("label").as("component"))
  }
}
