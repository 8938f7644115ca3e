package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-frame attribution for the q68 pair-generation pipeline: times each
  * stage of docTokens -> docPrefixArrays -> prefix candidates -> exact
  * verify separately (noop-sink semantics via count), so the fused pin
  * stage's CPU can be assigned to tokenize / df join / candidate join /
  * array_intersect verify. Run: tools/run.sh graft.tools.Q68Prof <sfDir>
  */
object Q68Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q68prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      val docs = graft.Tables.documents(spark, sfDir)
      time("documents scan")(docs.write.format("noop").mode("overwrite").save())
      val toks = docs.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(graft.functions.TextAnalysis.tokens(col("text")))).as("word"))
      time("tokenize+explode")(toks.write.format("noop").mode("overwrite").save())
      val idx = graft.functions.Dedup.prefixIndex(toks, 0.8)
      time("prefix arrays (df join + sorts)")(
        idx.write.format("noop").mode("overwrite").save())
      val pairs = graft.functions.Dedup.jaccardPairsPrefixUnordered(toks, 0.8)
      time("pairs (cand + verify)")(
        pairs.write.format("noop").mode("overwrite").save())
      val cc = graft.operators.IterativeGraph.connectedComponents(
        pairs.select(col("ia").as("src"), col("ib").as("dst")))
      time("cc closure")(cc.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      graft.Caches.release()
    }
    spark.stop()
  }
}
