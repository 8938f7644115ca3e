package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock of the q65 prefix-join pipeline. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val toks = graft.functions.Dedup.docTokens(spark, sf)
    timed("docTokens count")(println("  rows " + toks.count()))
    val prefix = graft.functions.Dedup.prefixTokens(toks, 0.8)
    timed("prefixTokens (docPrefixArrays + explode)")(println("  rows " + prefix.count()))
    timed("full q65")(
      graft.functions.Dedup.jaccardPairsPrefix(toks, 0.8)
        .write.format("noop").mode("overwrite").save())
    timed("full q65 again")(
      graft.functions.Dedup.jaccardPairsPrefix(toks, 0.8)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
