package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Dedup, TextAnalysis}

/** A/B timing of the two MinHash signature paths (row-wise interpreted
  * HOF vs exploded codegen projection) feeding the same LSH pair join.
  * Run: tools/run.sh graft.tools.MinhashTune [sfDir] */
object MinhashTune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"$label%-22s ${ts.map(t => f"$t%6.2f").mkString(" ")}  min=${ts.min}%6.2f s")
    }
    val docs = Tables.documents(spark, sf)
    time("sig-rowwise")(Dedup.minhashSignaturesRowwise(docs, Seq("lang", "source")))
    time("sig-exploded")(Dedup.minhashSignatures(
      docs.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("word")),
      Seq("lang", "source")))
    time("pairs-rowwise")(Dedup.minhashPairsFromSigs(
      Dedup.minhashSignaturesRowwise(docs, Seq("lang", "source")),
      Seq("lang", "source"), 0.75))
    time("pairs-exploded")(Dedup.minhashPairs(
      docs.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("word")),
      Seq("lang", "source"), 0.75))
    spark.stop()
  }
}
