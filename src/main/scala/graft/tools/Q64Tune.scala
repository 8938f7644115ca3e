package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operating-point grid for q64's LSH near-dup: recall + candidate volume
  * vs the exact brute baseline across (targetBucket, radius, nTables).
  * Run: tools/run.sh graft.tools.Q64Tune [sfDir] */
object Q64Tune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("ia").cast("long"), col("ib").cast("long"))
        .as[(Long, Long)].collect().toSet
    val brute = pairsOf(graft.functions.Dedup.embeddingPairsBrute(spark, sf))
    println(s"[q64tune] sf=$sf exact pairs=${brute.size}")

    for (b <- Seq(32L, 64L); r <- Seq(2, 3); l <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val got = pairsOf(
        graft.functions.Dedup.embeddingPairsLsh(spark, sf, b, r, l))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall =
        if (brute.isEmpty) 1.0 else got.count(brute).toDouble / brute.size
      println(f"[q64tune] B=$b%-3d radius=$r L=$l recall=$recall%.3f pairs=${got.size}%5d  ${sec}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
