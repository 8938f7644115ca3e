package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.IterativeGraph

/** Per-round profile of q61's large/small-star CC at a given scale factor:
  * prints edge-set size and wall time per round, plus end-to-end time.
  * Run: tools/run.sh graft.tools.CCProfile [sfDir] */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("CC_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = Tables.lineitem(spark, sf)
      .select(concat(lit("P"), col("l_partkey")).as("src"),
        concat(lit("S"), col("l_suppkey")).as("dst"))
      .distinct()
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = IterativeGraph.connectedComponents(edges,
          roundHook = (i, edgeCount, nanos) =>
            println(f"  pass $pass round $i%2d: $edgeCount%8d edges  ${nanos / 1e9}%6.2f s"))
        .count()
      println(f"pass $pass: $n labeled vertices in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
