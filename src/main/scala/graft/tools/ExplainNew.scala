package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit: prints scan/exchange/window/cache counts and the
  * formatted plan for the named queries (all queries if none named).
  * Run: tools/run.sh graft.tools.ExplainNew [sfDir] [query...] */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.all.map(_.name)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $q: scans=${"FileScan".r.findAllIn(p).size} " +
        s"exchanges=${"Exchange".r.findAllIn(p).size} " +
        s"windows=${" Window".r.findAllIn(p).size} " +
        s"cartesian=${"CartesianProduct".r.findAllIn(p).size}")
      if (args.length > 1) println(p)
    }
    spark.stop()
  }
}
