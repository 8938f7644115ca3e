package graft

import org.apache.spark.sql.SparkSession

/** Plan/tuning workbench: time queries and dump `explain(formatted)`.
  *
  * Usage: graft.PlanLab <sfDir> [--explain] [query ...]
  * (no query names = all registered queries)
  */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val doExplain = rest.contains("--explain")
    val names = rest.filterNot(_ == "--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val selected =
      if (names.isEmpty) SparkEntry.all
      else SparkEntry.all.filter(q => names.contains(q.name))
    selected.foreach { q =>
      if (doExplain) {
        println(s"==== ${q.name} ====")
        q.fn(spark, sfDir).explain("formatted")
      }
      // fn must run INSIDE the timer: iterative queries (CC, Lloyd
      // trainers) execute driver-side jobs while BUILDING the frame, so
      // timing only the final write would miss most of their cost
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"${q.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
