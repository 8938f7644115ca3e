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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val selected =
      if (names.isEmpty) SparkEntry.all
      else SparkEntry.all.filter(q => names.contains(q.name))
    selected.foreach { q =>
      val df = q.fn(spark, sfDir)
      if (doExplain) {
        println(s"==== ${q.name} ====")
        df.explain("formatted")
      }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"${q.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
