package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gedcom.{CsvSink, GedcomGraph}

/** Phase-timing profile of the GEDCOM -> CSV pipeline on a given input:
  * separates the parse pass (text scan -> pinned flat rows) from the CSV
  * fan-out so throughput regressions can be attributed to a phase.
  * Run: tools/run.sh graft.tools.GedcomProfile </path/to.ged> [passes] */
object GedcomProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GedcomProfile <file.ged> [passes]")
    val path = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val mb = new java.io.File(path).length() / 1e6
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val graph = GedcomGraph.fromFile(spark, path)
      // the parse job is the flat frame's materialization; force it alone
      graph.flat.queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      val outputs = CsvSink.write(graph, s"/tmp/graft-gedprof-$p")
      val t2 = System.nanoTime()
      graph.release()
      val parse = (t1 - t0) / 1e9; val csv = (t2 - t1) / 1e9
      val total = (t2 - t0) / 1e9
      println(f"pass $p: parse $parse%6.2f s  csv $csv%6.2f s  " +
        f"total $total%6.2f s  (${mb / total}%5.1f MB/s, ${outputs.size} outputs)")
    }
    spark.stop()
  }
}
