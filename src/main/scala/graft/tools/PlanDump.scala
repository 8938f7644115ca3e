package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.{PlanProbe, SparkEntry}

/** Writes `<outDir>/<query>.txt` with `explain("formatted")` of each
  * registered query's frame PLUS every internal frame the operator emits
  * through [[graft.PlanProbe]] — the optimization round's plan-evidence
  * dumper. Iterative operators return eager LogicalRDD frames whose
  * top-level explain is a bare scan; their loop-round and closure plans
  * only exist while the frame is being built, which is exactly when the
  * probe fires. Loop rounds share one label; only the FIRST emission per
  * label is kept (every round has the identical shape by construction).
  *
  * Run: tools/run.sh graft.tools.PlanDump <sfDir> <outDir> <queryName>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <queryName>...")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mode = ExplainMode.fromString("formatted")
    args.drop(2).foreach { name =>
      val q = SparkEntry.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query: $name"))
      val sections = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val df = PlanProbe.withSink { (label, frame) =>
        if (!sections.contains(label))
          sections(label) = frame.queryExecution.explainString(mode)
      }(q.fn(spark, sfDir))
      val top = df.queryExecution.explainString(mode)
      val body = new StringBuilder
      body ++= s"==== $name :: top-level ====\n$top\n"
      sections.foreach { case (label, text) =>
        body ++= s"\n==== $name :: $label ====\n$text\n"
      }
      Files.write(outDir.resolve(s"$name.txt"),
        body.toString.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name (${sections.size} internal sections)")
      spark.catalog.clearCache()
      graft.Caches.release()
    }
    spark.stop()
  }
}
