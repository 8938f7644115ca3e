package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-frame attribution for the q99 embedding-cluster pipeline: times
  * (wall + executor CPU) the pair relation alone, the pair relation under
  * a lease, and the CC closure over it — to attribute the pin-stage CPU
  * seen in QProf. Run: tools/run.sh graft.tools.Q99Prof <sfDir>
  */
object Q99Prof {
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
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })

    val cpuNs = new LongAdder
    val stagePrint = sys.env.get("GRAFT_Q99_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        cpuNs.add(sc.stageInfo.taskMetrics.executorCpuTime)
        if (stagePrint) {
          val m = sc.stageInfo.taskMetrics
          println(f"  [stage ${sc.stageInfo.stageId}%4d] cpu=${m.executorCpuTime / 1e9}%7.2f " +
            f"swRows=${m.shuffleWriteMetrics.recordsWritten}%8d tasks=${sc.stageInfo.numTasks}%3d " +
            sc.stageInfo.name.take(90))
        }
      }
    })
    def time[T](label: String)(f: => T): T = {
      cpuNs.reset()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(300) // let the listener bus drain stage events
      println(f"[q99prof] $label%-40s wall=${(System.nanoTime() - t0) / 1e9}%7.2f cpu=${cpuNs.sum / 1e9}%7.2f")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      val pairs0 = graft.functions.Dedup.embeddingPairsLshUnordered(spark, sfDir)
        .select(col("ia").as("src"), col("ib").as("dst"))
      time("pairs bare (noop)")(
        pairs0.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache(); graft.Caches.release()
      val pairs1 = graft.Caches.lease(
        graft.functions.Dedup.embeddingPairsLshUnordered(spark, sfDir)
          .select(col("ia").as("src"), col("ib").as("dst")))
      time("pairs lease materialize (count)")(pairs1.count())
      time("cc over materialized lease")(
        graft.operators.IterativeGraph.connectedComponents(pairs1)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache(); graft.Caches.release()
      val pairs2 = graft.Caches.lease(
        graft.functions.Dedup.embeddingPairsLshUnordered(spark, sfDir)
          .select(col("ia").as("src"), col("ib").as("dst")))
      time("cc over COLD lease (q99 shape)")(
        graft.operators.IterativeGraph.connectedComponents(pairs2)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache(); graft.Caches.release()
    }
    spark.stop()
  }
}
