package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Steal-resistant per-query work profile: wall time swings wildly under
  * episodic hypervisor co-tenancy (q120 measured 15/31/91 s for the SAME
  * plan on this sandbox), but the work a plan does is stable run to run —
  * so optimization deltas are adjudicated on executor CPU time and
  * shuffle volume, with wall min-of-N as the corroborating headline.
  *
  * Run: tools/run.sh graft.tools.QProf <sfDir> <passes> <queryName>...
  * Per query, per pass: wall s, executor CPU s (sum of task CPU),
  * shuffle write MB / rows, input MB, stage count.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QProf <sfDir> <passes> <queryName>...")
    val sfDir = args(0)
    val passes = args(1).toInt
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

    val cpuNs = new LongAdder; val swBytes = new LongAdder
    val swRows = new LongAdder; val inBytes = new LongAdder
    val stages = new LongAdder
    // GRAFT_QPROF_STAGES=1 additionally prints one line per completed
    // stage (CPU, shuffle, task count, name) — the attribution view for
    // "which stage grew" questions that the per-query totals can't answer
    val perStage = sys.env.get("GRAFT_QPROF_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          cpuNs.add(m.executorCpuTime)
          swBytes.add(m.shuffleWriteMetrics.bytesWritten)
          swRows.add(m.shuffleWriteMetrics.recordsWritten)
          inBytes.add(m.inputMetrics.bytesRead)
          if (perStage)
            println(f"  [stage ${sc.stageInfo.stageId}%4d] " +
              f"cpu=${m.executorCpuTime / 1e9}%7.2f " +
              f"swRows=${m.shuffleWriteMetrics.recordsWritten}%9d " +
              f"tasks=${sc.stageInfo.numTasks}%3d " +
              sc.stageInfo.name.take(90))
        }
        stages.add(1L)
      }
    })

    args.drop(2).foreach { name =>
      val q = SparkEntry.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query: $name"))
      (1 to passes).foreach { p =>
        if (name == "q147_bpe_train") graft.functions.Tokenizer.clearMemo()
        cpuNs.reset(); swBytes.reset(); swRows.reset(); inBytes.reset(); stages.reset()
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.Caches.release()
        println(f"$name%-28s p$p wall=$wall%7.2f cpu=${cpuNs.sum / 1e9}%7.2f " +
          f"shufMB=${swBytes.sum / 1e6}%9.1f shufRows=${swRows.sum}%11d " +
          f"inMB=${inBytes.sum / 1e6}%8.1f stages=${stages.sum}%4d")
      }
    }
    spark.stop()
  }
}
