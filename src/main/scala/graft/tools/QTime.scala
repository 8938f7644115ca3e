package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times individual registered queries against a scale dir — the
  * quiet-host re-measure harness the round verdicts keep asking for,
  * without running the whole bench suite.
  * Run: tools/run.sh graft.tools.QTime <sfDir> <queryName>...
  * Each query runs through the noop sink (full plan, no result transfer),
  * three passes, all reported (first = cold, min = headline). */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QTime <sfDir> <queryName>...")
    val sfDir = args.head
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional session-conf overrides, e.g. GRAFT_CONF="spark.graft.dedupSalt=off"
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    args.tail.foreach { name =>
      val q = SparkEntry.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query: $name"))
      val times = (1 to 3).map { _ =>
        // trainer pays its fit every pass (Bench's rule, same rationale)
        if (name == "q147_bpe_train") graft.functions.Tokenizer.clearMemo()
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.Caches.release() // drop lease-registry references too
        s
      }
      println(f"$name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f s")
    }
    spark.stop()
  }
}
