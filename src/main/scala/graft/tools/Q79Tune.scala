package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-count grid for q79 SemDeDup: removal-set recall vs the exact
  * all-pairs removal list across P. Run: tools/run.sh graft.tools.Q79Tune [sfDir] */
object Q79Tune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = graft.functions.Similarity.prepared(spark, sf).cache()
    val exact = e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorOps.cosinePre(
        graft.functions.VectorOps.dot(col("a.v"), col("b.v")),
        col("a.nrm"), col("b.nrm")) >= 0.4)
      .select(col("b.vec_id")).distinct().as[Long].collect().toSet
    println(s"[q79tune] sf=$sf exact removals=${exact.size}")
    for (p <- Seq(6, 7, 8, 9, 10, 12)) {
      val t0 = System.nanoTime()
      val got = graft.functions.Dedup
        .semdedupAssignments(e, graft.functions.Dedup.SEMDEDUP_CLUSTER, 0.4, Some(p))
        ._2.select(col("vec_id")).as[Long].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = if (exact.isEmpty) 1.0 else got.count(exact).toDouble / exact.size
      println(f"[q79tune] P=$p%-2d recall=$rec%.3f removed=${got.size}%5d ${sec}%.1f s")
    }
    spark.stop()
  }
}
