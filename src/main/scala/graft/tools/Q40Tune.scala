package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.functions.Similarity

/** q40 operating-point grid for the sha2-derived hyperplane family:
  * recall@K vs q39 across table counts and probe radii at one scale dir.
  * Run: tools/run.sh graft.tools.Q40Tune [sfDir] */
object Q40Tune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("ib")).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topk(SparkEntry.queries("q39_knn_brute")(spark, sf))
    val e = Similarity.prepared(spark, sf).cache()
    val p = Similarity.planesForCorpus(e.count())
    for (r <- Seq(2, 3); l <- Seq(3, 4, 5, 6)) {
      val got = topk(Similarity.lshTopK(e, p, r, Similarity.N_QUERIES,
        Similarity.K, l))
      val rec = exact.map { case (q, ex) =>
        got.get(q).map(s => ex.count(s).toDouble / ex.size).getOrElse(0.0)
      }.sum / exact.size
      println(f"p=$p r=$r L=$l recall@${Similarity.K} = $rec%.3f")
    }
    spark.stop()
  }
}
