package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleUp

class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val outBase = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scale-spec").toString
    ScaleUp.amplify(spark, SF, s"$dir/x2", 2)
    dir
  }

  test("amplification multiplies fact rows by K and keeps dims fixed") {
    def n(t: String, dir: String): Long = spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings", "events"))
      assert(n(t, s"$outBase/x2") == 2 * spark.read.parquet(s"$SF/$t.parquet").count(),
        s"table $t should double")
    for (t <- Seq("region", "nation"))
      assert(n(t, s"$outBase/x2") == spark.read.parquet(s"$SF/$t.parquet").count(),
        s"dim $t should stay fixed")
  }

  test("copies are disjoint universes: keys, tokens, and join fan-out") {
    val docs = spark.read.parquet(s"$outBase/x2/documents.parquet")
    val ids = docs.select(col("doc_id")).as[Long].collect()
    assert(ids.distinct.length == ids.length, "doc ids must stay unique")
    // token universes of the two copies share nothing => near-dup/LSH
    // candidate structure replicates instead of cross-multiplying
    val shared = docs
      .withColumn("copy", (col("doc_id") >= ScaleUp.Shift).cast("int"))
      .select(col("copy"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(shared == 0, "copies must not share tokens")
    // every lineitem still finds its order exactly once (fan preserved)
    val l = spark.read.parquet(s"$outBase/x2/lineitem.parquet")
    val o = spark.read.parquet(s"$outBase/x2/orders.parquet")
    val unmatched = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(unmatched == 0, "key shift must keep lineitem->orders referential integrity")
  }

  test("embedding rotation preserves within-copy inner products") {
    val e = spark.read.parquet(s"$outBase/x2/embeddings.parquet")
      .withColumn("base_id", col("vec_id") % ScaleUp.Shift)
      .withColumn("copy", (col("vec_id") >= ScaleUp.Shift).cast("int"))
    // self dot product of each rotated vector == its copy-0 twin's
    val dots = e.select(col("base_id"), col("copy"),
        graft.functions.VectorOps.dot(
          graft.functions.VectorOps.asDouble(col("embedding")),
          graft.functions.VectorOps.asDouble(col("embedding"))).as("d2"))
      .groupBy(col("base_id"))
      .agg((max(col("d2")) - min(col("d2"))).as("spread"))
      .agg(max(col("spread"))).head().getDouble(0)
    assert(dots < 1e-9, "rotation must preserve norms exactly")
  }
}
