package graft

import org.apache.spark.sql.functions._

/** Boundary semantics of the q163 bucket grid and a planted-drift
  * fixture for the q164 centroid monitor. */
class BatchingSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(lens: Long*): Map[Long, Long] = {
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, "s", Seq.fill(n.toInt)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // replicate q163's resolution expression exactly
    val grid = array((4 to 12).map(p => lit(1L << p)): _*)
    docs.select(col("doc_id"),
        size(graft.functions.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .select(col("n"),
        array_min(filter(grid, b => b >= least(col("n"), lit(4096L)))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bucket boundaries: exact powers land in their own bucket, +1 promotes") {
    val got = bucketOf(1, 15, 16, 17, 64, 65, 4096)
    assert(got(1L) == 16 && got(15L) == 16 && got(16L) == 16, got)
    assert(got(17L) == 32, got)
    assert(got(64L) == 64 && got(65L) == 128, got)
    assert(got(4096L) == 4096, got)
  }

  test("over-length docs clip to the top bucket (truncation semantics)") {
    val got = bucketOf(4097, 9999)
    assert(got.values.forall(_ == 4096), got)
  }

  test("q164 fixture: a shifted incoming centroid reads low cosine; an aligned one reads ~1") {
    // synthetic embeddings: label 0 incoming == base direction (cos ~1);
    // label 1 incoming flipped (cos ~ -1). vec_id % 10 == 0 is incoming.
    def vec(sign: Double) = Seq.tabulate(8)(i => sign * (0.1 + 0.1 * i))
    val rows =
      (1L to 9L).map(i => (i, vec(1.0), 0)) ++ Seq((10L, vec(1.0), 0)) ++
      (11L to 19L).map(i => (i + 10, vec(1.0), 1)) ++ Seq((40L, vec(-1.0), 1))
    val e = rows.toDF("vec_id", "embedding", "label")
    // run the registered query body against a temp dir? — no: exercise the
    // same pipeline via a parquet round-trip the loader reads
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    e.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q164_embedding_drift")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(math.abs(got(0) - 1.0) < 0.001, s"aligned label: ${got(0)}")
    assert(got(1) < -0.99, s"flipped label: ${got(1)}")
  }
}
