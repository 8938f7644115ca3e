package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native vec_dot equals the composed zip_with/aggregate form bit-for-bit") {
    val e = Tables.embeddings(spark, SF)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(broadcast(b), col("ia") < col("ib") && col("ib") < 50)
    val diff = pairs.select(
      VectorOps.dot(col("va"), col("vb")).as("native"),
      VectorOps.dotComposed(col("va"), col("vb")).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(diff == 0)
  }

  test("vec_dot registers as a SQL function") {
    graft.functions.expressions.VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(got == 11.0)
  }

  test("vec_dot handles nulls and mismatched lengths") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0)))).toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(32.0), None, Some(3.0)))
  }

  test("large codebooks ride a broadcast: serialized expression stays O(1) in C") {
    import graft.functions.expressions.{CodebookHandle, VectorExpressions}
    def serializedBytes(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.size()
    }
    // an 8192 x 64 book is ~4.2 MB of doubles; past BROADCAST_CELLS the
    // expression must serialize as a handle, not the payload — this is
    // what bounds the task binary at the 65536-cell clamp (~33 MB inline)
    val dim = 64
    val big = (0 until CodebookHandle.BROADCAST_CELLS * 2).map(c =>
      (0 until dim).map(j => ((c * dim + j) % 997) / 997.0))
    val df = Seq((0L, (0 until dim).map(_ / 64.0))).toDF("vec_id", "v")
    val bigCol = VectorExpressions.centroidTopK(col("v"), big, 3)
    val n = serializedBytes(
      org.apache.spark.sql.GraftSqlBridge.expression(bigCol))
    assert(n < 100 * 1024,
      s"big-codebook CentroidTopK serializes at $n bytes — payload is inline")
    // a small book stays inline (no broadcast churn per Lloyd round)
    val small = big.take(8)
    val nSmall = serializedBytes(
      org.apache.spark.sql.GraftSqlBridge.expression(
        VectorExpressions.centroidTopK(col("v"), small, 3)))
    assert(nSmall > 1024, s"small codebook unexpectedly tiny: $nSmall")
    // and the broadcast path computes the identical assignment
    val gotBig = df.select(bigCol.as("t")).head.getSeq[Int](0)
    val ref = big.zipWithIndex.map { case (cvec, c) =>
      (cvec.zip((0 until dim).map(_ / 64.0)).map { case (x, y) => x * y }.sum, c)
    }.sortBy { case (s, c) => (-s, -c) }.take(3).map(_._2)
    assert(gotBig == ref, s"$gotBig != $ref")
  }
}
