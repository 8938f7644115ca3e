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
}
