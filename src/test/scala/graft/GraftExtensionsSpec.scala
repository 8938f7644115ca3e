package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions contract: reflective no-arg construction") {
    // Spark instantiates the configured class by name with a no-arg
    // constructor; pin that contract so a refactor to an object or a
    // parameterized class can't silently break cluster deployment
    val inst = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
    assert(inst.isInstanceOf[SparkSessionExtensions => Unit])
  }

  test("injected vec_dot resolves in pure SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // same registerFunctions call Spark makes at session build
    GraftSqlBridge.applyExtensionFunctions(ext, spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(got == 32.0)
    // and DESCRIBE FUNCTION works (the ExpressionInfo is real)
    val desc = spark.sql("DESCRIBE FUNCTION vec_dot").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("vec_dot"))
  }
}
