package graft

import org.apache.spark.sql.functions._

import graft.gedcom.GraphOps
import graft.operators.IterativeGraph

/** The DataFrame hash-min connected components must induce exactly the
  * same partition of vertices as GraphX's implementation. */
class IterativeGraphSpec extends SparkSpec {
  import spark.implicits._

  private def partitionOf(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
    df.as[(String, String)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  private def partitionOfLong(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
    df.as[(String, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("matches GraphX components on the family fixture") {
    val edges = Seq(
      ("F1", "GP", "Husband"), ("F1", "GM", "Wife"), ("F1", "P", "Child"),
      ("F2", "P", "Husband"), ("F2", "S", "Wife"), ("F2", "C", "Child"),
      ("F9", "Q", "Husband"), ("F9", "Z", "Child"))
      .toDF("src", "dst", "relType")
    assert(partitionOf(IterativeGraph.connectedComponents(edges)) ==
      partitionOfLong(GraphOps.familyClusters(edges)))
  }

  test("matches GraphX components on a random graph") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((s"v${rnd.nextInt(120)}", s"v${rnd.nextInt(120)}"))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (a, b, "e") }
      .toDF("src", "dst", "relType")
    assert(partitionOf(IterativeGraph.connectedComponents(edges)) ==
      partitionOfLong(GraphOps.familyClusters(edges)))
  }

  test("singleton islands and empty edge frames") {
    val edges = Seq(("a", "b", "e")).toDF("src", "dst", "relType")
    val p = partitionOf(IterativeGraph.connectedComponents(edges))
    assert(p == Set(Set("a", "b")))
    val none = Seq.empty[(String, String, String)].toDF("src", "dst", "relType")
    assert(IterativeGraph.connectedComponents(none).count() == 0)
  }
}
