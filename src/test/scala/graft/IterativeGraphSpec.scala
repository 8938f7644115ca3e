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

  test("self-loops: loop-only vertices label themselves, mixed ones don't duplicate") {
    // x has ONLY a self-loop (its own singleton component); b carries a
    // self-loop AND a real edge (must get exactly one label, via its
    // component, not a second self-label)
    val edges = Seq(("x", "x", "e"), ("b", "b", "e"), ("a", "b", "e"))
      .toDF("src", "dst", "relType")
    val out = IterativeGraph.connectedComponents(edges)
      .as[(String, String)].collect().toSeq
    assert(out.map(_._1).sorted == Seq("a", "b", "x"), s"one label per vertex: $out")
    assert(partitionOf(IterativeGraph.connectedComponents(edges)) ==
      Set(Set("a", "b"), Set("x")))
    // all-self-loop input: the loop never runs, every vertex is singleton
    val onlySelf = Seq(("p", "p", "e"), ("q", "q", "e")).toDF("src", "dst", "relType")
    assert(partitionOf(IterativeGraph.connectedComponents(onlySelf)) ==
      Set(Set("p"), Set("q")))
  }

  test("a long chain converges to one min-rooted component (multi-round path)") {
    // 64-vertex chain: worst case for hash-min diameter propagation, a few
    // alternating-star rounds here; exercises the star-test termination on
    // a graph that is NOT a star for several rounds
    val edges = (0 until 63).map(i => (f"v$i%02d", f"v${i + 1}%02d", "e"))
      .toDF("src", "dst", "relType")
    val labels = IterativeGraph.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(labels.size == 64 && labels.values.toSet == Set("v00"))
  }

  test("an input that is already a star terminates in one round, unchanged") {
    val edges = Seq(("b", "a", "e"), ("c", "a", "e"), ("d", "a", "e"))
      .toDF("src", "dst", "relType")
    var rounds = 0
    val labels = IterativeGraph.connectedComponents(edges,
        roundHook = (i, _, _) => rounds = i)
      .as[(String, String)].collect().toMap
    assert(rounds == 1, s"star input should be recognized after round 1, ran $rounds")
    assert(labels == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }
}
