package graft

import graft.gedcom.GraphOps

/** GraphX layer over a three-generation family tree. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // F1: grandpa GP + grandma GM, child P. F2: P + spouse S, child C.
  // Separate island: F9 with child Z.
  lazy val edges = Seq(
    ("F1", "GP", "Husband"), ("F1", "GM", "Wife"), ("F1", "P", "Child"),
    ("F2", "P", "Husband"), ("F2", "S", "Wife"), ("F2", "C", "Child"),
    ("P", "F1", "Child in Family"), ("C", "F2", "Child in Family"),
    ("F9", "Q", "Husband"), ("F9", "Z", "Child"))
    .toDF("src", "dst", "relType")

  test("connected components split the two family islands") {
    val cc = GraphOps.familyClusters(edges).as[(String, Long)].collect().toMap
    val main = Set("F1", "F2", "GP", "GM", "P", "S", "C").map(cc)
    val island = Set("F9", "Q", "Z").map(cc)
    assert(main.size == 1 && island.size == 1 && main != island)
  }

  test("degrees count in+out edges") {
    val d = GraphOps.degrees(edges)
      .as[(String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(d("F1") == (("F1", 1, 3, 4))) // in: P's FAMC; out: H/W/C
    assert(d("P") == (("P", 2, 1, 3)))   // in: F1 Child + F2 Husband; out: FAMC
  }

  test("parent edges derive from family topology") {
    val pe = GraphOps.parentEdges(edges).as[(String, String)].collect().toSet
    assert(pe == Set(("P", "GP"), ("P", "GM"), ("C", "P"), ("C", "S"), ("Z", "Q")))
  }

  test("pageRank ranks the hub family highest") {
    val pr = GraphOps.pageRank(edges).as[(String, Double)].collect().toMap
    // F1 and F2 receive in-links (FAMC) AND have out-links; GP/GM/S/C are
    // leaves. The child-in-family targets (F1, F2) should outrank leaves.
    assert(pr("F1") > pr("GP") && pr("F2") > pr("S"))
  }

  test("triangle counts see the H-W-C family triangle") {
    // close the triangle: spouse link between GP and GM
    val withSpouse = edges.union(Seq(("GP", "GM", "Spouse")).toDF("src", "dst", "relType"))
    val tc = GraphOps.triangleCounts(withSpouse).as[(String, Int)].collect().toMap
    assert(tc("GP") >= 1 && tc("GM") >= 1 && tc("F1") >= 1)
    assert(tc("Z") == 0)
  }

  test("hop distances from a landmark") {
    val d = GraphOps.hopDistances(edges, Seq("C"))
      .as[(String, String, Int)].collect()
      .map { case (x, _, h) => x -> h }.toMap
    assert(d("C") == 0 && d("F2") == 1 && d("P") == 2 && d("GP") == 4)
    assert(!d.contains("Z") || d("Z") > 100) // other island unreachable
  }

  test("ancestor closure walks generations") {
    val anc = GraphOps.ancestorsOf(edges, "C").as[(String, Int)].collect().toMap
    assert(anc == Map("P" -> 1, "S" -> 1, "GP" -> 2, "GM" -> 2))
  }
}
