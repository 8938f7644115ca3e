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

  test("ancestor closure walks generations") {
    val anc = GraphOps.ancestorsOf(edges, "C").as[(String, Int)].collect().toMap
    assert(anc == Map("P" -> 1, "S" -> 1, "GP" -> 2, "GM" -> 2))
  }
}
