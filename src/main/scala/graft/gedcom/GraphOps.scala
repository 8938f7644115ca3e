package graft.gedcom

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph, VertexId}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** GraphX layer over the flattened property graph (BASELINE.json north
  * star: "DataFrame transformations + GraphX for relationship modeling").
  *
  * Vertex ids are 64-bit hashes of the xref string (collision odds n^2/2^64
  * — negligible below ~10^8 vertices; the xref is kept as the vertex
  * attribute so results join back to the property tables by string id).
  */
object GraphOps {

  /** Stable 64-bit vertex id from an xref string (FNV-1a). */
  def vertexId(xref: String): VertexId = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < xref.length) { h ^= xref.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Build a GraphX graph from the edges DF (src, dst, relType). Vertices
    * are the union of endpoints, attributed with their xref. */
  def toGraphX(edges: DataFrame): GXGraph[String, String] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select("src", "dst", "relType").as[(String, String, String)]
      .rdd.map { case (s, d, t) => GXEdge(vertexId(s), vertexId(d), t) }
    val vs = edges.select(explode(array(col("src"), col("dst"))).as("xref"))
      .distinct().as[String].rdd.map(x => (vertexId(x), x))
    GXGraph(vs, es)
  }

  /** Connected components — family clusters. Returns (xref, componentId). */
  def familyClusters(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraphX(edges)
    val cc = g.connectedComponents().vertices // (vid, componentVid)
    g.vertices.join(cc)
      .map { case (_, (xref, comp)) => (xref, comp) }
      .toDF("xref", "component")
  }

  /** In/out/total degree per xref. */
  def degrees(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraphX(edges)
    val in = g.inDegrees
    val out = g.outDegrees
    g.vertices.leftOuterJoin(in).leftOuterJoin(out)
      .map { case (_, ((xref, i), o)) =>
        (xref, i.getOrElse(0), o.getOrElse(0), i.getOrElse(0) + o.getOrElse(0))
      }
      .toDF("xref", "in_degree", "out_degree", "degree")
  }

  /** child -> parent edges derived from the family topology: family F with
    * `Child` edge to C and `Husband`/`Wife` edge to P gives C -> P.
    * Pure DataFrame self-join on the family id. */
  def parentEdges(edges: DataFrame): DataFrame = {
    val children = edges.filter(col("relType") === "Child")
      .select(col("src").as("family"), col("dst").as("child"))
    val parents = edges.filter(col("relType").isin("Husband", "Wife"))
      .select(col("src").as("family"), col("dst").as("parent"))
    children.join(parents, "family").select(col("child"), col("parent")).distinct()
  }

  /** PageRank over the property graph — relative structural importance of
    * individuals/families (hub families rank high). Standard GraphX
    * iterate-until-tolerance implementation. */
  def pageRank(edges: DataFrame, tol: Double = 1e-4): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraphX(edges)
    g.vertices.join(g.pageRank(tol).vertices)
      .map { case (_, (xref, rank)) => (xref, rank) }
      .toDF("xref", "rank")
  }

  /** Triangle count per vertex over the undirected view — cohesion measure
    * (in family graphs, triangles arise from intermarriage patterns). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraphX(edges)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    g.vertices.join(g.triangleCount().vertices)
      .map { case (_, (xref, n)) => (xref, n) }
      .toDF("xref", "triangles")
  }

  /** Undirected hop distance from each vertex to the given landmarks. */
  def hopDistances(edges: DataFrame, landmarks: Seq[String]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraphX(edges)
    // undirected view: add reversed edges
    val und = GXGraph(g.vertices, g.edges.union(g.edges.reverse))
    val res = org.apache.spark.graphx.lib.ShortestPaths.run(und, landmarks.map(vertexId))
    val names = landmarks.map(l => vertexId(l) -> l).toMap
    g.vertices.join(res.vertices)
      .flatMap { case (_, (xref, dists)) =>
        dists.map { case (lm, d) => (xref, names(lm), d) }
      }
      .toDF("xref", "landmark", "hops")
  }

  /** Transitive ancestor closure from `start`, via Pregel BFS over the
    * child->parent graph. Returns (xref, generation) with generation = 1 for
    * parents, 2 for grandparents, ... Iterations are bounded by `maxGen` —
    * at scale this is the iterative-traversal pattern that a self-join loop
    * cannot express without quadratic shuffles. */
  def ancestorsOf(edges: DataFrame, start: String, maxGen: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pe = parentEdges(edges)
    val es = pe.as[(String, String)].rdd
      .map { case (c, p) => GXEdge(vertexId(c), vertexId(p), 1) }
    val vs = pe.select(explode(array(col("child"), col("parent"))).as("x"))
      .distinct().as[String].rdd.map(x => (vertexId(x), (x, Int.MaxValue)))
    val startId = vertexId(start)
    val g = GXGraph(vs, es)
      .mapVertices((vid, attr) => if (vid == startId) (attr._1, 0) else attr)
    val res = g.pregel(Int.MaxValue, maxIterations = maxGen)(
      (_, attr, msg) => if (msg < attr._2) (attr._1, msg) else attr,
      triplet =>
        if (triplet.srcAttr._2 != Int.MaxValue &&
            triplet.srcAttr._2 + 1 < triplet.dstAttr._2)
          Iterator((triplet.dstId, triplet.srcAttr._2 + 1))
        else Iterator.empty,
      math.min)
    res.vertices.values
      .filter { case (_, gen) => gen > 0 && gen != Int.MaxValue }
      .toDF("xref", "generation")
  }
}
