package graft.gedcom

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Driver-gate visibility for the GEDCOM pipeline (the reference's core
  * capability, index.js:64-125: parse -> flatten -> property graph): one
  * registered query that runs the full pipeline over the checked-in fixture
  * and emits a deterministic (section, name, n) summary of every output
  * family — node rows per tag, flattened property-key histogram, edges per
  * relType, skipped records, unused tags, missing temple codes.
  *
  * The oracle is the frozen expected summary as SQL literals: the fixture
  * is immutable, so the expected rows are a reviewed constant (each row is
  * hand-checked against lib/csv_writer.js semantics — see GedcomSpec, which
  * asserts the same facts record-by-record).
  */
object GedcomQueries {

  /** Checked-in fixture (same one GedcomSpec pins record-by-record),
    * shipped on the main classpath so the query works from any launch
    * directory or packaged jar: the resource is materialized once per JVM
    * to a temp file for `sc.textFile`. */
  lazy val FixturePath: String = {
    val in = getClass.getResourceAsStream("/m1.ged")
    require(in != null, "fixture /m1.ged missing from classpath")
    val tmp = java.nio.file.Files.createTempFile("gedcom-fixture", ".ged")
    try java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q63_gedcom_pipeline",
      (s, _) => {
        val g = GedcomGraph.fromFile(s, FixturePath)
        val nodes = g.nodes.groupBy(col("rawTag"))
          .agg(count(lit(1)).as("n"))
          .select(lit("node").as("section"), col("rawTag").as("name"), col("n"))
        val keys = g.nodes
          .select(explode(map_keys(col("props"))).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
          .select(lit("node_key").as("section"), col("k").as("name"), col("n"))
        val edges = g.edges.groupBy(col("relType"))
          .agg(count(lit(1)).as("n"))
          .select(lit("edge").as("section"), col("relType").as("name"), col("n"))
        val skipped = g.skipped.groupBy(col("rawTag"))
          .agg(count(lit(1)).as("n"))
          .select(lit("skipped").as("section"), col("rawTag").as("name"), col("n"))
        val unused = g.unusedTags
          .select(lit("unused_tag").as("section"), col("tag").as("name"), lit(1L).as("n"))
        val missing = g.missingTemples
          .select(lit("missing_temple").as("section"), col("code").as("name"), lit(1L).as("n"))
        nodes.unionByName(keys).unionByName(edges).unionByName(skipped)
          .unionByName(unused).unionByName(missing)
          .orderBy(col("section"), col("name"))
      },
      Some(GedcomOracle.SQL),
      "full GEDCOM parse->flatten->graph pipeline summary over the checked-in fixture")
  )
}
