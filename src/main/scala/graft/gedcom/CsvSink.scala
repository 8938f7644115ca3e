package graft.gedcom

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned multiplexing CSV sink (reference R15, lib/csv_writer.js:85-113):
  * one output per (kind, raw-tag), `nodes-<TAG>` with the union of that
  * tag's flattened columns, `relationships-<TAG>` with the fixed
  * `:START_ID,:END_ID,:TYPE` triple. Headers included, like fast-csv's
  * `{'headers': true}`.
  *
  * Documented fix over the reference (SURVEY §4.3.1): fast-csv derives the
  * header from early rows and silently misaligns later rows with novel
  * columns; here each tag's schema is the union of all its rows' keys
  * (`Gedcom Id:ID` first, properties sorted, `:LABEL` last).
  *
  * Each output is a directory of part files (parallel write; the analog of
  * the reference's single file) — `neo4j-import` accepts the
  * `header,part,part` form the import-args builder produces.
  */
object CsvSink {

  final case class Output(kind: String, rawTag: String, path: String)

  /** Column order for a node tag given the union of its prop keys. */
  def nodeColumns(keys: Set[String]): Seq[String] = {
    val special = Seq("Gedcom Id:ID").filter(keys)
    special ++ keys.diff(Set("Gedcom Id:ID", ":LABEL")).toSeq.sorted :+ ":LABEL"
  }

  def write(graph: GedcomGraph.Graph, outDir: String): Seq[Output] = {
    val nodes = graph.nodes.cache()
    val edges = graph.edges.cache()

    val nodeTags = nodes.select("rawTag").distinct().collect().map(_.getString(0)).sorted
    val nodeOuts = nodeTags.map { tag =>
      val forTag = nodes.filter(col("rawTag") === tag)
      // union of this tag's keys — a small driver-side set (bounded by the
      // flattened-column vocabulary, not by data volume)
      val keys = forTag
        .select(explode(map_keys(col("props"))).as("k"))
        .distinct().collect().map(_.getString(0)).toSet
      val cols = nodeColumns(keys)
      val path = s"$outDir/nodes-$tag"
      forTag
        .select(cols.map(k => col("props").getItem(k).as(k)): _*)
        .write.mode(SaveMode.Overwrite).option("header", true).csv(path)
      Output("nodes", tag, path)
    }

    val edgeTags = edges.select("rawTag").distinct().collect().map(_.getString(0)).sorted
    val edgeOuts = edgeTags.map { tag =>
      val path = s"$outDir/relationships-$tag"
      edges.filter(col("rawTag") === tag)
        .select(col("src").as(":START_ID"), col("dst").as(":END_ID"),
          col("relType").as(":TYPE"))
        .write.mode(SaveMode.Overwrite).option("header", true).csv(path)
      Output("relationships", tag, path)
    }

    (nodeOuts ++ edgeOuts).toSeq
  }

  /** `neo4j-admin import`-style argument list from the written outputs
    * (reference index.js:81-84 builds `--<kind> <path>` pairs). Every part
    * file carries its own header row, so each becomes its own `--<kind>`
    * group — comma-joining parts would feed the later parts' header rows
    * in as data. */
  def importArgs(outputs: Seq[Output]): Seq[String] =
    outputs.flatMap { o =>
      val dir = new java.io.File(o.path)
      Option(dir.listFiles())
        .map(_.filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
          .map(_.getPath).sorted)
        .getOrElse(Array.empty[String])
        .flatMap(p => Seq(s"--${o.kind}", p))
    }
}
