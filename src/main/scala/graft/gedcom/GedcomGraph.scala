package graft.gedcom

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-level wiring of parse -> assemble -> flatten into the property
  * graph (nodes + edges + diagnostics), the Spark analog of the reference's
  * streaming CsvWriter stage (SURVEY §3.2).
  *
  * One shuffle total (groupByKey on recordNo); per-record work is bounded
  * by record size, so the stage scales linearly with records across any
  * number of executors.
  */
object GedcomGraph {

  final case class Graph(
      flat: Dataset[RecordAssembler.FlatRecord],
      nodes: DataFrame,   // recordNo, rawTag, label, props(map)
      edges: DataFrame,   // src, dst, relType, rawTag
      skipped: DataFrame, // recordNo, rawTag
      unusedTags: DataFrame,      // tag (distinct)
      missingTemples: DataFrame)  // code (distinct)

  def fromLines(lines: Dataset[GedLine]): Graph = {
    val spark = lines.sparkSession
    import spark.implicits._

    val flat = lines
      .groupByKey(_.recordNo)
      .mapGroups { (recNo, it) =>
        RecordAssembler.flatten(recNo,
          RecordAssembler.assemble(it.toSeq.sortBy(_.lineNo).iterator))
      }
      .cache()

    val nodes = flat
      .filter(f => !f.skipped && f.props.nonEmpty)
      .toDF()
      .select(col("recordNo"), col("rawTag"), col("label"), col("props"))

    val edges = flat.flatMap(_.edges).toDF()

    val skipped = flat.filter(_.skipped).toDF().select(col("recordNo"), col("rawTag"))

    val unusedTags = flat.flatMap(_.unusedTags).toDF("tag").distinct()
    val missingTemples = flat.flatMap(_.missingTemples).toDF("code").distinct()

    Graph(flat, nodes, edges, skipped, unusedTags, missingTemples)
  }

  def fromFile(spark: SparkSession, path: String): Graph =
    fromLines(GedcomParser.parse(spark, path))
}
