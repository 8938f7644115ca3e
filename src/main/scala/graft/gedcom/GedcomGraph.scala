package graft.gedcom

import org.apache.spark.rdd.RDD
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
      flat: DataFrame,    // one row per record, cached; everything below derives from it
      nodes: DataFrame,   // recordNo, rawTag, label, props(map)
      edges: DataFrame,   // src, dst, relType, rawTag
      skipped: DataFrame, // recordNo, rawTag
      unusedTags: DataFrame,      // tag (distinct)
      missingTemples: DataFrame)  // code (distinct)

  /** General path for pre-parsed line Datasets: one hash shuffle on
    * recordNo + one Tungsten sort per partition, then streaming assembly
    * over contiguous ordered groups. */
  def fromLines(lines: Dataset[GedLine]): Graph = {
    val spark = lines.sparkSession
    import spark.implicits._
    val flat = lines
      .repartition(col("recordNo"))
      .sortWithinPartitions(col("recordNo"), col("lineNo"))
      .mapPartitions { it =>
        new Iterator[RecordAssembler.FlatRecord] {
          private val buf = it.buffered
          override def hasNext: Boolean = buf.hasNext
          override def next(): RecordAssembler.FlatRecord = {
            val recNo = buf.head.recordNo
            val group = new scala.collection.mutable.ArrayBuffer[GedLine]()
            while (buf.hasNext && buf.head.recordNo == recNo) group += buf.next()
            RecordAssembler.flatten(recNo, RecordAssembler.assemble(group.iterator))
          }
        }
      }
    fromFlat(flat.toDF())
  }

  /** Fast path for text input — zero shuffle.
    *
    * GEDCOM records are contiguous runs of lines, so grouping them never
    * needs a cluster-wide shuffle: each input split assembles the records
    * it fully contains in one local pass, and only the split-boundary
    * fragments (the lines before a split's first level-0 line and from its
    * last level-0 line to the end — at most one record each) travel to the
    * driver to be stitched. Two parallel reads of the input replace the
    * parse->persist->count->assign->shuffle->sort chain; at 100 TB that
    * trades a full-data shuffle for one extra scan, which is the winning
    * trade on any storage that can stream faster than the network can
    * re-shard.
    */
  def fromTextRdd(spark: SparkSession, raw: RDD[String]): Graph = {
    import spark.implicits._

    // pass A (light): per-split boundary fragments
    final case class Bound(pi: Int, prefix: Seq[GedLine], suffix: Seq[GedLine], hasLevel0: Boolean)
    val bounds = raw.mapPartitionsWithIndex { (pi, it) =>
      val prefix = scala.collection.mutable.ArrayBuffer.empty[GedLine]
      val suffix = scala.collection.mutable.ArrayBuffer.empty[GedLine]
      var seen0 = false
      var j = 0L
      it.foreach { s =>
        GedcomParser.parseLine(s, (pi.toLong << 40) | j).foreach { l =>
          j += 1
          if (l.level == 0) { seen0 = true; suffix.clear() }
          if (!seen0) prefix += l else suffix += l
        }
      }
      Iterator(Bound(pi, prefix.toSeq, suffix.toSeq, seen0))
    }.collect().sortBy(_.pi)

    // driver-side stitch of boundary records (at most one per split edge)
    val stitched = scala.collection.mutable.ArrayBuffer.empty[Seq[GedLine]]
    var current = scala.collection.mutable.ArrayBuffer.empty[GedLine]
    bounds.foreach { b =>
      current ++= b.prefix
      if (b.hasLevel0) {
        if (current.nonEmpty) stitched += current.toSeq
        current = scala.collection.mutable.ArrayBuffer(b.suffix: _*)
      }
    }
    if (current.nonEmpty) stitched += current.toSeq
    val boundaryFlat = stitched.toSeq
      .filter(_.head.level == 0) // a non-record head is pre-file junk
      .zipWithIndex.map { case (g, i) =>
        RecordAssembler.flatten(-(i + 1L), RecordAssembler.assemble(g.iterator))
      }

    // pass B (heavy, fully parallel): records fully contained in each split
    val contained = raw.mapPartitionsWithIndex { (pi, it) =>
      new Iterator[RecordAssembler.FlatRecord] {
        private var j = 0L
        private val lines = it.flatMap { s =>
          val l = GedcomParser.parseLine(s, (pi.toLong << 40) | j); j += 1; l
        }.buffered
        // drop this split's prefix fragment (assembled via pass A)
        while (lines.hasNext && lines.head.level != 0) lines.next()
        private var group = scala.collection.mutable.ArrayBuffer.empty[GedLine]
        private var pending: Option[RecordAssembler.FlatRecord] = None
        private var recIdx = 0L
        private def advance(): Unit = {
          while (pending.isEmpty && lines.hasNext) {
            val l = lines.next()
            if (l.level == 0 && group.nonEmpty) {
              recIdx += 1
              pending = Some(RecordAssembler.flatten((pi.toLong << 40) | recIdx,
                RecordAssembler.assemble(group.iterator)))
              group = scala.collection.mutable.ArrayBuffer(l)
            } else group += l
          }
          // the trailing group is this split's suffix fragment — never
          // emitted here (pass A owns it)
        }
        override def hasNext: Boolean = { advance(); pending.nonEmpty }
        override def next(): RecordAssembler.FlatRecord = {
          advance(); val r = pending.get; pending = None; r
        }
      }
    }

    val flat = spark.createDataset(contained).toDF()
      .unionByName(spark.createDataset(boundaryFlat).toDF())
    fromFlat(flat)
  }

  /** Derived outputs — pure Column algebra over the cached row frame, so no
    * pass deserializes the per-record maps back into JVM objects (a
    * typed-lambda version spent most of its runtime doing exactly that). */
  private def fromFlat(flatIn: DataFrame): Graph = {
    val flat = flatIn.cache()

    val nodes = flat
      .filter(!col("skipped") && size(map_keys(col("props"))) > 0)
      .select(col("recordNo"), col("rawTag"), col("label"), col("props"))

    val edges = flat
      .select(explode(col("edges")).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.relType"), col("e.rawTag"))

    val skipped = flat.filter(col("skipped")).select(col("recordNo"), col("rawTag"))

    val unusedTags = flat.select(explode(col("unusedTags")).as("tag")).distinct()
    val missingTemples = flat.select(explode(col("missingTemples")).as("code")).distinct()

    Graph(flat, nodes, edges, skipped, unusedTags, missingTemples)
  }

  def fromFile(spark: SparkSession, path: String): Graph = {
    val minParts = spark.sparkContext.defaultParallelism * 2
    fromTextRdd(spark, spark.sparkContext.textFile(path, minParts))
  }

  /** Wide, directly queryable table for one record type: the union of the
    * tag's flattened property keys as real columns (same layout as the
    * CSV sink's output, but as a DataFrame — callers can filter/join/agg
    * the property graph without going through Neo4j at all). */
  def nodesWide(graph: Graph, rawTag: String): DataFrame = {
    val forTag = graph.nodes.filter(col("rawTag") === rawTag)
    val keys = forTag
      .select(explode(map_keys(col("props"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSet
    forTag.select(
      CsvSink.nodeColumns(keys).map(k => col("props").getItem(k).as(k)): _*)
  }
}
