package graft.gedcom

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SaveMode
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
  * (`Gedcom Id:ID` first, properties sorted, `:LABEL` last), computed in a
  * single aggregation pass.
  *
  * Per-tag outputs are independent Spark jobs, submitted concurrently (the
  * scheduler interleaves their stages across the cluster) — wall-clock is
  * bounded by the largest tag, not the sum. Each output is a directory of
  * part files; `neo4j-import` receives one `--<kind>` group per part.
  */
object CsvSink {

  final case class Output(kind: String, rawTag: String, path: String)

  /** Column order for a node tag given the union of its prop keys. */
  def nodeColumns(keys: Set[String]): Seq[String] = {
    val special = Seq("Gedcom Id:ID").filter(keys)
    special ++ keys.diff(Set("Gedcom Id:ID", ":LABEL")).toSeq.sorted :+ ":LABEL"
  }

  /** Select list over the `props` map for one node tag: the ordered raw
    * columns, and — in typed-date mode — a parsed `K:date` + `K Qualifier`
    * pair directly after each date-grammar column K (the `:date` header
    * suffix is `neo4j-import`'s own typed-property convention, so the bulk
    * load ingests real dates with zero extra ceremony). Shared by the CSV
    * sink and [[GedcomGraph.nodesWide]] so the two surfaces cannot drift. */
  def typedNodeColumns(keys: Set[String],
      typedDates: Boolean): Seq[org.apache.spark.sql.Column] =
    nodeColumns(keys).flatMap { k =>
      val raw = col("props").getItem(k)
      if (typedDates && GedcomDates.isDateKey(k))
        Seq(raw.as(k),
          GedcomDates.typedDateCol(raw).as(s"$k:date"),
          GedcomDates.qualifierCol(raw).as(s"$k Qualifier"))
      else Seq(raw.as(k))
    }

  def write(graph: GedcomGraph.Graph, outDir: String,
      typedDates: Boolean = false): Seq[Output] = {
    // no extra cache layer: graph.flat is already pinned as localCheckpoint
    // blocks of raw UnsafeRows, and re-scanning those per tag job is cheaper
    // than materializing (and holding) a second columnar copy of the props
    // maps — dropping the nodes/edges caches cut ~5 s off the 150 MB bench
    val nodes = graph.nodes
    val edges = graph.edges

    // per-tag column union: free when the parse pass folded it (text fast
    // path); otherwise one distinct (tag, key) scan — driver-side size is
    // bounded by the tag-dictionary x flattened-key vocabulary, not by rows
    val keysByTag: Map[String, Set[String]] = graph.keysByTag.getOrElse(
      nodes
        .select(col("rawTag"), explode(map_keys(col("props"))).as("k"))
        .distinct().collect()
        .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getString(1)).toSet })

    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val nodeJobs = keysByTag.toSeq.sortBy(_._1).map { case (tag, keys) =>
        Future {
          val path = s"$outDir/nodes-$tag"
          nodes.filter(col("rawTag") === tag)
            .select(typedNodeColumns(keys, typedDates): _*)
            .write.mode(SaveMode.Overwrite).option("header", true).csv(path)
          Seq(Output("nodes", tag, path))
        }
      }
      // relationships share one fixed schema, so ALL edge tags are one
      // dynamic-partitioned job (one scan total) instead of a scan+filter
      // job per tag; the per-tag dirs come out as relationships/rawTag=<T>
      val edgeJob = Future {
        val base = s"$outDir/relationships"
        edges.select(col("rawTag"), col("src").as(":START_ID"),
            col("dst").as(":END_ID"), col("relType").as(":TYPE"))
          .write.partitionBy("rawTag").mode(SaveMode.Overwrite)
          .option("header", true).csv(base)
        // enumerate the per-tag dirs through the Hadoop FS of the output
        // path — java.io.File would silently return nothing for any
        // non-plain-local URI and the import command would drop all edges
        val basePath = new org.apache.hadoop.fs.Path(base)
        val fs = basePath.getFileSystem(
          edges.sparkSession.sparkContext.hadoopConfiguration)
        fs.listStatus(basePath).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("rawTag="))
          .map { st =>
            val p = st.getPath
            // keep plain local paths plain (the bulk-import command and the
            // part-file scan are local-process consumers)
            val pathStr =
              if (p.toUri.getScheme == "file") p.toUri.getPath else p.toString
            Output("relationships", p.getName.stripPrefix("rawTag="), pathStr)
          }
          .sortBy(_.rawTag)
      }
      Await.result(Future.sequence(nodeJobs :+ edgeJob), Duration.Inf).flatten
    } finally pool.shutdown()
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
        .map(_.filter { f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".csv") &&
            hasDataRows(f)
        }.map(_.getPath).sorted)
        .getOrElse(Array.empty[String])
        .flatMap(p => Seq(s"--${o.kind}", p))
    }

  /** Remove the scratch CSVs after a successful publish — the reference's
    * `csvs.cleanup()` (lib/csv_writer.js:27-29, invoked from
    * index.js:105-108 only on the success path; failures keep the CSVs
    * for inspection/retry, and so do we). Unlike the reference's
    * `fs.remove(scratch_dir)` (which owns a dedicated mkdirp'd dir), the
    * `-t` dir here is user-supplied, so only what THIS run wrote is
    * deleted: the recorded output dirs, Spark's job markers beside them,
    * and the scratch dir itself only once it is empty — pre-existing user
    * files survive. */
  def cleanup(outputs: Seq[Output], outDir: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete(): Unit
    }
    outputs.foreach(o => rec(new java.io.File(o.path)))
    // the partitioned relationships job leaves _SUCCESS/.crc markers in its
    // base dir (the rawTag= children are the recorded outputs); a dir
    // holding ONLY such markers is ours and collapses
    def sweepMarkers(dir: java.io.File): Unit = {
      Option(dir.listFiles()).foreach(_.foreach { f =>
        if (!f.isDirectory &&
            (f.getName == "_SUCCESS" || f.getName.endsWith(".crc")))
          f.delete(): Unit
      })
      dir.delete(): Unit // succeeds only when nothing user-placed remains
    }
    sweepMarkers(new java.io.File(outDir, "relationships"))
    new java.io.File(outDir).delete(): Unit // succeeds only when empty
  }

  /** true when the csv part has at least one row beyond the header —
    * empty partitions produce header-only parts that would just clutter
    * the import command. */
  private def hasDataRows(f: java.io.File): Boolean = {
    val r = new java.io.BufferedReader(new java.io.FileReader(f))
    try { r.readLine(); r.readLine() != null } finally r.close()
  }
}
