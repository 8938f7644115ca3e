package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: exactly (sfDir, outDir). Extra args are a local
    // iteration aid: dump only the named queries.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // cached-plan AQE: see the Bench session builder for the measurement
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        spark.catalog.clearCache() // no cross-query cache residue
        graft.Caches.release() // and no lease-registry reference growth
      }
    }
    // oracle-support tables (trained codebooks): always dumped — cheap
    // (bounded by codebook size, never the corpus) and the codebook
    // oracles need them even in a filtered local run. They go to a
    // SIBLING directory of outDir, NOT inside it: the driver's checker
    // enumerates outDir's subdirectories as query results, and the aux
    // tables' array-typed centroid columns crash its pandas row sort
    // ("unhashable type: numpy.ndarray" — three permanent error rows in
    // CORRECTNESS_r12). Outside the enumerated tree they are exactly what
    // they are: oracle inputs, reached via the absolute read_parquet
    // paths substituted below. Falls back to outDir/_aux (underscore
    // prefix, skipped by parquet-convention listers) if the parent is
    // unwritable — losing the aux dump entirely would fail the three
    // codebook oracles, which is strictly worse than an extra row.
    val auxDirFile = {
      val sib = new java.io.File(new java.io.File(outDir).getAbsolutePath + "_aux")
      if (sib.isDirectory || sib.mkdirs()) sib
      else { val sub = new java.io.File(outDir, "_aux"); sub.mkdirs(); sub }
    }
    SparkEntry.auxTables.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(auxDirFile, name).getPath)
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux $name failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // absolute aux dir into the codebook oracles: the driver may run
    // DuckDB from any cwd, so the read_parquet paths must not be relative
    val auxDir = auxDirFile.getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(functions.Similarity.AUXDIR, auxDir))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
