package graft.gedcom

import java.nio.file.{Files, Path, Paths}

import scala.sys.process.{Process, ProcessLogger}

/** External-process orchestration for the bulk-load stage — the Spark-side
  * analog of the reference's Neo4J class (lib/neo4j.js): spawn
  * `neo4j-import`, manage the `neo4j` service, and run the
  * import -> stop -> swap -> start saga with rollback on a failed start
  * (lib/neo4j.js:78-110). Pure driver-side code; the Spark job's CSVs are
  * the interchange, exactly as in the reference.
  *
  * @param binDir  directory containing the `neo4j` / `neo4j-import` binaries
  * @param dataDir the live database directory to replace
  * @param log     line-oriented sink for child stdout (debug) and stderr
  *                (warn) — the reference's LogStreamer (lib/log_streamer.js)
  */
final class Neo4jAdmin(
    binDir: String,
    dataDir: String,
    log: (String, String) => Unit = (_, _) => ()) {

  private def logger(stream: String) =
    ProcessLogger(out => log(stream, out), err => log(s"$stream/err", err))

  /** Run a binary, streaming output; returns the exit code. */
  def run(cmd: Seq[String]): Int =
    Process(cmd).run(logger(cmd.head)).exitValue()

  def start(): Int = run(Seq(s"$binDir/neo4j", "start"))
  def stop(): Int = run(Seq(s"$binDir/neo4j", "stop"))

  /** Bulk import into a scratch dir next to the live one. */
  def importBulk(importArgs: Seq[String]): (Path, Int) = {
    val tmp = Paths.get(dataDir + ".tmp")
    if (Files.exists(tmp)) deleteRecursively(tmp)
    Files.createDirectories(tmp)
    val code = run(Seq(s"$binDir/neo4j-import", "--into", tmp.toString) ++ importArgs)
    (tmp, code)
  }

  /** The full saga: import to scratch, stop the service, atomically swap
    * the data dir (previous kept as .bak), start; a failed start rolls the
    * swap back and restarts on the old data. Returns true on full success. */
  def importAndPublish(importArgs: Seq[String]): Boolean = {
    val (tmp, code) = importBulk(importArgs)
    if (code != 0) { deleteRecursively(tmp); return false }
    if (stop() != 0) { deleteRecursively(tmp); return false }
    val ok = AtomicPublish.publish(Paths.get(dataDir), tmp)(start() == 0)
    if (!ok) start() // reference restores then aborts; we also restart on old data
    ok
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
