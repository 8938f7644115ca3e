package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions

import graft.gedcom.{Main, Neo4jAdmin}

/** Saga/orchestration spec against stub binaries — asserts the reference's
  * import -> stop -> swap -> start order, log streaming, and rollback on a
  * failed start (lib/neo4j.js:78-110 semantics). */
class Neo4jAdminSpec extends SparkSpec {

  private def writeBin(dir: Path, name: String, script: String): Unit = {
    val p = dir.resolve(name)
    Files.writeString(p, s"#!/bin/bash\n$script")
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
  }

  private def setup(startExit: String): (Path, Path, Path) = {
    val base = Files.createTempDirectory("neo")
    val bin = Files.createDirectories(base.resolve("bin"))
    val data = Files.createDirectories(base.resolve("data"))
    Files.writeString(data.resolve("marker"), "old")
    val logFile = base.resolve("calls.log")
    writeBin(bin, "neo4j-import",
      s"""echo "import $$@" >> $logFile; echo "imported" > "$$2/marker"; echo done-import""")
    writeBin(bin, "neo4j",
      s"""echo "neo4j $$1" >> $logFile
         |if [ "$$1" = start ]; then exit $startExit; fi
         |exit 0""".stripMargin)
    (bin, data, logFile)
  }

  test("successful saga: import, stop, swap with backup, start") {
    val (bin, data, logFile) = setup(startExit = "0")
    val lines = collection.mutable.ArrayBuffer.empty[String]
    val admin = new Neo4jAdmin(bin.toString, data.toString, (s, l) => lines += s"$s:$l")
    assert(admin.importAndPublish(Seq("--nodes", "x.csv")))
    val calls = Files.readAllLines(logFile)
    assert(calls.get(0).startsWith("import --into") && calls.get(0).endsWith("--nodes x.csv"))
    assert(calls.get(1) == "neo4j stop" && calls.get(2) == "neo4j start")
    assert(Files.readString(data.resolve("marker")) == "imported\n")
    assert(Files.readString(data.resolveSibling("data.bak").resolve("marker")) == "old")
    assert(lines.exists(_.contains("done-import"))) // stdout streamed to the log sink
  }

  test("failed start rolls back to the old data dir and restarts") {
    val (bin, data, logFile) = setup(startExit = "1")
    val admin = new Neo4jAdmin(bin.toString, data.toString)
    assert(!admin.importAndPublish(Seq("--nodes", "x.csv")))
    assert(Files.readString(data.resolve("marker")) == "old") // restored
    val calls = Files.readAllLines(logFile)
    // import, stop, failed start, recovery start
    assert(calls.size() == 4 && calls.get(3) == "neo4j start")
  }

  test("CLI -d drives the whole saga end-to-end and cleans the scratch CSVs") {
    // the reference user's one command (index.js:91-108): parse -> CSVs ->
    // import -> stop -> swap -> start -> csvs.cleanup(). Everything through
    // Main.run, against stub binaries.
    val (bin, data, logFile) = setup(startExit = "0")
    val tmpDir = Files.createTempDirectory("ged-cli-csvs").toString
    val opts = Main.Opts(
      src = Some(getClass.getResource("/m1.ged").getPath),
      dest = Some(data.toString), binDir = bin.toString,
      tmpDir = tmpDir, quiet = true)
    assert(Main.run(opts, spark) == 0)
    val calls = Files.readAllLines(logFile)
    assert(calls.size() == 3, calls.toString)
    assert(calls.get(0).startsWith("import --into"), calls.get(0))
    assert(calls.get(0).contains("--nodes"), "import must receive the CSV args")
    assert(calls.get(1) == "neo4j stop" && calls.get(2) == "neo4j start")
    assert(Files.readString(data.resolve("marker")) == "imported\n")
    assert(Files.readString(data.resolveSibling("data.bak").resolve("marker")) == "old")
    assert(!Files.exists(Paths.get(tmpDir)),
      "scratch CSVs must be removed after a successful publish")
  }

  test("CLI arg parsing covers the full reference surface plus --typed-dates") {
    val o = Main.parseArgs(List("-s", "in.ged", "-d", "/data", "-b", "/bin",
      "-t", "/tmp/x", "-q", "--typed-dates"))
    assert(o == Main.Opts(src = Some("in.ged"), dest = Some("/data"),
      binDir = "/bin", tmpDir = "/tmp/x", quiet = true, typedDates = true))
    assert(!Main.parseArgs(Nil).typedDates) // raw parity is the default
    intercept[IllegalArgumentException](Main.parseArgs(List("--nope")))
  }

  test("CLI --typed-dates threads through to the written node CSVs") {
    val tmpDir = Files.createTempDirectory("ged-cli-typed").toString
    val opts = Main.Opts(
      src = Some(getClass.getResource("/m2.ged").getPath),
      tmpDir = tmpDir, quiet = true, typedDates = true)
    assert(Main.run(opts, spark) == 0) // no -d: CSVs retained
    val header = Files.readAllLines(
      Files.list(Paths.get(tmpDir, "nodes-INDI"))
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".csv"))
        .findFirst().get()).get(0)
    assert(header.contains("Birth Date:date") && header.contains("Birth Date Qualifier"),
      s"typed columns missing from CSV header: $header")
  }

  test("cleanup deletes only the run's outputs — pre-existing files survive") {
    // the -t dir is user-supplied (unlike the reference's dedicated mkdirp'd
    // scratch dir), so cleanup must not take unrelated files with it
    val (bin, data, _) = setup(startExit = "0")
    val tmpDir = Files.createTempDirectory("ged-cli-csvs")
    val keepMe = tmpDir.resolve("precious.txt")
    Files.writeString(keepMe, "user data")
    val opts = Main.Opts(
      src = Some(getClass.getResource("/m1.ged").getPath),
      dest = Some(data.toString), binDir = bin.toString,
      tmpDir = tmpDir.toString, quiet = true)
    assert(Main.run(opts, spark) == 0)
    assert(Files.readString(keepMe) == "user data",
      "pre-existing user file must survive cleanup")
    val leftovers = tmpDir.toFile.listFiles().map(_.getName).toSet
    assert(leftovers == Set("precious.txt"),
      s"only the user's file may remain, got $leftovers")
  }

  test("CLI -d failure retains the scratch CSVs and reports nonzero") {
    val (bin, data, _) = setup(startExit = "1") // start fails => rollback
    val tmpDir = Files.createTempDirectory("ged-cli-csvs").toString
    val opts = Main.Opts(
      src = Some(getClass.getResource("/m1.ged").getPath),
      dest = Some(data.toString), binDir = bin.toString,
      tmpDir = tmpDir, quiet = true)
    assert(Main.run(opts, spark) == 1)
    assert(Files.readString(data.resolve("marker")) == "old", "rolled back")
    assert(Files.exists(Paths.get(tmpDir)) &&
      Option(Paths.get(tmpDir).toFile.listFiles()).exists(_.nonEmpty),
      "scratch CSVs retained for inspection/retry on failure")
  }

  test("failed import aborts before touching the live dir") {
    val (bin, data, _) = setup(startExit = "0")
    writeBin(bin, "neo4j-import", "exit 3")
    val admin = new Neo4jAdmin(bin.toString, data.toString)
    assert(!admin.importAndPublish(Nil))
    assert(Files.readString(data.resolve("marker")) == "old")
    assert(!Files.exists(data.resolveSibling("data.tmp")))
  }
}
