package graft

/** Smoke: every registered query runs at sf0.001 and (except two that are
  * legitimately empty at this tiny scale) returns rows. The value-level
  * check is the driver's DuckDB oracle at sf0.01 (tools/selfcheck.py). */
class QueriesSpec extends SparkSpec {

  // too selective to produce rows on ~1k-row inputs; non-empty at sf0.01+
  private val emptyOkAtTinyScale = Set("q15_theta_join", "q22_range_join")

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, SF).count()
      if (!emptyOkAtTinyScale(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("q54 bigrams survives documents with fewer than two tokens") {
    import spark.implicits._
    val tiny = Seq((0L, "solo", "en", "s", 4L), (1L, "two words here", "en", "s", 14L),
      (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("tinydocs").toString
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q54_bigrams")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(out == Map("two words" -> 1L, "words here" -> 1L))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has unique registration") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("oracle map only references registered queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("a failed bench query poisons the headline JSON") {
    val ok = Bench.renderJson(Seq("a" -> 1.5, "b" -> 2.0), "sf", Some(41.96))
    assert(ok.contains("\"value\":3.5") && ok.contains("\"failed\":0"), ok)
    assert(ok.contains("\"a\":15") && ok.contains("\"b\":20"), ok) // decisec
    assert(ok.contains("\"qunit\":\"decisec\""), ok)
    assert(ok.contains("\"gedcom_mb_per_s\":42.0"), ok)
    val broken = Bench.renderJson(Seq("a" -> 1.5, "b" -> -1.0), "sf")
    assert(broken.contains("\"value\":null") && broken.contains("\"failed\":1"), broken)
    assert(broken.contains("\"b\":-10"), broken) // per-query failure visible too
    assert(broken.contains("\"gedcom_mb_per_s\":null"), broken)
  }

  test("bench JSON carries loadavg and fits the driver's 2 KB stdout tail") {
    val ok = Bench.renderJson(Seq("a" -> 1.5), "sf")
    assert(ok.contains("\"loadavg\":"), ok)
    // BENCH_r07/r08 went "parsed":null because ~93 full-precision doubles
    // pushed the one line past the captured tail; the registry-sized
    // render must stay comfortably under it
    // model the worst leg-pass shape too (r15 directive 1): both legs at
    // three 3-digit-MB/s passes each — the widest the 3-pass rule allows
    val worstLegs = Seq(
      "gedcom_150m" -> Vector(131.9, 142.7, 155.3),
      "gedcom_1g" -> Vector(152.9, 166.4, 182.5))
    val full = Bench.renderJson(
      SparkEntry.all.map(q => q.name -> 12.345678901234567),
      "/root/testdata/sf0.1", Some(41.96), Some(139.7), worstLegs)
    // tenths since r17 (directive 2): the in-record 1.5x-rule check is
    // now exact to +-1%
    assert(full.contains("\"gedcom_150m_passes\":[131.9,142.7,155.3]"), full)
    assert(full.contains("\"gedcom_1g_passes\":[152.9,166.4,182.5]"), full)
    // r17 recalibration (168 queries + decimal leg passes): the COMPOUND
    // worst case — EVERY query 3-digit decisec (>= 10 s each, a 28+ min
    // suite that really runs ~3) AND both legs on the 3-pass rule — now
    // models ~11 bytes past the 1990 wall, so it exercises the designed
    // degradation: headline/failed/loadavg/leg fields all survive and the
    // per-query map becomes the explicit omission marker (full map
    // persists in target/bench.json). The r16 verdict's directive 6
    // blessed exactly this over another unit trim.
    assert(full.contains("\"queries\":{\"omitted\":") ||
      (full.length <= 1990 && full.contains("\"q01\":123")),
      s"compound worst case (${full.length} bytes) must degrade, not truncate")
    assert(full.contains("\"gedcom_1g_passes\":[152.9,166.4,182.5]") &&
      full.contains("\"value\":"), full)
    // the DEGRADED-HOST regime that actually occurs (r13/r16 artifacts:
    // every query 1-10 s) must still ship the REAL per-query map
    val degraded = Bench.renderJson(
      SparkEntry.all.map(q => q.name -> 9.9),
      "/root/testdata/sf0.1", Some(41.96), Some(139.7), worstLegs)
    assert(degraded.length <= 1990 && degraded.contains("\"q01\":99"),
      s"degraded-host case (${degraded.length} bytes) must still carry the real map")
    val overflow = Bench.renderJson(
      (1 to 400).map(i => f"q$i%03d_x" -> 12.3), "sf", Some(41.96),
      Some(139.7), worstLegs)
    assert(overflow.length < 600 && overflow.contains("\"queries\":{\"omitted\":400}")
      && overflow.contains("\"gedcom_1g_passes\":"),
      s"overflow must degrade to the omission marker: $overflow")
    // r11 directive, recalibrated r13 and again r14 (156 queries,
    // decisec era): the driver's tail is exactly 2000 bytes
    // (BENCH_r12.json "tail") and the final print lands last, so a
    // complete line survives up to 1999 bytes — the 1900 pin above
    // keeps ~100 of real safety even in the every-query-over-a-second
    // degraded-host regime the `full` case models. The growth reserve
    // below is one round of additions (~12 queries at ~12 bytes);
    // past ~190 queries the per-query map needs a structural change
    // (sidecar file), not another unit trim.
    val realistic = Bench.renderJson(
      SparkEntry.all.map(q => q.name -> 0.87),
      "/root/testdata/sf0.1", Some(41.96), Some(139.7), worstLegs)
    assert(realistic.length < 1900 - 12 * 12,
      s"realistic bench line ${realistic.length} bytes leaves no growth headroom")
    // the short bench keys (qNN prefix) must stay unique or the JSON map
    // silently drops measurements
    val shorts = SparkEntry.all.map(_.name.takeWhile(_ != '_'))
    assert(shorts.distinct.size == shorts.size,
      shorts.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }.mkString(","))
  }
}
