package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Web
import graft.functions.expressions.{GunzipBytes, GzipCompress}

/** JSON-lines container ingestion — the row-delimited sibling of the
  * q171 WARC walk and the de-facto interchange format of LLM training
  * corpora (Dolma, RedPajama, FineWeb all ship JSONL; public). The
  * engine-relevant semantics: line-by-line schema projection with
  * PER-LINE malformed-record accounting (one broken line must cost
  * one typed error row, never the container), blank-line tolerance,
  * positional line numbers for provenance, NESTED metadata objects and
  * array fields (the Dolma/FineWeb record shape — r17 shipped a flat
  * four-field projection; real corpora carry a metadata struct and tag
  * lists), and GZIP-compressed containers (`.jsonl.gz` is how these
  * corpora actually ship) inflated transparently ahead of the walk —
  * a corrupt stream degrades to one typed malformed row for the
  * container, never a job failure.
  *
  * 100 TB shape: one exchange to BUILD the fixture containers (the
  * groupBy — a real pipeline reads files and has zero); the parse
  * under test is gunzip -> split -> generate -> from_json, a pure map.
  *
  * Fixture/oracle split (the q171 convention): the container text is
  * assembled by Spark's own to_json (round-trip-exact by
  * construction) and half the containers gzip through the fixture
  * compressor, while the oracle never parses JSON or sees compressed
  * bytes — it rebuilds each line's expected classification and field
  * values generatively from the documents columns, so Spark's inflate,
  * split, line accounting and nested from_json projection are what's
  * under test (compression transparency = identical output rows for
  * the compressed and plain halves, under ONE oracle).
  */
object Jsonl {
  import Tables._

  /** Record schema of one JSONL line — nested metadata + a tag array
    * beside the flat fields. */
  private val LINE_SCHEMA = "id bigint, url string, lang string, text string, " +
    "metadata struct<origin:string,score:bigint>, tags array<string>"

  /** A fixed malformed line planted after every doc_id % 5 == 3 record
    * (truncated JSON — the classic mid-write artifact). The bad token
    * sits ON the id value so even PERMISSIVE partial parsing can never
    * surface a phantom id (spec-pinned). */
  private[graft] val MALFORMED = """{"id": broken, "url"""

  /** Containers over the documents table: gid = doc_id // 4; each
    * container = an optional leading blank line (gid % 3 == 0 — blank
    * tolerance under test), then per doc in doc_id order one to_json
    * record line (flat fields + metadata{origin, score} + tags),
    * followed by the planted malformed line after doc_id % 5 == 3
    * records. */
  private[graft] def syntheticContainers(docs: DataFrame): DataFrame = {
    val tags = when(col("doc_id") % 2 === 0,
      array(concat(lit("b"), (col("doc_id") % 7).cast("string")), col("lang")))
      .otherwise(array(col("lang")))
    val line = to_json(struct(
      col("doc_id").as("id"),
      Web.rawUrl(col("doc_id"), col("source")).as("url"),
      col("lang"), col("text"),
      struct(col("source").as("origin"),
        (col("doc_id") % 97).cast("long").as("score")).as("metadata"),
      tags.as("tags")))
    val withErr = concat(line,
      when(col("doc_id") % 5 === 3, lit("\n" + MALFORMED)).otherwise(lit("")))
    docs
      .select((col("doc_id") / 4).cast("long").as("gid"),
        col("doc_id"), withErr.as("rec"))
      .groupBy(col("gid"))
      .agg(concat(
        when(col("gid") % 3 === 0, lit("\n")).otherwise(lit("")),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "\n")).as("container"))
  }

  /** The binary fixture: every EVEN-gid container gzip-compressed (the
    * `.jsonl.gz` shipping shape), odd gids plain UTF-8 — so one oracle
    * pins that compression is invisible to the parsed rows. */
  private[graft] def syntheticBinaryContainers(docs: DataFrame): DataFrame =
    syntheticContainers(docs)
      .select(col("gid"),
        when(col("gid") % 2 === 0,
          GraftSqlBridge.column(GzipCompress(
            GraftSqlBridge.expression(encode(col("container"), "UTF-8")))))
          .otherwise(encode(col("container"), "UTF-8")).as("container"))

  /** Parsed line rows of a JSONL container column: (keys..., line_no,
    * kind record|blank|malformed, id, lang, host, n_text_chars, origin,
    * score, n_tags, tag0). posexplode_OUTER for the q168 reason (the
    * inferred size()>0 filter would re-inline the split). */
  def jsonlRecordsRel(containers: DataFrame, container: Column,
      keys: Seq[String]): DataFrame = {
    val kt = keys.map(col)
    containers
      .select(kt :+ split(container, "\n").as("__lines"): _*)
      .select(kt :+ posexplode_outer(col("__lines")).as(Seq("line_no", "__l")): _*)
      .select(kt :+ col("line_no").cast("long").as("line_no") :+
        col("__l") :+
        from_json(col("__l"),
          org.apache.spark.sql.types.StructType.fromDDL(LINE_SCHEMA))
          .as("__r"): _*)
      .select(kt :+ col("line_no") :+ col("__r") :+
        when(trim(col("__l")) === "", lit("blank"))
          .when(col("__r").isNotNull && col("__r.id").isNotNull, lit("record"))
          .otherwise(lit("malformed")).as("kind"): _*)
      // fields surface ONLY for record rows: a salvageable fragment of
      // a malformed line (a valid object missing the id, say) must not
      // leak partial values beside a 'malformed' verdict (spec-pinned)
      .select(kt :+ col("line_no") :+ col("kind") :+
        when(col("kind") === "record", col("__r.id")).as("id") :+
        when(col("kind") === "record", col("__r.lang")).as("lang") :+
        when(col("kind") === "record", Web.pageHost(col("__r.url")))
          .as("host") :+
        when(col("kind") === "record", length(col("__r.text")).cast("long"))
          .as("n_text_chars") :+
        when(col("kind") === "record", col("__r.metadata.origin"))
          .as("origin") :+
        when(col("kind") === "record", col("__r.metadata.score"))
          .as("score") :+
        when(col("kind") === "record", size(col("__r.tags")).cast("long"))
          .as("n_tags") :+
        when(col("kind") === "record", element_at(col("__r.tags"), 1))
          .as("tag0"): _*)
  }

  /** The BINARY container walk: transparent gunzip (multi-member
    * tolerated, non-gzip input passes through) → UTF-8 decode → the
    * string walk. A corrupt gzip stream nulls the container, which
    * surfaces as ONE malformed row (null line_no) — typed accounting,
    * never a failed job. */
  def jsonlBinaryRecordsRel(containers: DataFrame, container: Column,
      keys: Seq[String]): DataFrame = {
    val kt = keys.map(col)
    val inflated = decode(GraftSqlBridge.column(GunzipBytes(
      GraftSqlBridge.expression(container))), "UTF-8")
    jsonlRecordsRel(
      containers.select(kt :+ inflated.as("__container"): _*),
      col("__container"), keys)
  }

  /** Oracle: rebuild the per-container ordered line list generatively —
    * a blank row first for gid % 3 == 0, then per doc a record row and
    * (doc_id % 5 == 3) a malformed row; line_no by row_number within
    * gid over that order; field values straight from documents
    * (metadata.origin = source, score = doc_id % 97, tags = [bucket,
    * lang] on even doc_ids else [lang]). Compression never appears:
    * the compressed and plain container halves must produce identical
    * rows. */
  private val ORACLE = """
    WITH d AS (
      SELECT doc_id, doc_id // 4 AS gid, lang, source,
             length(text)::BIGINT AS n_text_chars,
             regexp_replace(lower(
               CASE WHEN doc_id % 3 = 0 THEN 'www.' || source || '.com'
                    ELSE source || '.com' END), '^www\.', '') AS host
      FROM documents),
    rows_ AS (
      SELECT gid, -1::BIGINT AS ord1, 0 AS ord2, 'blank' AS kind,
             NULL::BIGINT AS id, NULL::VARCHAR AS lang,
             NULL::VARCHAR AS host, NULL::BIGINT AS n_text_chars,
             NULL::VARCHAR AS origin, NULL::BIGINT AS score,
             NULL::BIGINT AS n_tags, NULL::VARCHAR AS tag0
      FROM (SELECT DISTINCT gid FROM d) WHERE gid % 3 = 0
      UNION ALL
      SELECT gid, doc_id, 0, 'record', doc_id, lang, host, n_text_chars,
             source, doc_id % 97,
             CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END,
             CASE WHEN doc_id % 2 = 0
                  THEN 'b' || CAST(doc_id % 7 AS VARCHAR) ELSE lang END
      FROM d
      UNION ALL
      SELECT gid, doc_id, 1, 'malformed', NULL, NULL, NULL, NULL,
             NULL, NULL, NULL, NULL
      FROM d WHERE doc_id % 5 = 3)
    SELECT gid,
           (row_number() OVER (PARTITION BY gid ORDER BY ord1, ord2) - 1)::BIGINT
             AS line_no,
           kind, id, lang, host, n_text_chars, origin, score, n_tags, tag0
    FROM rows_"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q179_jsonl_ingest",
      (s, d) => jsonlBinaryRecordsRel(
        syntheticBinaryContainers(documents(s, d)), col("container"),
        Seq("gid")),
      Some(ORACLE),
      "JSONL container ingestion: transparent gunzip (.jsonl.gz), line split + nested per-line schema projection (from_json with a metadata struct and tag array) with typed blank/malformed accounting and positional provenance; one fixture-build exchange, the parse a pure map"))
}
