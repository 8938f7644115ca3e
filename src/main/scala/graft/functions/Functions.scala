package graft.functions

import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Scalar function families (SURVEY.md §2.2: string / date / math / array /
  * map / JSON). Everything is built from `org.apache.spark.sql.functions`
  * so the whole plan stays inside whole-stage codegen — no UDFs.
  *
  * Cross-engine determinism notes (these queries are hash-compared against
  * DuckDB): only IEEE-exact math is used (+,-,*,/ on integers-in-double,
  * sqrt, abs, floor, ceil); `pow`/`exp`/`ln` are avoided because libm
  * implementations differ in the last ulp.
  */
object Functions {
  import Tables._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q16_string_fns",
      (s, d) =>
        part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            length(col("p_name")).as("name_len"),
            substring(col("p_brand"), 7, 10).as("brand_num"),
            regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
            concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
            when(col("p_name").startsWith("small"), lit("S"))
              .when(col("p_name").endsWith("bolt"), lit("B"))
              .otherwise(lit("-")).as("flag"),
            trim(lit("  pad  ")).as("trimmed"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               length(p_name) AS name_len,
               substring(p_brand, 7, 10) AS brand_num,
               regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               concat_ws('|', p_type, p_brand) AS type_brand,
               CASE WHEN p_name LIKE 'small%' THEN 'S'
                    WHEN p_name LIKE '%bolt' THEN 'B'
                    ELSE '-' END AS flag,
               trim('  pad  ') AS trimmed
        FROM part
        ORDER BY p_partkey"""),
      "string family: upper/length/substring/regexp_replace/regexp_extract/concat_ws/prefix-suffix/trim"),

    QueryDef(
      "q17_date_fns",
      (s, d) =>
        orders(s, d)
          .groupBy(
            date_trunc("month", col("o_orderdate")).as("order_month"),
            year(col("o_orderdate")).as("order_year"),
            quarter(col("o_orderdate")).as("order_quarter"))
          .agg(
            count(lit(1)).as("n_orders"),
            Money.sum2(col("o_totalprice")).as("revenue"),
            max(dayofmonth(col("o_orderdate"))).as("max_dom"),
            min(dayofweek(col("o_orderdate"))).as("min_dow"))
          .orderBy(col("order_month")),
      Some(s"""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               year(o_orderdate) AS order_year,
               quarter(o_orderdate) AS order_quarter,
               count(*) AS n_orders,
               ${Money.sqlSum2("o_totalprice")} AS revenue,
               max(dayofmonth(o_orderdate)) AS max_dom,
               min(dayofweek(o_orderdate) + 1) AS min_dow
        FROM orders
        GROUP BY 1, 2, 3
        ORDER BY order_month"""),
      "date family: date_trunc/year/quarter/dayofmonth/dayofweek (Spark dow is 1-based Sunday, DuckDB 0-based)"),

    QueryDef(
      "q18_math_fns",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_orderkey") <= 1000)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") / 7.0, 2).as("price_div"),
            floor(col("l_quantity") / 3.0).cast("long").as("qty_floor"),
            ceil(col("l_quantity") / 3.0).cast("long").as("qty_ceil"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            (Money.cents(col("l_quantity")) % 7).as("qty_mod"),
            greatest(col("l_discount"), col("l_tax")).as("max_rate"),
            least(col("l_discount"), col("l_tax")).as("min_rate"),
            signum(col("l_discount") - col("l_tax")).as("rate_sign"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice / 7.0, 2) AS price_div,
               cast(floor(l_quantity / 3.0) as bigint) AS qty_floor,
               cast(ceil(l_quantity / 3.0) as bigint) AS qty_ceil,
               abs(l_discount - 0.05) AS disc_dev,
               sqrt(l_quantity) AS qty_sqrt,
               cast(round(l_quantity*100) as bigint) % 7 AS qty_mod,
               greatest(l_discount, l_tax) AS max_rate,
               least(l_discount, l_tax) AS min_rate,
               CASE WHEN l_discount > l_tax THEN 1.0
                    WHEN l_discount < l_tax THEN -1.0 ELSE 0.0 END AS rate_sign
        FROM lineitem
        WHERE l_orderkey <= 1000
        ORDER BY l_orderkey, l_linenumber"""),
      "math family: round/floor/ceil/abs/sqrt/mod/greatest/least/signum (IEEE-exact ops only)"),

    QueryDef(
      "q19_array_fns",
      (s, d) =>
        // tokenize -> explode -> word frequency; the array ops run inside
        // codegen, the explode is a Generate node feeding a hash agg.
        documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(20),
      Some("""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20"""),
      "array family: split + explode (Generate) + agg; top-20 word frequency"),

    QueryDef(
      "q20_map_fns",
      (s, d) => {
        // per-document word->count map built with map_from_entries, probed
        // with element_at — the Spark-native form of the reference's
        // dictionary lookups (SURVEY R5/R10/R11).
        val words = documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("cnt"))
        words
          .groupBy(col("doc_id"))
          .agg(map_from_entries(collect_list(struct(col("word"), col("cnt")))).as("wc"),
               sum(col("cnt")).as("n_words"))
          .select(
            col("doc_id"),
            col("n_words"),
            size(map_keys(col("wc"))).as("n_distinct_words"),
            coalesce(element_at(col("wc"), "spark"), lit(0L)).as("n_spark"),
            coalesce(element_at(col("wc"), "join"), lit(0L)).as("n_join"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               cast(sum(cnt) as bigint) AS n_words,
               count(*) AS n_distinct_words,
               cast(coalesce(sum(CASE WHEN word = 'spark' THEN cnt END), 0) as bigint) AS n_spark,
               cast(coalesce(sum(CASE WHEN word = 'join' THEN cnt END), 0) as bigint) AS n_join
        FROM (SELECT doc_id, word, count(*) AS cnt
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
              WHERE word <> ''
              GROUP BY doc_id, word)
        GROUP BY doc_id
        ORDER BY doc_id"""),
      "map family: map_from_entries/map_keys/element_at as distributed dictionary lookup"),

    QueryDef(
      "q53_generators",
      (s, d) =>
        // generator family: posexplode over tokens (position-aware UDTF
        // analog) — position of each word's first occurrence per doc
        documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
          .groupBy(col("doc_id"), col("col").as("word"))
          .agg(min(col("pos")).as("first_pos"), count(lit(1)).as("n"))
          .orderBy(col("doc_id"), col("first_pos"), col("word")),
      Some("""
        SELECT doc_id, word, min(pos - 1) AS first_pos, count(*) AS n
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word,
                     generate_subscripts(list_filter(string_split(text, ' '), t -> t <> ''), 1) AS pos
              FROM documents)
        WHERE doc_id < 100
        GROUP BY doc_id, word
        ORDER BY doc_id, first_pos, word"""),
      "posexplode generator: position-aware flatten (Spark 0-based vs SQL 1-based aligned)"),

    QueryDef(
      "q54_bigrams",
      (s, d) => {
        // n-gram mining: adjacent-token bigrams as zip_with over two slices
        // of a MATERIALIZED token array. The tokenizer runs once per doc in
        // its own projection; embedding it in the HOF lambda would re-split
        // the document per bigram (O(tokens²) per doc).
        val n = size(col("toks"))
        // guard: docs with <2 tokens must yield an empty bigram list (what
        // DuckDB's range(1, len) gives for free); slice with length 0 is
        // invalid, so gate on size — CaseWhen only evaluates the taken branch
        val bigrams = when(n >= 2,
          zip_with(slice(col("toks"), lit(1), n - 1), slice(col("toks"), lit(2), n - 1),
            (a, b) => concat_ws(" ", a, b)))
          .otherwise(array().cast("array<string>"))
        documents(s, d)
          .select(TextAnalysis.tokens(col("text")).as("toks"))
          .select(explode(bigrams).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(15)
      },
      Some("""
        WITH bg AS (
          SELECT unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS bigram
          FROM (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS a FROM documents))
        SELECT bigram, count(*) AS n
        FROM bg
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 15"""),
      "bigram n-gram mining via sequence+element_at generator"),

    QueryDef(
      "q60_array_setops",
      (s, d) => {
        // array set algebra between the word sets of paired documents
        val a = documents(s, d).filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") / 2).cast("long").as("pair"),
            array_sort(array_distinct(TextAnalysis.tokens(col("text")))).as("wa"))
        val b = documents(s, d).filter(col("doc_id") % 2 === 1)
          .select(((col("doc_id") - 1) / 2).cast("long").as("pair"),
            array_sort(array_distinct(TextAnalysis.tokens(col("text")))).as("wb"))
        a.join(b, "pair")
          // materialize the intersection once — three downstream columns use
          // it and Project does not CSE array expressions
          .select(col("pair"), col("wa"), col("wb"),
            array_sort(array_intersect(col("wa"), col("wb"))).as("wi"))
          .select(
            col("pair"),
            // scalar projection of the set — array-typed result columns
            // don't hash portably across engines. (Oracle side needs
            // coalesce: DuckDB's array_to_string of an empty list is NULL
            // where Spark's array_join is ''.)
            array_join(col("wi"), " ").as("common"),
            size(col("wi")).as("n_common"),
            size(array_union(col("wa"), col("wb"))).as("n_union"),
            size(array_except(col("wa"), col("wb"))).as("n_only_a"),
            (size(col("wi")) > 0).as("overlaps"))
          .orderBy(col("pair"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS w
          FROM documents),
        a AS (SELECT doc_id // 2 AS pair, w AS wa FROM t WHERE doc_id % 2 = 0),
        b AS (SELECT (doc_id - 1) // 2 AS pair, w AS wb FROM t WHERE doc_id % 2 = 1)
        SELECT pair,
               coalesce(array_to_string(list_sort(list_intersect(wa, wb)), ' '), '') AS common,
               len(list_intersect(wa, wb)) AS n_common,
               len(list_distinct(list_concat(wa, wb))) AS n_union,
               len(list_filter(wa, x -> NOT list_contains(wb, x))) AS n_only_a,
               len(list_intersect(wa, wb)) > 0 AS overlaps
        FROM a JOIN b USING (pair)
        ORDER BY pair"""),
      "array set algebra: intersect/union/except/overlap on word sets"),

    QueryDef(
      "q55_null_semantics",
      (s, d) =>
        // three-valued logic family: nullif/coalesce/is-distinct-from and
        // null-aware counting — the semantics joins and aggregates hinge on
        orders(s, d)
          .select(
            col("o_orderkey"),
            nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
            coalesce(nullif(col("o_orderpriority"), lit("3-MEDIUM")),
              lit("(default)")).as("prio_defaulted"),
            (col("o_orderstatus") <=> "F").as("is_f"),
            nvl2(nullif(col("o_orderstatus"), lit("O")), lit("kept"), lit("nulled"))
              .as("nvl2_tag"))
          .groupBy(col("nvl2_tag"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("status_or_null")).as("n_nonnull"),
            countDistinct(col("status_or_null")).as("n_distinct_nonnull"),
            count(when(col("is_f"), 1)).as("n_f"))
          .orderBy(col("nvl2_tag")),
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 nullif(o_orderstatus, 'O') AS status_or_null,
                 coalesce(nullif(o_orderpriority, '3-MEDIUM'), '(default)') AS prio_defaulted,
                 o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f,
                 CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                      THEN 'kept' ELSE 'nulled' END AS nvl2_tag
          FROM orders)
        SELECT nvl2_tag,
               count(*) AS n_rows,
               count(status_or_null) AS n_nonnull,
               count(DISTINCT status_or_null) AS n_distinct_nonnull,
               count(CASE WHEN is_f THEN 1 END) AS n_f
        FROM t
        GROUP BY nvl2_tag
        ORDER BY nvl2_tag"""),
      "null semantics: nullif/coalesce/nvl2/null-safe-equal + null-aware counts"),

    QueryDef(
      "q56_intervals",
      (s, d) =>
        orders(s, d)
          .filter(col("o_orderkey") <= 2000)
          .select(
            col("o_orderkey"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_30d"),
            (col("o_orderdate") + expr("INTERVAL 3 MONTHS")).as("due_3mo"),
            (col("o_orderdate") - expr("INTERVAL 1 WEEK")).as("week_before"),
            datediff(lit("1996-01-01").cast("timestamp"), col("o_orderdate"))
              .cast("long").as("days_to_96"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               o_orderdate + INTERVAL 30 DAY AS due_30d,
               o_orderdate + INTERVAL 3 MONTH AS due_3mo,
               o_orderdate - INTERVAL 1 WEEK AS week_before,
               datediff('day', cast(o_orderdate as date), DATE '1996-01-01') AS days_to_96
        FROM orders
        WHERE o_orderkey <= 2000
        ORDER BY o_orderkey"""),
      "interval arithmetic: day/month/week shifts (month-end clamping identical) + datediff"),

    QueryDef(
      "q21_json_fns",
      (s, d) =>
        events(s, d)
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            count(when(col("k") > 50, 1)).as("n_high"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               count(*) AS n,
               cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS sum_k,
               max(cast(json_extract_string(props, '$.k') as bigint)) AS max_k,
               count(CASE WHEN cast(json_extract_string(props, '$.k') as bigint) > 50
                          THEN 1 END) AS n_high
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""),
      "JSON family: get_json_object path extraction + typed aggregation over events.props")
  )
}
