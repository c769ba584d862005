package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Scalar function packs: string / date / math / JSON / array
  * (SURVEY.md §2B str_funcs..array_funcs; derivation REF:O3-O7,O16-O20).
  *
  * Everything here is a built-in column expression — whole-stage codegen
  * applies end to end, no UDFs (SURVEY.md §4 "no UDFs in the hot path").
  * Oracle SQL is written dialect-carefully: DuckDB returns BIGINT where
  * Spark returns INT (year(), len(), datediff...), DuckDB's dayofweek is
  * 0-based Sunday vs Spark's 1-based, DuckDB regexp_replace needs the 'g'
  * flag — every such gap is normalized with explicit casts/offsets so the
  * driver's hash compare sees identical schema and values.
  */
object FunctionQueries {

  val all: Seq[Q] = Seq(
    Q("str_funcs",
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          expr("replace(p_name, ' ', '_')").as("snake"),
          lpad(col("p_type"), 12, ".").as("padded"),
          instr(col("p_name"), "widget").as("widget_at"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS uname,
             |  substring(p_name, 1, 5) AS prefix,
             |  CAST(length(p_name) AS INTEGER) AS name_len,
             |  concat_ws('#', p_brand, p_type) AS brand_type,
             |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             |  replace(p_name, ' ', '_') AS snake,
             |  lpad(p_type, 12, '.') AS padded,
             |  CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_at,
             |  trim('  pad  ') AS trimmed
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Null semantics, row level: SQL three-valued logic must round-trip
    // the engine identically — NULLIF/COALESCE/NVL2, IS NULL, and
    // null-safe equality (Spark <=> ≡ DuckDB IS NOT DISTINCT FROM). The
    // TPC-H data has no physical nulls, so NULLIF manufactures them.
    Q("null_row",
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("disc_n", expr("nullif(l_discount, 0.0)"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("disc_n"),
          coalesce(col("disc_n"), lit(-1.0)).as("disc_or_default"),
          col("disc_n").isNull.as("was_zero"),
          (col("disc_n") <=> lit(0.05)).as("nse_005"),
          expr("nvl2(disc_n, 'discounted', 'free')").as("tag"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  nullif(l_discount, 0.0) AS disc_n,
             |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_default,
             |  nullif(l_discount, 0.0) IS NULL AS was_zero,
             |  nullif(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 AS nse_005,
             |  CASE WHEN nullif(l_discount, 0.0) IS NOT NULL
             |       THEN 'discounted' ELSE 'free' END AS tag
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // Null semantics, aggregate level: count(*) vs count(col) vs
    // null-skipping sums, and the all-null group collapsing to NULL.
    Q("null_agg",
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("disc_n", expr("nullif(l_discount, 0.0)"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("disc_n")).as("n_nonnull"),
          dsum(col("disc_n")).as("sum_nonnull"),
          sum(expr("CAST(NULL AS DOUBLE)")).as("sum_allnull"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, count(*) AS n_rows,
              |  count(nullif(l_discount, 0.0)) AS n_nonnull,
              |  ${dsumSql("nullif(l_discount, 0.0)")} AS sum_nonnull,
              |  sum(CAST(NULL AS DOUBLE)) AS sum_allnull
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    // Edit-distance fuzzy matching (the blocking-free tail of the dedup
    // family: levenshtein on candidate pairs; both engines implement the
    // classic DP distance, so the values oracle-match). Small-dimension
    // cross join — at scale this runs on blocked/LSH candidates, never
    // all pairs.
    Q("str_distance",
      (s, dir) => {
        val a = Tables.nation(s, dir).select(col("n_nationkey").as("k1"), col("n_name").as("s1"))
        val b = Tables.nation(s, dir).select(col("n_nationkey").as("k2"), col("n_name").as("s2"))
        a.crossJoin(b).filter(col("k1") < col("k2"))
          .select(col("k1"), col("k2"), col("s1"), col("s2"),
            levenshtein(col("s1"), col("s2")).as("lev"))
          .orderBy("k1", "k2")
      },
      Some("""SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
             |  a.n_name AS s1, b.n_name AS s2,
             |  CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS lev
             |FROM nation a, nation b WHERE a.n_nationkey < b.n_nationkey
             |ORDER BY k1, k2""".stripMargin)),

    Q("date_funcs",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          (dayofweek(col("o_orderdate"))).as("dow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3mo"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          from_unixtime(unix_timestamp(col("o_orderdate"))).as("rt_str"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS yr,
             |  CAST(month(o_orderdate) AS INTEGER) AS mo,
             |  CAST(day(o_orderdate) AS INTEGER) AS dom,
             |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
             |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
             |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  strftime(make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000),
             |           '%Y-%m-%d %H:%M:%S') AS rt_str
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Sort FIRST on the narrow raw columns, derive AFTER: with the heavy
    // projection under the range exchange, the range-partitioner's
    // sampling pass executes every scalar derivation a second time and
    // the shuffle carries 17 computed doubles instead of 8 raw columns
    // (round(x, 0) on double is a per-value BigDecimal HALF_UP — the
    // single most expensive expression here, and rN/r6 issue nine of
    // them per row). Catalyst keeps a Project above a Sort (order is
    // preserved by a deterministic row-map), so the derivations run
    // exactly once, post-shuffle. Measured 3.2 s -> 0.85 s at sf0.1,
    // local[32]; at 100 TB the same shape halves the sort's shuffle
    // bytes and keeps the sampling pass on the pruned parquet scan.
    Q("math_funcs",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          rN(col("l_extendedprice"), 2).as("rounded"),
          abs(col("l_quantity") - lit(25.0)).as("abs_dev"),
          ceil(col("l_discount") * 100).as("ceil_pct"),
          floor(col("l_discount") * 100).as("floor_pct"),
          r6(exp(col("l_discount"))).as("exp_disc"),
          r6(log(col("l_extendedprice"))).as("ln_price"),
          r6(log10(col("l_extendedprice"))).as("log10_price"),
          r6(sqrt(col("l_quantity"))).as("sqrt_qty"),
          r6(pow(col("l_quantity"), 2)).as("qty_sq"),
          signum(col("l_discount") - lit(0.05)).as("sign_disc"),
          (col("l_orderkey") % 7).as("mod7"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  round(l_extendedprice, 2) AS rounded,
             |  abs(l_quantity - 25.0) AS abs_dev,
             |  CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_pct,
             |  CAST(floor(l_discount * 100) AS BIGINT) AS floor_pct,
             |  round(exp(l_discount), 6) AS exp_disc,
             |  round(ln(l_extendedprice), 6) AS ln_price,
             |  round(log10(l_extendedprice), 6) AS log10_price,
             |  round(sqrt(l_quantity), 6) AS sqrt_qty,
             |  round(pow(l_quantity, 2), 6) AS qty_sq,
             |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc,
             |  l_orderkey % 7 AS mod7,
             |  greatest(l_tax, l_discount) AS max_rate,
             |  least(l_tax, l_discount) AS min_rate
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // JSON path extraction over events.props (REF:O3 — the reference's
    // JSON.parse + nested field pick, columnized). get_json_object is a
    // codegen'd expression; no parse-to-struct materialization needed when
    // only one path is extracted.
    Q("json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k").isNotNull)
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
             |FROM events WHERE props->>'k' IS NOT NULL
             |ORDER BY event_id""".stripMargin)),

    Q("array_funcs",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"),
          size(col("words")).as("n_words"),
          element_at(col("words"), 1).as("first_word"),
          array_contains(col("words"), "spark").as("has_spark"),
          size(array_distinct(col("words"))).as("n_uniq"),
          array_join(slice(sort_array(col("words")), 1, 3), ",").as("first3_sorted"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
             |  string_split(text, ' ')[1] AS first_word,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
             |  array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Generator/UDTF surface: explode (lateral view). Duplicate (doc_id,
    // word) rows are identical records, so the hash compare is order-safe
    // under the (doc_id, word) sort.
    Q("array_explode",
      (s, dir) => Tables.documents(s, dir)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy("doc_id", "word"),
      Some("""SELECT doc_id, unnest(string_split(text, ' ')) AS word
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id, word""".stripMargin)),
  )
}
