package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Grouped aggregation family (SURVEY.md §2B agg_*, derivation NS).
  *
  * Scale notes:
  *  - `groupBy.agg` plans HashAggregate(partial) → shuffle-on-keys →
  *    HashAggregate(final): map-side combine means the shuffle carries one
  *    row per (partition × group), not per input row. With a handful of
  *    groups this is effectively a metadata shuffle even at 100 TB.
  *  - count(DISTINCT x) expands to a two-phase aggregate on (group, x);
  *    Spark plans it without a driver bottleneck. For billions of distinct
  *    values prefer `agg_approx_distinct` (HLL, constant memory).
  *  - Double sums go through exact DECIMAL accumulation ([[graft.core.dsum]])
  *    so the result is bit-identical regardless of partitioning / summation
  *    order — this is both the oracle-determinism rule (SURVEY.md §7.3) and
  *    the correct answer-stability property for a 1000-executor run.
  */
object AggQueries {

  val all: Seq[Q] = Seq(
    // TPC-H Q1 shape (pricing summary): REF generalization of the scalar
    // derivations O19 into grouped form.
    Q("agg_groupby",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          r6(davg(col("l_quantity"))).as("avg_qty"),
          r6(davg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${dsumSql("l_quantity")} AS sum_qty,
              |  ${dsumSql("l_extendedprice")} AS sum_base_price,
              |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
              |  round(${davgSql("l_quantity")}, 6) AS avg_qty,
              |  round(${davgSql("l_discount")}, 6) AS avg_disc,
              |  count(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("agg_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_orderkey) AS n_orders,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Grouping-sets family. Null grouping keys are coalesced to the 'ALL'
    // sentinel so the sort key is never NULL (Spark and DuckDB default
    // null-ordering differ; SURVEY.md §7.3).
    Q("agg_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy("flag", "status"),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
              |  coalesce(l_linestatus, 'ALL') AS status,
              |  ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY flag, status""".stripMargin)),

    Q("agg_cube",
      (s, dir) => Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_price"), col("n"))
        .orderBy("flag", "status"),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
              |  coalesce(l_linestatus, 'ALL') AS status,
              |  ${dsumSql("l_extendedprice")} AS sum_price, count(*) AS n
              |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY flag, status""".stripMargin)),

    // GROUPING SETS has no DataFrame-API spelling; the SQL route goes through
    // the same Catalyst Expand + Aggregate plan as rollup/cube.
    Q("agg_gsets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders_gs")
        s.sql(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 |  coalesce(o_orderpriority, 'ALL') AS prio,
                 |  ${dsumSparkSql("o_totalprice")} AS sum_price, count(1) AS n
                 |FROM graft_orders_gs
                 |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                 |ORDER BY status, prio""".stripMargin)
      },
      Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              |  coalesce(o_orderpriority, 'ALL') AS prio,
              |  ${dsumSql("o_totalprice")} AS sum_price, count(*) AS n
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY status, prio""".stripMargin)),

    // HLL++ sketch: constant memory per group, mergeable across partitions —
    // the 100 TB spelling of distinct-count. No DuckDB oracle (different
    // sketch); bounds-checked against exact counts in AggSpec.
    Q("agg_approx_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag"),
      None),

    // Statistical aggregates beyond the TPC-H shape. stddev/variance are
    // NOT the built-in aggregates (their merge order varies with
    // partitioning, on both engines): they are derived from exact
    // DECIMAL moment sums S1=Σx, S2=Σx², so the final double arithmetic
    // is the identical IEEE op sequence on both sides — deterministic at
    // any partition count, which is also the 1000-executor answer-stability
    // property. Moments accumulate on x/1000: raw x² ≈ 1e10 has double
    // ulp ≈ 2e-6, i.e. AT the 6-dp decimal-cast rounding boundary (the
    // cast tie-breaks differ between engines → observed near-misses);
    // scaled squares ≈ 1e4 keep the cast unambiguous, and the variance is
    // rescaled by 1e6 at the end on both sides.
    //
    // Output grids are magnitude-aware: the identical-IEEE-sequence
    // property needs S1/S2 to cast to double EXACTLY, which holds only
    // while the unscaled decimal stays < 2^53 (true at sf0.1; at sf1
    // S2's unscaled value ≈ 1.5e16 and the engines' decimal→double
    // casts double-round differently by 1 ulp). var_price ≈ 2e10 has
    // double ulp ≈ 4e-6, so a 1e-6 grid is SUB-ulp there — it compares
    // raw doubles and near-misses at scale. Variance is therefore
    // rounded to the integer grid (1.0 ≫ few-ulp cast noise ≈ 2e-5);
    // stddev keeps 6 dp (sqrt halves relative noise: ≈ 7e-11 absolute,
    // far under its 5e-7 half-grid).
    Q("agg_stats",
      (s, dir) => {
        val xk = col("o_totalprice") / 1000.0
        Tables.orders(s, dir)
          .groupBy("o_orderstatus")
          .agg(
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            count(lit(1)).as("n"),
            dsum(xk).as("s1"),
            dsum(xk * xk).as("s2"))
          .select(col("o_orderstatus"), col("min_price"), col("max_price"), col("n"),
            rN((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1) * 1e6, 0)
              .as("var_price"),
            r6(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1) * 1e6))
              .as("stddev_price"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, min_price, max_price, n,
              |  round((s2 - s1 * s1 / n) / (n - 1) * 1e6) AS var_price,
              |  round(sqrt((s2 - s1 * s1 / n) / (n - 1) * 1e6) * 1e6) / 1e6 AS stddev_price
              |FROM (SELECT o_orderstatus,
              |        min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
              |        count(*) AS n,
              |        ${dsumSql("o_totalprice / 1000.0")} AS s1,
              |        ${dsumSql("(o_totalprice / 1000.0) * (o_totalprice / 1000.0)")} AS s2
              |      FROM orders GROUP BY o_orderstatus)
              |ORDER BY o_orderstatus""".stripMargin)),

    // Approximate percentile sketch (KLL-ish GK in Spark): the 100 TB
    // spelling of quantiles — mergeable, bounded memory. Sketches differ
    // across engines, so no SQL oracle; bounds vs the exact percentile are
    // checked in TextAndAggSpec.
    Q("agg_approx_quantile",
      (s, dir) => Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          r6(percentile_approx(col("o_totalprice"), lit(0.5), lit(100000)).cast("double"))
            .as("p50_approx"),
          r6(percentile_approx(col("o_totalprice"), lit(0.9), lit(100000)).cast("double"))
            .as("p90_approx"))
        .orderBy("o_orderstatus"),
      None),

    // Exact percentiles (sort-based): deterministic, unlike the sketch in
    // agg_approx_quantile — this is the oracled variant. At 100 TB prefer
    // percentile_approx; exact percentile is a per-group sort.
    Q("agg_percentile",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders_pct")
        s.sql("""SELECT o_orderstatus,
                |  round(percentile(o_totalprice, 0.5) * 1e6) / 1e6 AS p50,
                |  round(percentile(o_totalprice, 0.9) * 1e6) / 1e6 AS p90,
                |  round(percentile(o_totalprice, 0.99) * 1e6) / 1e6 AS p99
                |FROM graft_orders_pct GROUP BY o_orderstatus
                |ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
             |  round(quantile_cont(o_totalprice, 0.99), 6) AS p99
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Grouped top-N through the bounded TopKAggregator buffer: the
    // "top 3 orders per status" pattern WITHOUT a ranking window — the
    // buffer never exceeds N pairs, so partial aggregation ships N rows
    // per partition×group where row_number shuffles the whole table to
    // sort it. Oracled against the window spelling: must be identical.
    Q("agg_top_per_group",
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val topk = udaf(new graft.functions.TopKAggregator(3),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
        Tables.orders(s, dir)
          .groupBy("o_orderstatus")
          .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("o_orderstatus"), posexplode(col("top")))
          .select(col("o_orderstatus"), (col("pos") + 1).as("rank"),
            col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
          .orderBy("o_orderstatus", "rank")
      },
      Some("""SELECT o_orderstatus, CAST(rank AS INTEGER) AS rank,
             |  o_orderkey, o_totalprice
             |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_orderstatus
             |                           ORDER BY o_totalprice DESC, o_orderkey) AS rank
             |      FROM orders)
             |WHERE rank <= 3 ORDER BY o_orderstatus, rank""".stripMargin)),

    Q("agg_minmax",
      (s, dir) => Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderdate")).cast("date").as("first_date"),
          max(col("o_orderdate")).cast("date").as("last_date"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("min_price"), col("max_price"),
          date_format(col("first_date"), "yyyy-MM-dd").as("first_date"),
          date_format(col("last_date"), "yyyy-MM-dd").as("last_date"), col("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, min(o_totalprice) AS min_price,
             |  max(o_totalprice) AS max_price,
             |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
             |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),
  )
}
