package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Second-tier relational surface: pivot and subquery shapes (NS
  * generalization; Catalyst decorrelates the correlated forms into the
  * same join plans the explicit spellings produce).
  */
object AdvancedQueries {

  val all: Seq[Q] = Seq(
    // Pivot: one output column per l_linestatus value. Values are
    // enumerated explicitly — at scale an implicit pivot means an extra
    // distinct-scan job just to discover the columns.
    Q("agg_pivot",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
              |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (WHERE l_linestatus = 'F') AS VARCHAR) AS DOUBLE) AS qty_f,
              |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (WHERE l_linestatus = 'O') AS VARCHAR) AS DOUBLE) AS qty_o
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Unpivot (melt): the inverse reshape, stack back to long form.
    Q("agg_unpivot",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .select(col("l_returnflag"),
          expr("stack(2, 'F', F, 'O', O) AS (status, qty)"))
        .filter(col("qty").isNotNull)
        .orderBy("l_returnflag", "status"),
      Some(s"""WITH p AS (
              |  SELECT l_returnflag,
              |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (WHERE l_linestatus = 'F') AS VARCHAR) AS DOUBLE) AS qf,
              |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (WHERE l_linestatus = 'O') AS VARCHAR) AS DOUBLE) AS qo
              |  FROM lineitem GROUP BY l_returnflag)
              |SELECT l_returnflag, status, qty FROM (
              |  SELECT l_returnflag, 'F' AS status, qf AS qty FROM p
              |  UNION ALL SELECT l_returnflag, 'O', qo FROM p)
              |WHERE qty IS NOT NULL
              |ORDER BY l_returnflag, status""".stripMargin)),

    // Data profiling: per-column null/distinct/min/max in ONE scan — the
    // training-data-pipeline health check, deliberately not N scans.
    // Shape: melt rows to (column_name, val) with stack, then TWO
    // hash-aggregate levels — (column, value) counts, then per-column
    // stats over the tiny distinct-value table. The naive spelling (one
    // global agg with 4 countDistincts + string-typed min/max) plans an
    // Expand(xN) into a SortAggregate (var-length agg buffers are not
    // hash-aggregable) = sort of N x |table| rows; this melt keeps every
    // full-size stage a codegen'd HashAggregate with map-side combine
    // (measured 10x; the gap widens with scale). Numeric columns carry a
    // double sort key so min/max order numerically; min_by/max_by pick the
    // display string (null key on string columns -> coalesce to plain
    // string min/max, same buffers, 4-row input).
    Q("profile_table",
      (s, dir) => {
        val strCols = Seq("l_returnflag", "l_linestatus")
        val numCols = Seq("l_quantity", "l_discount")
        val triples =
          strCols.map(c => s"'$c', CAST($c AS STRING), CAST(NULL AS DOUBLE)") ++
            numCols.map(c => s"'$c', CAST($c AS STRING), CAST($c AS DOUBLE)")
        Tables.lineitem(s, dir)
          .select(expr(s"stack(${triples.size}, ${triples.mkString(", ")}) " +
            "AS (column_name, val_str, val_num)"))
          .groupBy("column_name", "val_str", "val_num")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("column_name")
          .agg(
            sum(when(col("val_str").isNull, col("cnt")).otherwise(lit(0L))).as("n_nulls"),
            count(col("val_str")).as("n_distinct"),
            coalesce(min_by(col("val_str"), col("val_num")), min(col("val_str")))
              .as("min_val"),
            coalesce(max_by(col("val_str"), col("val_num")), max(col("val_str")))
              .as("max_val"))
          .orderBy("column_name")
      },
      Some(Seq("l_returnflag", "l_linestatus", "l_quantity", "l_discount").map(c =>
        s"""SELECT '$c' AS column_name,
           |  count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name"))),

    // Uncorrelated scalar subquery: broadcast of a 1-row aggregate.
    Q("sub_scalar",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders_ss")
        s.sql("""SELECT o_orderkey, o_totalprice
                |FROM graft_orders_ss
                |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM graft_orders_ss)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice
             |FROM orders
             |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // Correlated scalar subquery: Catalyst decorrelates to an aggregate +
    // join on the correlation key — no per-row re-execution.
    Q("sub_correlated",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("graft_cust_corr")
        s.sql("""SELECT c_custkey, c_nationkey, c_acctbal
                |FROM graft_cust_corr c1
                |WHERE c_acctbal > 2 * (SELECT avg(c_acctbal) FROM graft_cust_corr c2
                |                       WHERE c2.c_nationkey = c1.c_nationkey)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal
             |FROM customer c1
             |WHERE c_acctbal > 2 * (SELECT avg(c_acctbal) FROM customer c2
             |                       WHERE c2.c_nationkey = c1.c_nationkey)
             |ORDER BY c_custkey""".stripMargin)),

    // IN-subquery with a computed set (plans as left-semi after rewrite).
    Q("sub_in",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders_in")
        Tables.lineitem(s, dir).createOrReplaceTempView("graft_li_in")
        s.sql("""SELECT o_orderkey, o_totalprice
                |FROM graft_orders_in
                |WHERE o_orderkey IN (SELECT l_orderkey FROM graft_li_in WHERE l_quantity >= 49)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice
             |FROM orders
             |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
             |ORDER BY o_orderkey""".stripMargin)),
  )
}
