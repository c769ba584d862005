package graft.operators

import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Tables

/** Core relational operator set: scan / filter / project / joins / sort /
  * top-k / set ops (SURVEY.md §2B, derivation REF:O1-O2,O13,O17,O19 + NS).
  *
  * Scale notes:
  *  - Dimension sides of joins (`region`, `nation`, distinct-key sides) are
  *    explicitly `broadcast()` — at 100 TB the fact side never shuffles for
  *    these; Catalyst confirms with BroadcastHashJoin in `.explain`.
  *  - Big-big joins (orders ⋈ customer) are left to shuffled hash / SMJ with
  *    AQE; both sides shuffle on the join key only.
  *  - The range join deliberately broadcasts the small side: Spark plans a
  *    BroadcastNestedLoopJoin, which is the right physical shape as long as
  *    one side is small; a banded/binned rewrite is the 100 TB path.
  *  - Every query ends in a total-order sort on a unique key purely for the
  *    oracle hash-compare (SURVEY.md §7.3); the sort is on the final,
  *    already-reduced result.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(
    Q("scan_parquet",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 100""".stripMargin)),

    Q("filter_predicate",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "N")
          && col("l_quantity").between(5, 45)
          && (col("l_discount") > 0.05 || col("l_tax") <= 0.02)
          && col("l_linestatus").like("F%")
          && col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_discount, l_tax
             |FROM lineitem
             |WHERE l_returnflag IN ('A','N') AND l_quantity BETWEEN 5 AND 45
             |  AND (l_discount > 0.05 OR l_tax <= 0.02)
             |  AND l_linestatus LIKE 'F%' AND l_shipdate IS NOT NULL
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // Sort-first shape: derive AFTER the total-order sort so the range
    // sampler and the shuffle touch only raw columns and the BigDecimal
    // round()s run once (see math_funcs for the measured rationale).
    Q("project_derive",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          r6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          r6(col("l_extendedprice") * col("l_tax")).as("tax_amt"),
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("big").as("qty_band")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  round(l_extendedprice * (1.0 - l_discount), 6) AS revenue,
             |  round(l_extendedprice * l_tax, 6) AS tax_amt,
             |  CASE WHEN l_quantity < 10 THEN 'small'
             |       WHEN l_quantity < 30 THEN 'mid' ELSE 'big' END AS qty_band
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    Q("join_inner",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
                  col("o_totalprice"), col("c_mktsegment"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_custkey, c_name, o_totalprice, c_mktsegment
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    Q("join_broadcast",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"), col("r_name"))
          .orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name, r_name
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |ORDER BY n_nationkey""".stripMargin)),

    Q("join_left",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin)),

    Q("join_full",
      (s, dir) => {
        val c = Tables.customer(s, dir).groupBy("c_nationkey")
          .agg(count("*").as("n_cust"))
        val sup = Tables.supplier(s, dir).groupBy("s_nationkey")
          .agg(count("*").as("n_supp"))
        c.join(sup, c("c_nationkey") === sup("s_nationkey"), "full_outer")
          .select(col("c_nationkey"), col("s_nationkey"), col("n_cust"), col("n_supp"))
          .orderBy(asc_nulls_first("c_nationkey"), asc_nulls_first("s_nationkey"))
      },
      Some("""SELECT c_nationkey, s_nationkey, n_cust, n_supp
             |FROM (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1) s
             |ON c.c_nationkey = s.s_nationkey
             |ORDER BY c_nationkey NULLS FIRST, s_nationkey NULLS FIRST""".stripMargin)),

    Q("join_semi",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
             |ORDER BY c_custkey""".stripMargin)),

    Q("join_anti",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    Q("join_cross",
      (s, dir) => {
        val r = Tables.region(s, dir).select("r_name")
        val seg = Tables.customer(s, dir).select("c_mktsegment").distinct()
        r.crossJoin(broadcast(seg)).orderBy("r_name", "c_mktsegment")
      },
      Some("""SELECT r_name, c_mktsegment
             |FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
             |ORDER BY r_name, c_mktsegment""".stripMargin)),

    // Non-equi theta join. Physical plan: BroadcastNestedLoopJoin with the
    // 100-row supplier side broadcast; at 100 TB the fix is binning both
    // sides on floor(acctbal/width) and equi-joining bins first.
    Q("join_range",
      (s, dir) => {
        val sup = Tables.supplier(s, dir)
        val c = Tables.customer(s, dir)
        c.join(broadcast(sup),
            c("c_acctbal").between(sup("s_acctbal") - 50.0, sup("s_acctbal") + 50.0))
          .select(col("c_custkey"), col("s_suppkey"),
                  r6(col("c_acctbal") - col("s_acctbal")).as("bal_gap"))
          .orderBy("c_custkey", "s_suppkey")
      },
      Some("""SELECT c_custkey, s_suppkey, round(c_acctbal - s_acctbal, 6) AS bal_gap
             |FROM customer JOIN supplier
             |  ON c_acctbal BETWEEN s_acctbal - 50.0 AND s_acctbal + 50.0
             |ORDER BY c_custkey, s_suppkey""".stripMargin)),

    // Skew-salted join, registered as a first-class operator: the salt
    // splits each hot key across `buckets` reducers (the 100 TB answer
    // when one key dominates and AQE's skew handling isn't enough). The
    // oracle is the PLAIN join — salting must be invisible in the result.
    Q("join_salted",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
        Scale.saltedJoin(li, ord, "l_orderkey", "l_linenumber", 8)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                  col("l_suppkey"), col("l_quantity"), col("o_totalprice"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  l_quantity, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    Q("sort_multi",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .orderBy(asc("l_returnflag"), desc("l_quantity"), asc("l_orderkey"),
                 asc("l_linenumber"), asc("l_partkey"), asc("l_suppkey"))
        .limit(1000),
      Some("""SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber, l_partkey, l_suppkey
             |FROM lineitem
             |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC,
             |  l_partkey ASC, l_suppkey ASC
             |LIMIT 1000""".stripMargin)),

    // orderBy().limit() plans as TakeOrderedAndProject: per-partition top-k
    // then a k-row merge on the driver — no global sort at any scale.
    Q("topk",
      (s, dir) => Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin)),

    Q("join_right",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
          .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin)),

    Q("set_union_all",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_custkey").as("k"), lit("cust").as("src"))
        val o = Tables.orders(s, dir).select(col("o_custkey").as("k"), lit("ord").as("src"))
        c.unionAll(o).orderBy("k", "src")
      },
      Some("""SELECT k, src FROM (
             |  SELECT c_custkey AS k, 'cust' AS src FROM customer
             |  UNION ALL SELECT o_custkey AS k, 'ord' AS src FROM orders)
             |ORDER BY k, src""".stripMargin)),

    Q("set_union",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
        val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
        c.union(sup).distinct().orderBy("nk")
      },
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    Q("set_intersect",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
        val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
        c.intersect(sup).orderBy("nk")
      },
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    Q("set_except",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
        val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
        c.except(sup).orderBy("nk")
      },
      Some("""SELECT c_nationkey AS nk FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    // Multiset (bag) semantics: each occurrence counts. Rows of equal value
    // are interchangeable, so the value-sort is hash-compare safe.
    Q("set_except_all",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_custkey").as("k"))
        val top = Tables.orders(s, dir).filter(col("o_totalprice") > 250000.0)
          .select(col("o_custkey").as("k"))
        o.exceptAll(top).orderBy("k")
      },
      Some("""SELECT o_custkey AS k FROM orders
             |EXCEPT ALL
             |SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
             |ORDER BY k""".stripMargin)),

    Q("set_intersect_all",
      (s, dir) => {
        val a = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("k"))
        val b = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
          .select(col("o_custkey").as("k"))
        a.intersectAll(b).orderBy("k")
      },
      Some("""SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT ALL
             |SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
             |ORDER BY k""".stripMargin)),
  )
}
