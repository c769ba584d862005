package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Heuristic text operators (no SQL oracle) + sketch-aggregate bounds. */
class TextAndAggSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("language ID picks the right language on marker-bearing sentences") {
    val df = Seq(
      (1L, "the cat and the dog sat with that hat of mine", "?"),
      (2L, "el perro de la casa que los gatos una vez", "?"),
      (3L, "der hund und die katze ist nicht das problem", "?"),
      (4L, "le chat est dans les jardins des villes une fois", "?")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_lang").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = SparkEntry.queries("text_lang")(spark, dir)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr"))
  }

  test("fingerprints: identical text -> identical fp; distinct text -> distinct fp") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    Seq(
      (1L, "spark window function over partitioned event streams", "x"),
      (2L, "spark window function over partitioned event streams", "x"),
      (3L, "completely different content about barometric pressure", "x")
    ).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = SparkEntry.queries("text_fingerprint")(spark, dir)
      .select("doc_id", "fp_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("approx_count_distinct is within its accuracy bound of exact") {
    val li = spark.read.parquet(s"$SF/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, SF)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("agg_stats median approximation is within range of the true median") {
    val rows = SparkEntry.queries("agg_stats")(spark, SF).collect()
    rows.foreach { r =>
      val (lo, hi, med) = (r.getDouble(1), r.getDouble(2), r.getDouble(4))
      assert(med > lo && med < hi)
    }
  }
}
