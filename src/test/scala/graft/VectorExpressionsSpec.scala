package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions._
import graft.functions.VectorFunctions._
import graft.operators.Embeddings

/** The vector expressions have two execution paths — interpreted
  * `nullSafeEval` and generated Java from `doGenCode` — that must agree
  * bit-for-bit (the driver oracle exercises whichever Spark picks).
  * Plus the semantic contracts: half-away-from-zero quantization and
  * unit-norm normalization. */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(1.0f, -2.0f, 3.5f, 0.0f),
    Seq(-0.5f, 0.5f, 2.5f, -2.5f),
    Seq(0.0f, 0.0f, 0.0f, 0.0f), // zero vector: norm/scale guards
    Seq(127.0f, -127.0f, 63.5f, -63.49f),
  )

  private def litF(v: Seq[Float]) =
    Literal.create(v, ArrayType(FloatType))

  /** Interpreted path: expression.eval on literals (no codegen). */
  private def interp(e: org.apache.spark.sql.catalyst.expressions.Expression): Any =
    e.eval(null)

  test("interpreted eval == codegen for dot / cosine / distSq / maxAbs / div / quantize") {
    val df = Seq((vecs(0), vecs(1))).toDF("a", "b")
    // codegen path (whole-stage codegen on a DataFrame select)
    val row = df.select(
      dot(col("a"), col("b")).as("d"),
      cosine(col("a"), col("b")).as("c"),
      distSq(col("a"), col("b")).as("ds"),
      maxAbs(col("a")).as("m"),
      vecDiv(col("a"), lit(2.0)).as("dv"),
      quantize(col("a"), lit(2.0)).as("qz")).head()
    // interpreted path
    val (a, b) = (litF(vecs(0)), litF(vecs(1)))
    assert(row.getDouble(0) === interp(VecDot(a, b)))
    assert(row.getDouble(1) === interp(VecCosine(a, b)))
    assert(row.getDouble(2) === interp(VecDistSq(a, b)))
    assert(row.getDouble(3) === interp(VecMaxAbs(a)))
    assert(row.getSeq[Double](4) ===
      interp(VecDiv(a, Literal(2.0))).asInstanceOf[ArrayData].toDoubleArray.toSeq)
    assert(row.getSeq[Int](5) ===
      interp(VecQuantize(a, Literal(2.0))).asInstanceOf[ArrayData].toIntArray.toSeq)
  }

  test("quantize rounds half away from zero (matches Spark round(x,0) and DuckDB round)") {
    val xs = Seq(2.5f, -2.5f, 0.5f, -0.5f, 1.4f, -1.4f, 2.6f, -2.6f)
    val got = Seq(Tuple1(xs)).toDF("v")
      .select(quantize(col("v"), lit(1.0))).head().getSeq[Int](0)
    assert(got === Seq(3, -3, 1, -1, 1, -1, 3, -3))
    // agreement with Spark's own round(x, 0) element-wise
    val viaRound = Seq(Tuple1(xs)).toDF("v")
      .select(transform(col("v"), x => round(x.cast("double"), 0).cast("int"))).head()
      .getSeq[Int](0)
    assert(got === viaRound)
  }

  test("normalize yields unit vectors; zero vector passes through") {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Embeddings.normalize(df, "id", "v")
    // sum of u^2 per id == 1 for nonzero vectors, 0 for the zero vector
    val norms = out.groupBy("id").agg(sum(col("u") * col("u")).as("s2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(norms(0L) - 1.0) < 1e-12)
    assert(math.abs(norms(1L) - 1.0) < 1e-12)
    assert(norms(2L) === 0.0)
    assert(math.abs(norms(3L) - 1.0) < 1e-12)
  }

  test("quantizeI8 codes are in [-127, 127] with max-magnitude element hitting ±127") {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Embeddings.quantizeI8(df, "id", "v").collect()
    assert(out.forall(r => math.abs(r.getInt(3)) <= 127))
    val byId = out.groupBy(_.getLong(0))
    // every nonzero vector's largest |code| is exactly 127
    Seq(0L, 1L, 3L).foreach { id =>
      assert(byId(id).map(r => math.abs(r.getInt(3))).max === 127, s"id=$id")
    }
    assert(byId(2L).forall(_.getInt(3) === 0))
  }

  test("knnI8 agrees with exact knn on well-separated planted neighbors") {
    val emb = spark.read.parquet(s"$SF/embeddings.parquet")
      .select("vec_id", "embedding")
    // int8 quantization perturbs cosines by ~1/127, so assert agreement
    // where it must hold: a planted near-identical vector is top-1 in both.
    val base = emb.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planted = base.map { case (id, v) =>
      val w = v.clone(); w(0) = w(0) + 0.01f; (id + 10000L, w.toSeq)
    }
    val corpus = emb.union(planted.toSeq.toDF("vec_id", "embedding"))
    val res = Embeddings.knnI8(corpus, planted.toSeq.toDF("vec_id", "embedding"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    base.foreach { case (id, _) =>
      assert(res.get(id + 10000L).contains(id), s"knnI8 top-1 for planted $id: $res")
    }
  }

  test("ArgMinDistSq native expression == the array_min-of-struct literal spelling") {
    // random vectors + adversarial rows: an exact tie between centroids
    // 1 and 2 (must pick the smaller index) and a NaN coordinate (a NaN
    // distance loses to any real one under struct MIN's Double order).
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(5)(Array.fill(8)(rnd.nextGaussian()))
    cents(2) = cents(1).clone() // duplicate centroid: every row ties 1-vs-2
    val rows = Seq.fill(50)(Seq.fill(8)(rnd.nextGaussian().toFloat)) ++
      Seq(Seq.fill(8)(Float.NaN), cents(1).map(_.toFloat).toSeq)
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val literal = df.select(col("id"), array_min(array(
      cents.zipWithIndex.map { case (c, j) =>
        struct(distSq(col("v"), array(c.map(lit): _*)).as("d"), lit(j).as("j"))
      }: _*)).as("best"))
    val native = df.select(col("id"), argMinDistSq(col("v"), cents).as("best"))
    def m(r: org.apache.spark.sql.Row) = // longBits: NaN must equal NaN here
      r.getLong(0) -> ((java.lang.Double.doubleToLongBits(r.getStruct(1).getDouble(0)),
        r.getStruct(1).getInt(1)))
    val (l, n) = (literal.collect().map(m).toMap, native.collect().map(m).toMap)
    assert(n === l)
    assert(n.values.exists(_._2 == 1) && !n.values.exists(_._2 == 2),
      "tie rows must resolve to the smaller duplicate-centroid index")
    // Interpreted path agrees with the codegen path exercised above.
    val ev = ArgMinDistSq(litF(vecs(0) ++ vecs(1)), cents).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val viaDf = Seq(Tuple1(vecs(0) ++ vecs(1))).toDF("v")
      .select(argMinDistSq(col("v"), cents).as("best")).head().getStruct(0)
    assert((ev.getDouble(0), ev.getInt(1)) === ((viaDf.getDouble(0), viaDf.getInt(1))))
  }
}
