package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit key against a pre-built Bloom filter,
  * inside whole-stage codegen: `bloom_might_contain_long(h)` is true iff
  * the filter MIGHT contain `h` (no false negatives; false positives at
  * the filter's configured fpp).
  *
  * The filter is Spark's public `org.apache.spark.util.sketch.BloomFilter`
  * (the same sketch the engine's own runtime bloom join filters use),
  * carried HERE as its serialized `writeTo` bytes: byte arrays give the
  * expression deep value equality and a stable hashCode — the default
  * case-class reference equality on arrays defeats semanticEquals/
  * canonicalization (the [[ArgMinDistSq]]/LshBuckets lesson) — and the
  * deserialized probe object rides along once per plan as a codegen
  * reference object, not once per row.
  *
  * Scale contract: the caller sizes the filter (`BloomFilter.create(n,
  * fpp)` ⇒ m ≈ −n·ln(fpp)/ln²2 bits ≈ 1.2 GB per 10⁹ keys at 1% fpp), so
  * a key set far past the exact-set broadcast threshold still ships to
  * every executor as a compact bitset. Used by
  * [[graft.operators.Dedup.decontaminateBloom]] to prune a corpus-side
  * scan before the exact equi-join that removes the false positives.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  require(bloomBytes.nonEmpty, "bloom_might_contain_long: empty filter")

  override def prettyName: String = "bloom_might_contain_long"

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${t.sql}")
  }

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  /** Deep (value) equality over the serialized filter — see scaladoc. */
  override def equals(other: Any): Boolean = other match {
    case that: BloomMightContainLong =>
      child == that.child &&
        java.util.Arrays.equals(bloomBytes, that.bloomBytes)
    case _ => false
  }

  /** The filter-bytes hash is O(filter size) — potentially hundreds of MB
    * per the sizing note above — and Catalyst calls expression hashCode
    * repeatedly during analysis/canonicalization, so it is computed ONCE.
    * Safe to cache: `bloomBytes` is construction-immutable by contract
    * (nothing mutates it after the ctor), like the matrices in
    * [[ArgMinDistSq]]/[[LshBuckets]]. `child` stays out of the cache —
    * `withNewChildInternal` copies give it a fresh node. */
  @transient private lazy val bloomBytesHash: Int =
    java.util.Arrays.hashCode(bloomBytes)

  override def hashCode(): Int = 31 * child.hashCode() + bloomBytesHash
}
