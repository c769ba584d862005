package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact-token masking as one native expression: every space-delimited
  * token byte-equal to one of `entities` becomes `replacement`; all
  * other bytes (including runs of consecutive spaces) pass through
  * unchanged.
  *
  * Semantically identical to the HOF spelling
  * `array_join(transform(split(text, " "), w -> CASE WHEN w IN (...)
  * THEN repl ELSE w END), " ")` — `split` on a single space preserves
  * empty tokens, so join-with-space reconstructs the original spacing —
  * but the lambda form evaluates an interpreted closure per token and
  * materializes the token array plus a per-row rejoin (SURVEY §7.3b:
  * HOF lambdas measured 4-8x slower than codegen'd expressions). Here
  * masking is a two-pass scan over the UTF-8 bytes (size, then fill)
  * with zero per-token allocation, issued as a single static call from
  * whole-stage codegen. Tokenizing on the space BYTE (0x20) is
  * multibyte-safe: 0x20 never occurs inside a UTF-8 continuation, so
  * byte-level token boundaries coincide with the string-level split —
  * the exact-token-equality boundary rule both engines share (see the
  * text_scrub scaladoc for why regex word boundaries are NOT portable).
  */
case class TokenMask(child: Expression, entities: Seq[String], replacement: String)
    extends UnaryExpression {
  require(entities.nonEmpty, "token_mask needs at least one entity")

  override def prettyName: String = "token_mask"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.sql}")
  }

  private lazy val entityBytes: Array[Array[Byte]] =
    entities.map(_.getBytes(StandardCharsets.UTF_8)).toArray
  private lazy val replacementBytes: Array[Byte] =
    replacement.getBytes(StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    TokenMaskUtil.mask(input.asInstanceOf[UTF8String], entityBytes, replacementBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ents = ctx.addReferenceObj("tokenMaskEnts", entityBytes, "byte[][]")
    val repl = ctx.addReferenceObj("tokenMaskRepl", replacementBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TokenMaskUtil.mask($c, $ents, $repl)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of space-delimited tokens byte-equal to one of `entities`:
  * the codegen'd twin of `size(filter(split(text, " "), w -> w IN
  * (...)))` — same single-pass scan as [[TokenMask]], no token array.
  */
case class TokenMatchCount(child: Expression, entities: Seq[String])
    extends UnaryExpression {
  require(entities.nonEmpty, "token_match_count needs at least one entity")

  override def prettyName: String = "token_match_count"

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.sql}")
  }

  private lazy val entityBytes: Array[Array[Byte]] =
    entities.map(_.getBytes(StandardCharsets.UTF_8)).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenMaskUtil.count(input.asInstanceOf[UTF8String], entityBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ents = ctx.addReferenceObj("tokenCountEnts", entityBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TokenMaskUtil.count($c, $ents)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helpers called from generated code. */
object TokenMaskUtil {
  private final val Space: Byte = 0x20

  private def matches(b: Array[Byte], start: Int, len: Int,
      ents: Array[Array[Byte]]): Boolean = {
    var e = 0
    while (e < ents.length) {
      val ent = ents(e)
      if (ent.length == len) {
        var i = 0
        while (i < len && b(start + i) == ent(i)) i += 1
        if (i == len) return true
      }
      e += 1
    }
    false
  }

  def mask(s: UTF8String, ents: Array[Array[Byte]], repl: Array[Byte]): UTF8String = {
    val b = s.getBytes
    val n = b.length
    // Pass 1: exact output size (tokens are maximal 0x20-free runs;
    // empty tokens between consecutive spaces never match a non-empty
    // entity and pass through as zero bytes).
    var outLen = 0
    var i = 0
    while (i < n) {
      if (b(i) == Space) { outLen += 1; i += 1 }
      else {
        var j = i
        while (j < n && b(j) != Space) j += 1
        outLen += (if (matches(b, i, j - i, ents)) repl.length else j - i)
        i = j
      }
    }
    val out = new Array[Byte](outLen)
    // Pass 2: fill.
    var o = 0
    i = 0
    while (i < n) {
      if (b(i) == Space) { out(o) = Space; o += 1; i += 1 }
      else {
        var j = i
        while (j < n && b(j) != Space) j += 1
        if (matches(b, i, j - i, ents)) {
          System.arraycopy(repl, 0, out, o, repl.length); o += repl.length
        } else {
          System.arraycopy(b, i, out, o, j - i); o += j - i
        }
        i = j
      }
    }
    UTF8String.fromBytes(out)
  }

  def count(s: UTF8String, ents: Array[Array[Byte]]): Int = {
    val b = s.getBytes
    val n = b.length
    var c = 0
    var i = 0
    while (i < n) {
      if (b(i) == Space) i += 1
      else {
        var j = i
        while (j < n && b(j) != Space) j += 1
        if (matches(b, i, j - i, ents)) c += 1
        i = j
      }
    }
    c
  }
}
