package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's cross-engine string hash — fold `(h*31 + codepoint) mod
  * 1e9+7` over code points, empty → 0 — as a native codegen'd expression.
  *
  * Exists for the same reason as CharNgramsExpr/MinHashSignature: the
  * composed higher-order-function form (transform + sequence + substr +
  * ascii per CHARACTER, then aggregate) is interpreted per element, and
  * DSIR's per-gram-occurrence hashing made it the new hottest kernel
  * (~100 grams/doc × corpus, twice per query: measured 11 s of the 12 s
  * dsir_topk at sf0.1 before this, ~100× less after). Bit parity with
  * the composed form — and therefore with the DuckDB oracle's
  * list_reduce/ord replica — is pinned by FunctionsSpec, including
  * non-ASCII (both sides count CODE POINTS: Spark length()/substr() are
  * code-point-indexed, DuckDB ord() decodes the code point). */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHashExpr.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHashExpr {

  def kernel(str: UTF8String): Long = {
    val s = str.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  def polyHashF(c: Column): Column =
    GraftShim.column(PolyHashExpr(GraftShim.expression(c)))
}
