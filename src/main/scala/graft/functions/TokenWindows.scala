package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token `win`-gram windows as a native codegen'd expression.
  *
  * Semantics match the composed form
  * `transform(sequence(0, size-win), i -> array_join(slice(tk, i+1, win), " "))`
  * (fewer than `win` tokens → empty array; null ELEMENTS are skipped with
  * no delimiter, exactly `array_join`'s contract — `UTF8String.concatWs`
  * implements the same rule). A NULL token ARRAY is handled by the
  * wrapper in TextFunctions (composed form yields an empty array there
  * too, via the `when`'s null-condition fallthrough).
  *
  * Exists for the same reason as CharNgramsExpr/MinHashSignature: the
  * composed higher-order-function form is interpreted per element, and it
  * re-slices + re-joins `win` tokens per window — the r16 probe measured
  * it at ~5 s of the corpus_overlay_delta anchor's 13 s (docWinRows,
  * evalWindowSet, decontaminate and repetition all derive windows), vs
  * 0.2 s for tokenization itself. The kernel walks the token array once
  * per window with no slice allocation and runs inside whole-stage
  * codegen.
  */
case class TokenWindowsExpr(child: Expression, win: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_windows"

  override protected def nullSafeEval(input: Any): Any =
    TokenWindowsExpr.kernel(input.asInstanceOf[ArrayData], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenWindowsExpr.kernel($c, $win)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowsExpr {

  private val Space = UTF8String.fromString(" ")

  def kernel(tk: ArrayData, win: Int): ArrayData = {
    val n = tk.numElements()
    if (n < win) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - win + 1)
    val seg = new Array[UTF8String](win)
    var s = 0
    while (s + win <= n) {
      System.arraycopy(toks, s, seg, 0, win)
      // concatWs skips null inputs with no separator — array_join's rule
      out(s) = UTF8String.concatWs(Space, seg: _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  def tokenWindowsF(tk: Column, win: Int): Column =
    GraftShim.column(TokenWindowsExpr(GraftShim.expression(tk), win))
}
