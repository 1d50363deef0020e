package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of agreeing minhash-signature positions as a native codegen'd
  * expression — the kernel of every est-Jaccard pair filter.
  *
  * Semantics match the composed form
  * `size(filter(sequence(1, k), i -> element_at(a, i) === element_at(b, i)))`
  * for the arrays the signature pipeline produces (always exactly `k`
  * long; a position where EITHER side is null — the empty-shingle-set
  * doc — contributes no agreement, exactly the composed form's
  * null-comparison fallthrough). Positions past either array's length
  * contribute no agreement (defensive; the composed form would throw
  * under ANSI there, but signature arrays are k-long by construction).
  *
  * Exists for the same reason as TokenWindowsExpr/MinHashSignature: the
  * composed higher-order-function form is interpreted per element and
  * runs PER CANDIDATE PAIR inside the band-bucket joins (minhashPairs,
  * the ingest near-screen, the delta overlay's affected-set and epm
  * joins) — k interpreted lambda calls per joined row.
  */
case class SigAgreeExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeExpr.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigAgreeExpr.kernel($a, $b, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigAgreeExpr {

  def kernel(a: ArrayData, b: ArrayData, k: Int): Int = {
    val n = math.min(k, math.min(a.numElements(), b.numElements()))
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  def sigAgreeF(a: Column, b: Column, k: Int): Column =
    GraftShim.column(SigAgreeExpr(
      GraftShim.expression(a), GraftShim.expression(b), k))
}
