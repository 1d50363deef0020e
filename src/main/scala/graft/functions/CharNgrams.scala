package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams as a native codegen'd expression.
  *
  * Semantics match fuzzy.py:5-6 via the composed form
  * `transform(sequence(0, length-n), i -> substr(i+1, n))` (+
  * `array_distinct`, first-occurrence order, when `distinct`):
  * strings shorter than n yield an empty array; no padding.
  *
  * Exists for the same reason as MinHashSignature: the composed
  * higher-order-function form is interpreted per element, and the
  * postings explode over it was the fuzzy pipeline's hottest stage.
  */
case class CharNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramsExpr.kernel(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgramsExpr.kernel($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramsExpr {

  def kernel(str: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = str.toString
    val len = s.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i + n <= len) { out(i) = UTF8String.fromString(s.substring(i, i + n)); i += 1 }
      new GenericArrayData(out)
    } else {
      // First-occurrence order — matches array_distinct.
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= len) { seen.add(s.substring(i, i + n)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  def charNgramsF(c: Column, n: Int): Column =
    GraftShim.column(CharNgramsExpr(GraftShim.expression(c), n, distinct = false))

  def charNgramSetF(c: Column, n: Int): Column =
    GraftShim.column(CharNgramsExpr(GraftShim.expression(c), n, distinct = true))
}
