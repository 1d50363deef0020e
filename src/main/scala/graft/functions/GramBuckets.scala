package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR's hashed feature derivation in ONE expression eval: text →
  * [pmod(polyHash(gram), buckets)] over unigrams ++ bigram windows, in
  * that order — semantically identical to the composed pipeline
  *   tokens → concat(tk, tokenWindows(tk, 2)) → polyHash each → pmod
  * (Dsir.featured, oracle'd in DuckDB), but in tight JVM loops. The
  * composed form walks four interpreted lambda trees per document and is
  * re-evaluated by the explode's pushdown filter — measured ~4.4 s per
  * corpus pass at sf0.1 (5k docs), twice per DSIR query; this kernel
  * removes the gram-string materialization entirely (bigrams hash by
  * rolling a 0x20 joiner between token folds, the MinHashSignature
  * technique). Bit parity with the composed twin is pinned by DsirSpec.
  *
  * Empty/blank text → empty array (the composed concat of two empties). */
case class GramBucketsExpr(child: Expression, buckets: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_buckets"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val P = 1000000007L
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.trim.split(TextFunctions.WsClass + "+").filter(_.nonEmpty)
    val n = toks.length
    // fold a token's code points into a running polyHash state
    def foldTok(w: String, h0: Long): Long = {
      var h = h0
      var i = 0
      val m = w.length
      while (i < m) {
        val cp = w.codePointAt(i)
        h = (h * 31L + cp) % P
        i += Character.charCount(cp)
      }
      h
    }
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    var i = 0
    while (i < n) { // unigrams, in token order
      out(i) = foldTok(toks(i), 0L) % buckets
      i += 1
    }
    i = 0
    while (i + 1 < n) { // bigrams "tok_i tok_i+1", in window order
      val h = foldTok(toks(i + 1), (foldTok(toks(i), 0L) * 31L + 32L) % P)
      out(n + i) = h % buckets
      i += 1
    }
    new GenericArrayData(out)
  }
}

object GramBucketsExpr {
  def gramBucketsF(c: Column, buckets: Long): Column =
    GraftShim.column(GramBucketsExpr(GraftShim.expression(c), buckets))
}
