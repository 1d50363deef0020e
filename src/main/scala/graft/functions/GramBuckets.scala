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
    // No Java String.trim here: it strips ALL chars <= U+0020 (control
    // chars included), while the composed twin / oracle SQL-trim only
    // space — the split + nonEmpty filter already absorbs boundary
    // whitespace in WsClass, keeping bit parity on adversarial text.
    val toks = text.split(TextFunctions.WsClass + "+").filter(_.nonEmpty)
    val n = toks.length
    // Each token's code points are folded EXACTLY ONCE: the bigram hash
    // composes from per-token (raw hash, 31^codepoints) pairs via the
    // affine identity fold(w, h0) = (h0·31^|w| + fold(w, 0)) mod P —
    // the naive spelling re-folds every token up to 3× (its unigram plus
    // both adjacent bigrams). All intermediates < P² ≈ 1e18 < 2^63.
    val raw = new Array[Long](n)
    val pw = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = toks(i)
      var h = 0L
      var p = 1L
      var j = 0
      val m = w.length
      while (j < m) {
        val cp = w.codePointAt(j)
        h = (h * 31L + cp) % P
        p = (p * 31L) % P
        j += Character.charCount(cp)
      }
      raw(i) = h
      pw(i) = p
      i += 1
    }
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    i = 0
    while (i < n) { // unigrams, in token order
      out(i) = raw(i) % buckets
      i += 1
    }
    i = 0
    while (i + 1 < n) { // bigrams "tok_i tok_i+1", in window order
      val pre = (raw(i) * 31L + 32L) % P // ... the joining space
      out(n + i) = ((pre * pw(i + 1)) % P + raw(i + 1)) % P % buckets
      i += 1
    }
    new GenericArrayData(out)
  }
}

object GramBucketsExpr {
  def gramBucketsF(c: Column, buckets: Long): Column =
    GraftShim.column(GramBucketsExpr(GraftShim.expression(c), buckets))
}
