package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance (insert/delete/substitute/
  * transpose, transposed substrings may be edited further) — the variant
  * implemented by the reference's `jellyfish.damerau_levenshtein_distance`
  * dependency (geo_manager.py:8, used at geo_manager.py:28-32) and by
  * DuckDB's `damerau_levenshtein` (the driver oracle).
  *
  * Spark ships only plain `levenshtein` (no transpositions), so this is the
  * one genuinely custom scalar in the engine — a native Catalyst
  * `Expression` with whole-stage-codegen support (`doGenCode` emits a call
  * to the static kernel below; no boxing, no UDF serialization).
  */
object DamerauLevenshtein {

  /** O(|a|*|b|) DP kernel, "distance with alphabet" formulation. */
  def distance(aStr: UTF8String, bStr: UTF8String): Int = {
    val a = aStr.toString
    val b = bStr.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val maxDist = n + m
    // score has (n+2) x (m+2) entries; row-major flat array.
    val w = m + 2
    val score = new Array[Int]((n + 2) * w)
    score(0) = maxDist
    var i = 0
    while (i <= n) {
      score((i + 1) * w) = maxDist
      score((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      score(j + 1) = maxDist
      score(w + j + 1) = j
      j += 1
    }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val i1: Int = { val v = da.get(bj); if (v == null) 0 else v.intValue() }
        val j1 = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = score(i * w + j) + cost
        val ins = score((i + 1) * w + j) + 1
        val del = score(i * w + j + 1) + 1
        val trans = score(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        score((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(ai, i)
      i += 1
    }
    score((n + 1) * w + m + 1)
  }

  /** Column API: `damerau_levenshtein(a, b)`. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftShim.column(DamerauLevenshteinExpr(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** geo_manager.py:28-32 — `min(DL(pre-comma parts), DL(full strings))`. */
  def geoDamerauLevenshtein(a: Column, b: Column): Column =
    least(
      damerauLevenshtein(split(a, ",").getItem(0), split(b, ",").getItem(0)),
      damerauLevenshtein(a, b))
}

case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
