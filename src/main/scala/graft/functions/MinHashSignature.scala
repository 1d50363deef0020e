package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document in ONE expression eval.
  *
  * Semantically identical to the composed built-in pipeline
  *   tokens → wordShingles(k) → polyHash each → distinct →
  *   sig_i = min((h * A_i + B_i) mod P)
  * (TextFunctions / Dedup.minhashSignatures, oracle'd in DuckDB), but
  * evaluated in tight JVM loops instead of per-element interpreted
  * higher-order-function trees. Spark's `transform`/`aggregate`/`filter`
  * are not whole-stage-codegen-able — each lambda step allocates and walks
  * ArrayData — which made the signature stage the bench bottleneck
  * (~6s for 5k docs at sf0.1; this expression computes it in ~0.2s).
  *
  * Shingle hashing is rolling (never materializes shingle strings):
  * polyHash(join(window, " ")) == fold over window chars with a literal
  * space (0x20) folded between tokens.
  *
  * Empty/short docs: fewer than k tokens → ONE shingle of the whole doc
  * (TextFunctions.wordShingles); an empty string hashes to 0.
  */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = TextFunctions.HashMod

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Permutation params — the canonical family (MinHashSignature.permA/B),
  // shared with the composed spellings and the oracles.
  private val as: Array[Long] = Array.tabulate(numHashes)(MinHashSignature.permA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(MinHashSignature.permB)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // Whitespace tokenization of the trimmed string (tokens() semantics:
    // split on TextFunctions.WsClass runs, drop empties).
    val toks = text.trim.split(TextFunctions.WsClass + "+").filter(_.nonEmpty)

    // Rolling hash of each k-shingle, deduped.
    val seen = new java.util.HashSet[Long]()
    def hashWindow(from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) {
        if (i > from) h = (h * 31L + 32L) % P // joining space
        val w = toks(i)
        var j = 0
        while (j < w.length) {
          h = (h * 31L + w.charAt(j).toLong) % P
          j += 1
        }
        i += 1
      }
      h
    }
    if (toks.length <= k) seen.add(hashWindow(0, toks.length))
    else {
      var i = 0
      while (i + k <= toks.length) { seen.add(hashWindow(i, i + k)); i += 1 }
    }

    // Signature: per permutation, min over shingle hashes.
    val sig = new Array[Long](numHashes)
    var p = 0
    while (p < numHashes) {
      var min = Long.MaxValue
      val it = seen.iterator()
      while (it.hasNext) {
        val h = it.next()
        val v = (h * as(p) + bs(p)) % P
        if (v < min) min = v
      }
      sig(p) = min
      p += 1
    }
    new GenericArrayData(sig)
  }
}

object MinHashSignature {
  /** CANONICAL permutation-seed family h_i(x) = (x·permA(i) + permB(i))
    * mod HashMod, shared by the minhash/simhash kernels, the composed
    * spellings (Dedup.permA/permB delegate here), the fuzzy LSH channel,
    * and — as embedded LITERALS — every DuckDB oracle.
    *
    * Round 14 replaced the original ARITHMETIC-PROGRESSION seeds
    * (A_i = 1 + 7919·(i+1), B_i = 104729·(i+1)) after the diversity
    * replica exposed the classic failure: consecutive "permutations"
    * differed by a FIXED per-element step (h_{i+1}(x) − h_i(x) =
    * 7919·x + 104729 mod P), so one element could win RUNS of signature
    * positions — measured as banded candidate pairs with true Jaccard
    * < 0.05 whose 32-position agreement estimate read ≥ 0.5 (pure
    * correlation, irreducible by longer signatures). splitmix64-mixed
    * seeds restore the pairwise independence universal hashing needs;
    * A_i, x < HashMod keeps every product under 2^60 (no overflow in
    * Spark Long, the codegen kernels, or DuckDB BIGINT). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def permA(i: Int): Long =
    1L + java.lang.Long.remainderUnsigned(mix(i.toLong), TextFunctions.HashMod - 1L)
  def permB(i: Int): Long =
    java.lang.Long.remainderUnsigned(mix(i.toLong + 0x51AB1EEDL), TextFunctions.HashMod)

  /** Column builder: signature over the (pre-lowered) text column. */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      MinHashSignature(org.apache.spark.sql.graftshim.GraftShim.expression(text), k, numHashes))

  /** Column builder: the distinct shingle-hash SET itself (the domain the
    * signatures minimize over), for exact-Jaccard measurement. */
  def shingleHashes(text: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      ShingleHashes(org.apache.spark.sql.graftshim.GraftShim.expression(text), k))
}

/** Distinct polyHash'd word-k-shingles of a document in one eval —
  * bit-identical to the composed
  * `array_distinct(transform(wordShingles(tokens(text), k), polyHash))`
  * pipeline (first-occurrence order) and to MinHashSignature's internal
  * shingle set, but a single JVM loop: the composed HOF chain re-evaluated
  * by every Generate branch of a self-join made the exact-Jaccard ground
  * truth 10× slower than the detector it was measuring. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = TextFunctions.HashMod

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.trim.split(TextFunctions.WsClass + "+").filter(_.nonEmpty)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    def hashWindow(from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) {
        if (i > from) h = (h * 31L + 32L) % P
        val w = toks(i)
        var j = 0
        while (j < w.length) {
          h = (h * 31L + w.charAt(j).toLong) % P
          j += 1
        }
        i += 1
      }
      h
    }
    if (toks.length <= k) seen.add(hashWindow(0, toks.length))
    else {
      var i = 0
      while (i + k <= toks.length) { seen.add(hashWindow(i, i + k)); i += 1 }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
