package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine entry point into Catalyst: registers the native expressions with
  * the session FunctionRegistry, so SQL users get them as first-class
  * functions (codegen'd, optimizer-visible — NOT UDFs):
  *
  *   spark.sql("SELECT damerau_levenshtein(a, b) FROM t")
  *   spark.sql("SELECT cosine_similarity(e1, e2) FROM pairs")
  *   spark.sql("SELECT minhash_signature(lower(text), 3, 16) FROM docs")
  *
  * Two activation paths:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - programmatic: `GraftExtensions.register(spark)` on a live session.
  *
  * No custom optimizer Rule or SparkStrategy is registered: every engine
  * plan compiles to stock physical operators (SURVEY.md §4) — the
  * extension surface is functions only, which is the honest minimum.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Arity guard: without it, extra SQL args are silently DROPPED (results
    * computed on the wrong inputs) and missing ones surface as a raw
    * IndexOutOfBoundsException instead of an error naming the function. */
  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): FunctionBuilder =
    (args: Seq[Expression]) => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")
      f(args)
    }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val injections: Seq[(String, ExpressionInfo, FunctionBuilder)] = Seq(
    ("damerau_levenshtein",
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - unrestricted Damerau-Levenshtein edit distance."),
      arity("damerau_levenshtein", 2)(args => DamerauLevenshteinExpr(args(0), args(1)))),
    ("vector_dot",
      info("vector_dot", "vector_dot(a, b) - left-to-right fold dot product of float arrays."),
      arity("vector_dot", 2)(args => DotProductExpr(args(0), args(1)))),
    ("cosine_similarity",
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float arrays."),
      arity("cosine_similarity", 2)(args => CosineSimExpr(args(0), args(1)))),
    ("lsh_signature",
      info("lsh_signature",
        "lsh_signature(emb, planes) - random-hyperplane sign-bit signature."),
      arity("lsh_signature", 2)(args =>
        LshSignatureExpr(args(0), intLit(args(1), "planes")))),
    ("minhash_signature",
      info("minhash_signature",
        "minhash_signature(text, k, num_hashes) - MinHash signature over word k-shingles."),
      arity("minhash_signature", 3)(args =>
        MinHashSignature(args(0), intLit(args(1), "k"), intLit(args(2), "num_hashes")))),
    ("char_ngrams",
      info("char_ngrams", "char_ngrams(s, n) - sliding character n-grams (with multiplicity)."),
      arity("char_ngrams", 2)(args =>
        CharNgramsExpr(args(0), intLit(args(1), "n"), distinct = false))),
    ("char_ngram_set",
      info("char_ngram_set", "char_ngram_set(s, n) - distinct character n-grams, first-occurrence order."),
      arity("char_ngram_set", 2)(args =>
        CharNgramsExpr(args(0), intLit(args(1), "n"), distinct = true))),
    ("simhash_fingerprint",
      info("simhash_fingerprint",
        "simhash_fingerprint(text, n_bits) - SimHash fingerprint over word tokens."),
      arity("simhash_fingerprint", 2)(args =>
        SimHashFingerprint(args(0), intLit(args(1), "n_bits")))),
    ("cosine_similarity_d",
      info("cosine_similarity_d",
        "cosine_similarity_d(a, b) - cosine of two double arrays (trained centroids)."),
      arity("cosine_similarity_d", 2)(args => CosineSimDExpr(args(0), args(1)))),
    ("poly_hash",
      info("poly_hash",
        "poly_hash(s) - polynomial code-point hash, (h*31+cp) mod 1e9+7; empty -> 0."),
      arity("poly_hash", 1)(args => PolyHashExpr(args(0)))),
    ("gram_buckets",
      info("gram_buckets",
        "gram_buckets(s, buckets) - hashed feature buckets of unigrams ++ bigrams (DSIR)."),
      arity("gram_buckets", 2)(args =>
        GramBucketsExpr(args(0), intLit(args(1), "buckets").toLong))))

  /** Programmatic registration on a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    injections.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
