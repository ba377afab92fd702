package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{CosineSimilarity, HllDistinct, MinHashSignature, SimHash64}

/** SparkSessionExtensions registration: exposes the engine's custom
  * Catalyst expressions to plain SQL (tier-(c) integration point of
  * the build rules — no custom Rule/Strategy is needed for semantics,
  * SURVEY §4, so the extension surface is function injection).
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   -- or --
  *   spark.sql.extensions=graft.GraftExtensions
  *
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *   SELECT hll_distinct(user_id) FROM events
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: the native as-of join's planner strategy
    // and its filter-pushdown rule (graft.plans.AsOfJoin.register is
    // the per-session equivalent for sessions built without extensions)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughAsOfJoin)

    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(
        Cast(args(0), ArrayType(DoubleType)), Cast(args(1), ArrayType(DoubleType)))))

    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      // argument order mirrors the Scala API exactly — (tokens, n, k,
      // seed), all-int params would silently misassign otherwise
      (args: Seq[Expression]) => args match {
        case Seq(c) => MinHashSignature(c, 1, 128, 42)
        case Seq(c, n) => MinHashSignature(c, intArg(n, "shingle_n"), 128, 42)
        case Seq(c, n, k) => MinHashSignature(c, intArg(n, "shingle_n"), intArg(k, "k"), 42)
        case Seq(c, n, k, s) =>
          MinHashSignature(c, intArg(n, "shingle_n"), intArg(k, "k"), intArg(s, "seed"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(tokens[, shingle_n[, k[, seed]]])")
      }))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c, 42)
        case Seq(c, s) => SimHash64(c, intArg(s, "seed"))
        case _ => throw new IllegalArgumentException("simhash64(tokens[, seed])")
      }))

    ext.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllDistinct].getName, "hll_distinct"),
      (args: Seq[Expression]) => (args match {
        case Seq(c) => HllDistinct(c)
        case Seq(c, p) => HllDistinct(c, intArg(p, "precision"))
        case _ => throw new IllegalArgumentException("hll_distinct(col[, precision])")
      }).toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[graft.functions.CountMinSketchAgg].getName, "cms_sketch"),
      (args: Seq[Expression]) => (args match {
        case Seq(c) => graft.functions.CountMinSketchAgg(c)
        case Seq(c, w) => graft.functions.CountMinSketchAgg(c, intArg(w, "width"))
        case Seq(c, w, d) => graft.functions.CountMinSketchAgg(
          c, intArg(w, "width"), intArg(d, "depth"))
        case _ => throw new IllegalArgumentException("cms_sketch(col[, width[, depth]])")
      }).toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("cms_query"),
      new ExpressionInfo(classOf[graft.functions.CountMinQuery].getName, "cms_query"),
      (args: Seq[Expression]) => args match {
        case Seq(t, item) => graft.functions.CountMinQuery(t, item, 1024)
        case Seq(t, item, w) => graft.functions.CountMinQuery(t, item, intArg(w, "width"))
        case Seq(t, item, w, d) => graft.functions.CountMinQuery(
          t, item, intArg(w, "width"), intArg(d, "depth"))
        case _ => throw new IllegalArgumentException("cms_query(table, item[, width[, depth]])")
      }))

    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[graft.functions.TopKBy].getName, "top_k_by"),
      (args: Seq[Expression]) => (args match {
        case Seq(ord, tie, k) => graft.functions.TopKBy(
          Cast(ord, org.apache.spark.sql.types.DoubleType),
          Cast(tie, org.apache.spark.sql.types.LongType), intArg(k, "k"))
        case _ => throw new IllegalArgumentException("top_k_by(ord, tie, k)")
      }).toAggregateExpression()))

    // bloom_contains is Scala-API-only: its filter argument is a
    // built sketch carried as an expression literal, which SQL has no
    // ergonomic syntax for (a 128 KB X'…' literal).
    ext.injectFunction((
      new FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[graft.functions.BloomBuild].getName, "bloom_build"),
      (args: Seq[Expression]) => (args match {
        case Seq(c) => graft.functions.BloomBuild(c)
        case Seq(c, bits) => graft.functions.BloomBuild(c, intArg(bits, "numBits"))
        case Seq(c, bits, k) =>
          graft.functions.BloomBuild(c, intArg(bits, "numBits"), intArg(k, "numHashes"))
        case _ => throw new IllegalArgumentException("bloom_build(col[, numBits[, numHashes]])")
      }).toAggregateExpression()))

    // Round 15: the codegen'd analyzer expressions join the SQL
    // surface — `SELECT analyze_sentiment(text).compound FROM docs`
    // is the reference's /analyze semantics from plain SQL.
    def unary(name: String, build: Expression => Expression)
        (cls: Class[_]): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
      (new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (args: Seq[Expression]) => args match {
          case Seq(c) => build(c)
          case _ => throw new IllegalArgumentException(s"$name(text)")
        })
    ext.injectFunction(unary("analyze_sentiment",
      graft.functions.AnalyzeSentiment(_))(classOf[graft.functions.AnalyzeSentiment]))
    ext.injectFunction(unary("vader_score",
      graft.functions.VaderScore(_))(classOf[graft.functions.VaderScore]))
    ext.injectFunction(unary("textblob_score",
      graft.functions.TextBlobScore(_))(classOf[graft.functions.TextBlobScore]))
    ext.injectFunction(unary("lang_id",
      graft.functions.LangIdDetect(_))(classOf[graft.functions.LangIdDetect]))
  }
}
