package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.HllSketch.hll_distinct

/** HLL sketch aggregate: accuracy vs exact distinct, mergeability
  * across partitions, and SQL availability via GraftExtensions. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll_distinct within 5% of exact on events.user_id and orders keys") {
    val e = Tables.events(spark, sf)
    val Seq(exact, approx) = e.agg(
        countDistinct($"user_id").cast("double"),
        hll_distinct($"user_id").cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")

    val o = Tables.orders(spark, sf)
    val Seq(e2, a2) = o.agg(
        countDistinct($"o_custkey").cast("double"),
        hll_distinct($"o_custkey").cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    assert(math.abs(a2 - e2) / e2 < 0.05, s"exact=$e2 approx=$a2")
  }

  test("sketch merge across partitions equals single-partition result") {
    val df = spark.range(0, 50000).select(($"id" % 9973).as("k"))
    val many = df.repartition(16).agg(hll_distinct($"k")).head().getLong(0)
    val one = df.coalesce(1).agg(hll_distinct($"k")).head().getLong(0)
    assert(many == one, s"merge must be order/partition-invariant: $many vs $one")
    assert(math.abs(many - 9973.0) / 9973.0 < 0.05)
  }

  test("grouped sketches: per-type distinct users") {
    val out = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"), hll_distinct($"user_id").as("approx"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ex, ap) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(ap - ex) / ex < 0.1, s"group ${r.getString(0)}: exact=$ex approx=$ap")
    }
  }

  test("custom functions callable from SQL via GraftExtensions") {
    // force a NEW session (same SparkContext) so withExtensions
    // applies — getOrCreate would return the suite session; and never
    // close() it (that would stop the shared context)
    val prior = spark // materialize suite session first
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder().master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val cos = s2.sql(
        "SELECT cosine_similarity(array(1.0D, 2.0D), array(2.0D, 4.0D)) c").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val hll = s2.sql(
        "SELECT hll_distinct(id % 100) FROM range(10000)").head().getLong(0)
      assert(math.abs(hll - 100.0) / 100.0 < 0.05)
      val sim = s2.sql(
        "SELECT simhash64(array('a','b','c')) = simhash64(array('a','b','c')) eq").head().getBoolean(0)
      assert(sim)
      // SQL arg order mirrors the Scala API: (tokens, shingle_n, k, seed)
      val mh = s2.sql(
        "SELECT size(minhash_signature(array('x','y'), 1, 32)) n").head().getInt(0)
      assert(mh == 32)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
