package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Plan-shape assertions for the scale toolbox: salted results are
  * exact; bucketed joins plan with zero Exchange. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCount is exact vs direct groupBy on skewed data") {
    // 90% of rows under one key
    val df = spark.range(100000)
      .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"))
    val direct = df.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(df, $"k", salt = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("saltedJoin is exact vs direct join") {
    val fact = spark.range(20000)
      .select(when($"id" % 5 =!= 0, lit(1L)).otherwise($"id" % 100).as("k"), $"id".as("v"))
    val dim = spark.range(100).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val direct = fact.join(dim, "k").agg(count(lit(1)), sum($"v")).head()
    val salted = Scale.saltedJoin(fact, dim, "k", salt = 8).agg(count(lit(1)), sum($"v")).head()
    assert(direct == salted)
  }

  test("bucketed tables join with zero Exchange") {
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Scale.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan
      // with AQE the final plan nests; scan the rendered tree for any
      // Exchange (shuffle or broadcast) node
      val allExchanges = plan.toString.split("\n").count(_.contains("Exchange"))
      assert(allExchanges == 0, s"expected shuffle-free bucketed join, plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
