package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Pipeline

/** Streaming-path throughput benchmark: N synthetic tweet envelopes
  * through the full enrich pipeline (parse → project → clean → filter
  * → 2-analyzer sentiment → dedup). Prints one JSON line.
  *
  * Reference context: the original pipeline is hard-capped at ~1.7
  * tweets/s (100 per 60 s poll, BASELINE.md §A) and does 2 blocking
  * HTTP hops per tweet; this path is a single in-process plan.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val texts = Array(
      "I love this amazing product!", "This is terribel and awful.",
      "It's okay, nothing special.", "RT @fan: Best day ever! So excited!",
      "not great, not terrible, just very average honestly",
      "the service was EXTREMELY slow but the food was wonderful!!")
    // distribute envelope generation (id collision rate ~0 at n≤1e6)
    val json = spark.range(n).select(
      concat(lit("""{"data": {"id": """"), $"id",
        lit("""", "text": """"), element_at(lit(texts), ($"id" % texts.length + 1).cast("int")),
        lit("""", "created_at": "2025-09-01T14:03:27.000Z", "author_id": "a"""), $"id" % 1000,
        lit("""", "lang": "en", "public_metrics": {"retweet_count": 3, "like_count": 17, "reply_count": 1, "quote_count": 0}}, "kafka_timestamp": 1756735407123}"""))
        .as("json"))

    // warm-up (codegen + UDF init)
    Pipeline.enrichJson(json.limit(1000)).count()

    val t0 = System.nanoTime()
    val out = Pipeline.enrichJson(json).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rps = out / secs
    println(s"""{"metric":"stream_enrich_throughput","value":$rps,"unit":"rows/sec","rows":$out,"seconds":$secs,"cpus":$cpus}""")
    spark.stop()
  }
}
