package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def med(label: String)(f: => Unit): Unit = {
      val ts = (1 to 7).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.sorted
      println(f"[fp] $label%-46s median ${ts(3)}%.3f  min ${ts.head}%.3f")
    }
    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count().write.format("noop").mode("overwrite").save()
    println("[fp] events rows = " + Tables.events(spark, sfDir).count())
    med("events scan+filter errors (noop)") {
      Tables.events(spark, sfDir).filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts").write.format("noop").mode("overwrite").save()
    }
    med("errors + clicks scans (noop, union)") {
      val ev = Tables.events(spark, sfDir)
      ev.filter($"event_type" === "error").select($"event_id", $"user_id", unix_micros($"ts").as("t"))
        .unionByName(ev.filter($"event_type" === "click").select($"event_id", $"user_id", unix_micros($"ts").as("t")))
        .write.format("noop").mode("overwrite").save()
    }
    med("errors sorted output only (sort floor)") {
      Tables.events(spark, sfDir).filter($"event_type" === "error")
        .select($"event_id", $"user_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .orderBy($"event_id").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
