package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc median-of-7 warm timer for registered queries (round-9
  * noise control: r7↔r8 identical-code diffs showed ±20–50%
  * per-query variance, so single-shot timings can't support any
  * claim below ~1.5×). Usage: runMain graft.MedTime q62 q43 …
  * (substring match on query names, SPARK_GRAFT_SF_DIR selects SF). */
object MedTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).select(count(lit(1))).count()
    Tables.events(spark, sfDir).select(count(lit(1))).count()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(n.contains))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[med] $name%-32s median ${ts(3)}%.3f  min ${ts.head}%.3f  max ${ts.last}%.3f")
    }
    spark.stop()
  }
}
