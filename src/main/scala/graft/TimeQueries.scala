package graft

import org.apache.spark.sql.SparkSession

/** Builder-side micro-harness: time a NAMED SUBSET of the registered
  * queries (cold + two warm re-runs each, noop-sink materialization —
  * the Bench measurement shape without the 191-query suite) so a plan
  * change can be measured in seconds, not a full bench leg.
  * Usage: runMain graft.TimeQueries <sfDir> <name substrings...> */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = args.drop(1)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if wanted.exists(name.contains)) {
      for (i <- 0 to 2) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[timeq] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
