package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A small warm-up runs
  * first so JVM/classloader/codegen startup is not billed to the
  * first query (the steady-state figure is what scales to a cluster;
  * cold-start is a fixed cost paid once per application).
  *
  * Each query is materialized through the `noop` sink, which pulls
  * EVERY output column through the full physical plan (unlike
  * `.count()`, under which Catalyst prunes computed columns and drops
  * the final sort — that under-measured projection-shaped queries in
  * round 1). A query that throws is reported with a NEGATIVE elapsed
  * time and an `"errors"` entry so the driver can distinguish a
  * failure from a fast query.
  *
  * Every query runs three times: the primary `value`/`queries`
  * figures are the COLD runs (first execution, including Catalyst
  * planning and Janino whole-stage-codegen compilation — the
  * conservative number), and `value_warm`/`queries_warm` are the BEST
  * of two immediate re-runs (the standard min-of-k steady-state
  * estimator; a single transient stall — GC pause, safepoint, noisy
  * neighbor — cannot pollute the steady-state figure, while the cold
  * figure stays an honest first-execution measurement). Profiling
  * showed compile cost is ~0.3–0.5 s per query at tiny SF — a fixed
  * per-query-SHAPE cost that amortizes to noise on a cluster running
  * a query over 100 TB, which is why both numbers are reported: cold
  * bounds the worst case, warm approximates the steady-state marginal
  * cost that actually scales.
  *
  * `queries_gc_ms` records the JVM GC time attributed to each COLD
  * run. Round 2's driver artifact carried a 5.07 s cold entry for
  * q16_json_extract that no re-run reproduces (0.68–0.76 s across
  * repeated identical invocations; the query scans a 0.1 MB parquet
  * column — IO cannot explain it). The per-query GC delta makes any
  * future one-off stall self-diagnosing in the artifact itself. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + parquet reader + codegen + one shuffle + noop sink
    try {
      import org.apache.spark.sql.functions._
      spark.range(1000).selectExpr("id % 7 k", "id v").groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
      Tables.lineitem(spark, sfDir).select(count(lit(1))).count()
      Tables.documents(spark, sfDir).select(count(lit(1))).count()
    } catch { case _: Throwable => () }

    /** Full-result materialization: the noop sink consumes every row
      * and every column of the final plan but writes nothing. */
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, None)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (-(System.nanoTime() - t0) / 1e9, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).filter(_ > 0).sum

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val gc0 = gcMillis()
      val (cold, coldErr) = run(name, fn)
      val gcCold = gcMillis() - gc0
      // warm = best of two re-runs: min-of-k is robust to a one-off
      // GC/safepoint stall landing in a single re-run. Only
      // SUCCESSFUL runs compete — a failed run's negative sentinel
      // must not win min() over a valid measurement.
      val (warm, warmErr) = if (coldErr.isEmpty) {
        val runs = Seq(run(name, fn), run(name, fn))
        val oks = runs.filter(_._2.isEmpty)
        // min over successes for the time, but ANY re-run failure
        // still surfaces in errors/n_failed — intermittent
        // re-execution flakiness must not vanish from the artifact
        if (oks.nonEmpty) (oks.map(_._1).min, runs.flatMap(_._2).headOption)
        else (runs.head._1, runs.head._2)
      } else (cold, coldErr)
      (name, cold, warm, gcCold, coldErr.orElse(warmErr.map("warm run: " + _)))
    }
    // full JSON string escape (backslash, quote, ALL control chars) —
    // Spark exception messages can carry arbitrary bytes, and one bad
    // char would invalidate the driver's json.load of this line.
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // 0.1 ms resolution: sub-tenth-of-a-millisecond digits are noise
    // at local[32] and roughly halve the line length, which matters
    // because the driver stores only the tail of the process output.
    def jnum(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(f: ((String, Double, Double, Long, Option[String])) => (String, Double)): String =
      results.map { r => val (k, v) = f(r); "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val qs = jmap { case (k, cold, _, _, _) => (k, cold) }
    val qsWarm = jmap { case (k, _, warm, _, _) => (k, warm) }
    // only nonzero GC entries carry signal (the map exists to make a
    // one-off GC stall self-diagnosing); zeros just pad the line.
    val qsGc = results.collect { case (k, _, _, gc, _) if gc > 0 => "\"" + k + "\":" + gc }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(m)) =>
      "\"" + k + "\":" + jstr(m.take(160))
    }.mkString("{", ",", "}")
    // totals sum successful queries only; a failed query cannot fabricate
    // a time, so failure is surfaced loudly instead: n_failed at top
    // level, a negative per-query entry, and an errors message.
    val nFailed = results.count(_._5.isDefined)
    val total = results.map { case (_, v, _, _, _) => math.max(v, 0.0) }.sum
    val totalWarm = results.map { case (_, _, v, _, _) => math.max(v, 0.0) }.sum
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","value_warm":${jnum(totalWarm)},""" +
      s""""n_failed":$nFailed,"queries":$qs,"queries_warm":$qsWarm,"queries_gc_ms":$qsGc,""" +
      s""""errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
