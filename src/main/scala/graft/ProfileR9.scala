package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 profile: decompose q43_minhash_dedup's warm cost (the one
  * compute-priced query ~9× over the DuckDB oracle at sf0.1). The
  * hypotheses from VERDICT r8: (a) signature re-evaluation before the
  * localCheckpoint; (b) band explode width; plus a round-9 one: (c)
  * the sf0.1 documents.parquet is 0.6 MB = ONE input split, so the
  * k=128 MinHash signature compute — the only CPU-heavy step — runs
  * on a single task while 31 cores idle. */
object ProfileR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.expressions._

    def time(label: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r9] $label%-52s cold ${times.head}%.2f  best-warm ${times.min}%.2f s")
    }
    def timeUnit(label: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[r9] $label%-52s cold ${times.head}%.2f  best-warm ${times.min}%.2f s")
    }

    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).select(count(lit(1))).count()

    val bands = 16; val rowsPerBand = 8; val k = bands * rowsPerBand

    // ---- step decomposition ----
    timeUnit("sig localCheckpoint (as-shipped, 1 input split)") {
      Tables.documents(spark, sfDir)
        .select($"doc_id", minhash_signature(split(trim($"text"), "\\s+"), n = 3, k = k, seed = 42).as("sig"))
        .localCheckpoint()
    }
    timeUnit("sig localCheckpoint after repartition(32)") {
      Tables.documents(spark, sfDir)
        .select($"doc_id", $"text").repartition(32)
        .select($"doc_id", minhash_signature(split(trim($"text"), "\\s+"), n = 3, k = k, seed = 42).as("sig"))
        .localCheckpoint()
    }
    val sig = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").repartition(32)
      .select($"doc_id", minhash_signature(split(trim($"text"), "\\s+"), n = 3, k = k, seed = 42).as("sig"))
      .localCheckpoint()
    time("banding+bucketMin+verify from warm sig") {
      val banded = sig.select($"doc_id", posexplode(
        array((0 until bands).map(b => xxhash64(slice($"sig", b * rowsPerBand + 1, rowsPerBand))): _*)))
        .toDF("doc_id", "band", "band_sig")
      val bucketMin = banded.groupBy($"band", $"band_sig").agg(min($"doc_id").as("min_id"))
      val estJ = aggregate(
        zip_with($"sig", $"min_sig", (a, b) => when(a === b, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / k
      val dropped = banded.join(bucketMin, Seq("band", "band_sig"))
        .filter($"doc_id" > $"min_id")
        .select($"doc_id", $"min_id").distinct()
        .join(sig, Seq("doc_id"))
        .join(sig.select($"doc_id".as("min_id"), $"sig".as("min_sig")), Seq("min_id"))
        .withColumn("est_j", estJ)
        .filter($"est_j" >= 0.9)
        .groupBy($"doc_id")
        .agg(min($"min_id").as("dup_of"), round(min_by($"est_j", $"min_id"), 4).as("est_jaccard"))
      sig.join(dropped, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"dup_of", $"doc_id").as("keeper_id"),
          $"dup_of".isNotNull.as("is_dup"), coalesce($"est_jaccard", lit(1.0)).as("est_jaccard"))
    }
    // ---- end-to-end shipped forms ----
    time("q43 minhashDedup (base op, as shipped)")(
      graft.queries.DedupQueries.minhashDedup(spark, sfDir))
    time("q43 minhashDedupValidated (registered)")(
      graft.queries.DedupQueries.minhashDedupValidated(spark, sfDir))

    spark.stop()
  }
}
