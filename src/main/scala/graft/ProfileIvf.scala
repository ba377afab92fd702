package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 IVF drill-down: pair volume, cell histogram, stage costs. */
object ProfileIvf {
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

    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    Tables.embeddings(spark, sfDir).select(count(lit(1))).count()

    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ivf] $label%-46s cold ${ts.head}%.2f warm ${ts.min}%.2f")
    }

    val cells = graft.queries.SimilarityQueries.debugCells(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val b = e.select($"vec_id".as("id_b"), cells._1.as("cell"))
    val a = e.select($"vec_id".as("id_a"), explode(cells._2).as("cell"))
    println("[ivf] cell histogram (b side):")
    b.groupBy($"cell").count().orderBy($"cell").collect()
      .foreach(r => println(s"[ivf]   cell ${r.get(0)} -> ${r.get(1)}"))
    val nPairs = a.join(b, Seq("cell")).filter($"id_a" =!= $"id_b").count()
    println(s"[ivf] candidate pairs: $nPairs")

    time("assign b only")(b)
    time("probe a only")(a)
    time("join ids only")(
      a.hint("shuffle_hash").join(b, Seq("cell")).filter($"id_a" =!= $"id_b"))
    time("join ids only NO hint")(
      a.join(b, Seq("cell")).filter($"id_a" =!= $"id_b"))

    // synthetic same-shape join: 8000 x 2000 on 16 keys -> 1M rows
    val sa = spark.range(8000).select(($"id" % 16).as("cell"), $"id".as("id_a"))
    val sb = spark.range(2000).select(($"id" % 16).as("cell"), $"id".as("id_b"))
    time("synthetic join 1M out")(
      sa.hint("shuffle_hash").join(sb, Seq("cell")).filter($"id_a" =!= $"id_b"))
    // precomputed cells via checkpoint, then join
    val bm = b.localCheckpoint()
    val am = a.localCheckpoint()
    time("join from checkpointed sides")(
      am.hint("shuffle_hash").join(bm, Seq("cell")).filter($"id_a" =!= $"id_b"))
    spark.stop()
  }
}
