package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler: times labeled sub-plans of expensive queries
  * (noop-materialized, post-warm-up) so optimization targets the real
  * cost, not a guess. Not part of the driver contract. */
object Profile {
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

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warm-up
    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).select(count(lit(1))).count()

    import graft.functions.expressions._
    import graft.queries.DedupQueries.shingles
    val tokens = (c: org.apache.spark.sql.Column) => split(trim(c), "\\s+")

    time("q43 full")(graft.queries.DedupQueries.minhashDedup(spark, sfDir))
    time("docs scan only")(Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    time("tokenize")(Tables.documents(spark, sfDir).select($"doc_id", tokens($"text").as("t")))
    time("shingles")(Tables.documents(spark, sfDir)
      .select($"doc_id", shingles(tokens($"text"), 3).as("sh")))
    time("fused sig n=3 k=128")(Tables.documents(spark, sfDir)
      .select($"doc_id", minhash_signature(tokens($"text"), n = 3, k = 128, seed = 42).as("sig")))
    time("q43 full again")(graft.queries.DedupQueries.minhashDedup(spark, sfDir))

    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"label", $"embedding")
    val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("emb_a"))
    val b = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("emb_b"))
    time("q45 pairs join only")(
      a.join(b, Seq("label")).filter($"id_b" > $"id_a").select($"id_a", $"id_b"))
    time("q45 pairs + cosine")(
      a.join(b, Seq("label")).filter($"id_b" > $"id_a")
        .select($"id_a", $"id_b", cosine_similarity($"emb_a", $"emb_b").as("c")))
    time("q45 full")(graft.queries.DedupQueries.embeddingNearDups(spark, sfDir))
    time("q47 full")(graft.queries.SimilarityQueries.nnWithinLabel(spark, sfDir))

    // fixed-cost decomposition
    time("floor: docs project only")(
      Tables.documents(spark, sfDir).select($"doc_id", length($"text").as("l")))
    time("floor + global orderBy")(
      Tables.documents(spark, sfDir).select($"doc_id", length($"text").as("l"))
        .orderBy($"doc_id"))
    time("floor + repart1 sortWithin")(
      Tables.documents(spark, sfDir).select($"doc_id", length($"text").as("l"))
        .repartition(1).sortWithinPartitions($"doc_id"))
    // IVF end-to-end (the sub-plan decomposition that diagnosed the
    // broadcast-of-probe-side pathology lived here temporarily; the
    // conclusion — shuffle-hash the cell join — is recorded in
    // BENCH_NOTES.md and encoded in SimilarityQueries.ivfNn itself,
    // so Profile measures only the real query and cannot drift from it)
    time("ivf full")(graft.queries.SimilarityQueries.ivfNn(spark, sfDir))
    val vaderUdf = udf((t: String) => graft.functions.Vader.score(t))
    val vaderNoSort = Tables.documents(spark, sfDir)
      .withColumn("v", vaderUdf(graft.queries.TextQueries.cleanText($"text")))
      .select($"doc_id", $"v.compound".as("compound"))
    time("q33 as-is")(graft.queries.SentimentQueries.vaderDocs(spark, sfDir))
    time("q33-like no sort")(vaderNoSort)
    time("q33-like repart1 sort")(vaderNoSort.repartition(1).sortWithinPartitions($"doc_id"))
    time("q09 as-is")(graft.queries.Relational.distinctParts(spark, sfDir))
    time("q33 again")(graft.queries.SentimentQueries.vaderDocs(spark, sfDir))
    time("q09 again")(graft.queries.Relational.distinctParts(spark, sfDir))
    spark.stop()
  }
}
