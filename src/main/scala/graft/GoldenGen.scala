package graft

import org.apache.spark.sql.SparkSession

/** One-shot generator for SentimentSpec's pinned fixture goldens. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", graft.queries.TextQueries.cleanText($"text").as("c"))
      .orderBy($"doc_id").limit(60)
      .as[(Long, String)].collect()
    docs.foreach { case (id, clean) =>
      val v = graft.functions.Vader.score(clean)
      val t = graft.functions.TextBlobOps.score(clean)
      println(f"($id%dL, ${v.compound}%.4f, ${v.positive}%.3f, ${v.negative}%.3f, ${v.neutral}%.3f, ${t.polarity}%.4f, ${t.subjectivity}%.4f),")
    }
    spark.stop()
  }
}
