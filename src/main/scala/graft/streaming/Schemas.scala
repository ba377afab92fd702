package graft.streaming

import org.apache.spark.sql.types._

/** All fixed StructTypes of the tweet pipeline (SURVEY §1.2-§1.3).
  * JSON on the stream is always parsed with these explicit schemas —
  * never inferSchema (deterministic, and lets the parser prune). */
object Schemas {

  /** Raw Kafka envelope (a): shape fixed by the producer's field list
    * (twitter_producer.py:56-63, expansions 69-70, assembly 185-188,
    * kafka_timestamp stamp 139). */
  val publicMetrics: StructType = StructType(Seq(
    StructField("retweet_count", LongType),
    StructField("like_count", LongType),
    StructField("reply_count", LongType),
    StructField("quote_count", LongType)))

  val envelope: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", StringType),
      StructField("text", StringType),
      StructField("created_at", StringType),
      StructField("author_id", StringType),
      StructField("lang", StringType),
      StructField("public_metrics", publicMetrics)))),
    StructField("includes", StructType(Seq(
      StructField("users", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("username", StringType),
        StructField("public_metrics", StructType(Seq(
          StructField("followers_count", LongType))))))))))),
    StructField("kafka_timestamp", LongType)))

  /** Enriched tweet (b): flat record built by the stream transform
    * (twitter_streamer.py:167-186) + the analyzer provenance columns
    * of the tweets table (sentiment_analysis.py:159-191, intended
    * 21-column write per SURVEY §2.2). */
  val enrichedTweet: StructType = StructType(Seq(
    StructField("tweet_id", StringType, nullable = false),
    StructField("tweet_text", StringType),
    StructField("cleaned_text", StringType),
    StructField("created_at", TimestampType),
    StructField("author_id", StringType),
    StructField("language", StringType),
    StructField("retweet_count", LongType),
    StructField("like_count", LongType),
    StructField("reply_count", LongType),
    StructField("quote_count", LongType),
    StructField("sentiment_compound", DoubleType),
    StructField("sentiment_positive", DoubleType),
    StructField("sentiment_negative", DoubleType),
    StructField("sentiment_neutral", DoubleType),
    StructField("textblob_polarity", DoubleType),
    StructField("textblob_subjectivity", DoubleType),
    StructField("vader_sentiment", StringType),
    StructField("textblob_sentiment", StringType),
    StructField("final_sentiment", StringType),
    StructField("confidence_score", DoubleType),
    StructField("kafka_timestamp", LongType),
    StructField("processed_at", TimestampType)))
}
