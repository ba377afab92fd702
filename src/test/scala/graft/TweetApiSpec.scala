package graft

import org.apache.spark.sql.functions._
import graft.api.TweetApi

/** API façade semantics: summary endpoints agree; the rollup total is
  * distinguishable from a NULL-labeled data group. */
class TweetApiSpec extends SparkSpec {
  import spark.implicits._

  private def tweetsFixture = Seq(
    ("1", "positive", 0.9, 10L, 2L),
    ("2", "positive", 0.8, 5L, 1L),
    ("3", "negative", 0.7, 3L, 0L),
    ("4", null.asInstanceOf[String], 0.0, 1L, 0L)) // un-analyzed row
    .toDF("tweet_id", "final_sentiment", "confidence_score", "like_count", "retweet_count")
    .withColumn("processed_at", current_timestamp())

  test("summaryWithTotal distinguishes the grand total from a NULL-labeled group") {
    val rows = TweetApi.summaryWithTotal(tweetsFixture, hours = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("ALL") == 4L, s"grand total must cover all rows: $rows")
    assert(rows("unscored") == 1L, s"NULL-labeled group must surface separately: $rows")
    assert(rows("positive") == 2L && rows("negative") == 1L)
  }

  test("summary and summaryWithTotal report identical per-group numbers") {
    val plain = TweetApi.summary(tweetsFixture, hours = 1).collect()
      .map(r => Option(r.getString(0)).getOrElse("unscored") ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val total = TweetApi.summaryWithTotal(tweetsFixture, hours = 1).collect()
      .filter(_.getString(0) != "ALL")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(plain == total, s"plain=$plain withTotal=$total")
  }

  test("recentTweets: top-k by recency with optional sentiment filter") {
    val out = TweetApi.recentTweets(tweetsFixture, limit = 2, sentiment = Some("positive"))
      .select("tweet_id").as[String].collect()
    assert(out.length == 2 && out.forall(Set("1", "2")))
    assert(TweetApi.recentTweets(tweetsFixture, limit = 10).count() == 4)
  }

  test("health reports liveness stats") {
    val h = TweetApi.health(tweetsFixture).head()
    assert(h.getLong(0) == 4L)
    assert(h.getTimestamp(1) != null)
  }
}
