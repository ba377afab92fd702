package graft

import org.apache.spark.sql.functions._
import graft.functions.Ensemble

/** C2–C6 threshold/ensemble exactness, incl. boundary values ±0.05,
  * ±0.1, the ×1.2 agreement boost and the 1.0 cap (SURVEY §5.1). */
class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  private def labelOfCompound(c: Double): String =
    Seq(c).toDF("compound")
      .select(Ensemble.vaderLabel(col("compound"))).as[String].head()

  private def labelOfPolarity(p: Double): String =
    Seq(p).toDF("polarity")
      .select(Ensemble.textblobLabel(col("polarity"))).as[String].head()

  test("C2 VADER thresholds incl. boundaries (≥0.05 / ≤-0.05)") {
    assert(labelOfCompound(0.05) == "positive")   // boundary inclusive
    assert(labelOfCompound(0.0499) == "neutral")
    assert(labelOfCompound(-0.05) == "negative")  // boundary inclusive
    assert(labelOfCompound(-0.0499) == "neutral")
    assert(labelOfCompound(0.9) == "positive")
    assert(labelOfCompound(-0.9) == "negative")
  }

  test("C3 TextBlob thresholds excl. boundaries (>0.1 / <-0.1)") {
    assert(labelOfPolarity(0.1) == "neutral")     // boundary exclusive
    assert(labelOfPolarity(0.1001) == "positive")
    assert(labelOfPolarity(-0.1) == "neutral")
    assert(labelOfPolarity(-0.1001) == "negative")
  }

  test("C4/C5/C6: all 9 label combinations produce reference values") {
    // (vader, textblob) -> (final, confidence): combined = 0.6v+0.4t,
    // label at ±0.1, conf = min(|combined| * (1.2 if agree), 1.0).
    val cases = Seq(
      ("positive", "positive", "positive", 1.0),   // 1.0*1.2 capped
      ("positive", "neutral", "positive", 0.6),
      ("positive", "negative", "positive", 0.2),   // ties to VADER sign per C5
      ("neutral", "positive", "positive", 0.4),
      ("neutral", "neutral", "neutral", 0.0),
      ("neutral", "negative", "negative", 0.4),
      ("negative", "positive", "negative", 0.2),
      ("negative", "neutral", "negative", 0.6),
      ("negative", "negative", "negative", 1.0))
    val df = cases.toDF("v", "t", "expLabel", "expConf")
    val combined = Ensemble.combinedScore(col("v"), col("t"))
    val out = df.select(col("expLabel"), col("expConf"),
        Ensemble.finalLabel(combined).as("label"),
        round(Ensemble.confidence(combined, col("v"), col("t")), 6).as("conf"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) == r.getString(0), s"label mismatch: $r")
      assert(math.abs(r.getDouble(3) - r.getDouble(1)) < 1e-9, s"confidence mismatch: $r")
    }
  }

  test("withSentiment produces the full enriched sentiment block") {
    val df = Seq("I love this amazing product!", "This is terribel and awful.", "")
      .toDF("cleaned_text")
    val out = Ensemble.withSentiment(df, "cleaned_text")
    val cols = out.columns.toSet
    Seq("sentiment_compound", "sentiment_positive", "sentiment_negative",
      "sentiment_neutral", "textblob_polarity", "textblob_subjectivity",
      "vader_sentiment", "textblob_sentiment", "final_sentiment",
      "confidence_score").foreach(c => assert(cols.contains(c), s"missing $c"))
    val rows = out.select("final_sentiment").as[String].collect()
    assert(rows(0) == "positive" && rows(1) == "negative" && rows(2) == "neutral")
  }
}
