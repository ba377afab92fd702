package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's sentiment ensemble C2–C6 + composite C9 as pure
  * Catalyst column expressions (SURVEY §2.8) — everything downstream
  * of the two analyzers is built-in arithmetic + when/otherwise, so it
  * codegens and never leaves WholeStageCodegen.
  *
  * Thresholds and weights match sentiment_analysis.py exactly:
  *  - C2 VADER label: compound ≥ 0.05 → positive, ≤ −0.05 → negative
  *    (sentiment_analysis.py:224-229)
  *  - C3 TextBlob label: polarity > 0.1 / < −0.1 (…:257-262)
  *  - C4 label→score {positive:1, neutral:0, negative:−1} (…:284-287)
  *  - C5 combined = 0.6·vader + 0.4·textblob; label at ±0.1 (…:280-300)
  *  - C6 confidence = min(|combined| · (1.2 if agree), 1.0) (…:303-307)
  */
object Ensemble {

  // single source of truth for the reference's constants — shared by
  // the column expressions below and the scalar path (TweetApi.analyze)
  val VaderThreshold = 0.05
  val TextblobThreshold = 0.1
  val VaderWeight = 0.6
  val TextblobWeight = 0.4
  val FinalThreshold = 0.1
  val AgreementBoost = 1.2

  /** Scalar C2–C6 (driver-side /analyze path; numerically identical to
    * the column expressions). Returns (final label, confidence). */
  def scalarEnsemble(compound: Double, polarity: Double): (String, Double) = {
    val vLabel = if (compound >= VaderThreshold) "positive"
      else if (compound <= -VaderThreshold) "negative" else "neutral"
    val tLabel = if (polarity > TextblobThreshold) "positive"
      else if (polarity < -TextblobThreshold) "negative" else "neutral"
    def score(l: String) = l match { case "positive" => 1.0; case "negative" => -1.0; case _ => 0.0 }
    val combined = VaderWeight * score(vLabel) + TextblobWeight * score(tLabel)
    val label = if (combined > FinalThreshold) "positive"
      else if (combined < -FinalThreshold) "negative" else "neutral"
    val conf = math.min(math.abs(combined) * (if (vLabel == tLabel) AgreementBoost else 1.0), 1.0)
    (label, math.rint(conf * 10000) / 10000)
  }

  /** C2: VADER threshold classification. */
  def vaderLabel(compound: Column): Column =
    when(compound >= VaderThreshold, "positive")
      .when(compound <= -VaderThreshold, "negative")
      .otherwise("neutral")

  /** C3: TextBlob threshold classification. */
  def textblobLabel(polarity: Column): Column =
    when(polarity > TextblobThreshold, "positive")
      .when(polarity < -TextblobThreshold, "negative")
      .otherwise("neutral")

  /** C4: label → numeric score. */
  def labelScore(label: Column): Column =
    when(label === "positive", 1.0).when(label === "negative", -1.0).otherwise(0.0)

  /** C5: weighted combination of the two label scores. */
  def combinedScore(vaderLabel: Column, textblobLabel: Column): Column =
    labelScore(vaderLabel) * VaderWeight + labelScore(textblobLabel) * TextblobWeight

  /** C5: final ensemble label from the combined score. */
  def finalLabel(combined: Column): Column =
    when(combined > FinalThreshold, "positive")
      .when(combined < -FinalThreshold, "negative")
      .otherwise("neutral")

  /** C6: confidence = |combined|, ×AgreementBoost when both analyzers
    * agree, capped at 1.0. */
  def confidence(combined: Column, vaderLabel: Column, textblobLabel: Column): Column =
    least(abs(combined) *
      when(vaderLabel === textblobLabel, AgreementBoost).otherwise(1.0), lit(1.0))

  /** C9 composite: text column → the full 10-field sentiment block the
    * enriched-tweet schema carries (FIXTURES §1.2–1.3). Both analyzers
    * run inside ONE native [[AnalyzeSentiment]] expression (single
    * eval per row, no ScalaUDF encoder boundary); ensemble fields
    * derive as codegen'd columns. */
  def withSentiment(df: DataFrame, textCol: String): DataFrame = {
    val step = df
      .withColumn("_s", AnalyzeSentiment.analyze_sentiment(col(textCol)))
      .withColumn("sentiment_compound", col("_s.compound"))
      .withColumn("sentiment_positive", col("_s.positive"))
      .withColumn("sentiment_negative", col("_s.negative"))
      .withColumn("sentiment_neutral", col("_s.neutral"))
      .withColumn("textblob_polarity", col("_s.polarity"))
      .withColumn("textblob_subjectivity", col("_s.subjectivity"))
      .withColumn("vader_sentiment", vaderLabel(col("sentiment_compound")))
      .withColumn("textblob_sentiment", textblobLabel(col("textblob_polarity")))
    step
      .withColumn("_c", combinedScore(col("vader_sentiment"), col("textblob_sentiment")))
      .withColumn("final_sentiment", finalLabel(col("_c")))
      .withColumn("confidence_score",
        round(confidence(col("_c"), col("vader_sentiment"), col("textblob_sentiment")), 4))
      .drop("_s", "_c")
  }
}
