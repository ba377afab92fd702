package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextBlobOps, Vader}
import graft.api.TweetApi

/** Analyzer goldens on the reference's smoke texts
  * (test_setup.py:102-107) + totality properties (SURVEY §5.3). */
class SentimentSpec extends AnyFunSuite {

  /** Fixed-seed fuzz corpus (scalacheck-style totality probing without
    * the scalatestplus bridge, which is not in the offline cache). */
  private def fuzzStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val pool = "abcdefghij !?.,'\t\nGOODBADnotvery\u00e9\u4e2d\ud83d\ude00"
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => pool(rnd.nextInt(pool.length))).mkString
    } ++ Seq(null, "", "   ", "!!!!", "not not not good", "VERY BAD!!")
  }

  private val golden = Seq(
    "I love this amazing product!",  // expect positive
    "This is terribel and awful.",   // expect negative (note misspelling)
    "It's okay, nothing special.",   // expect mild/neutral-ish
    "Best day ever! So excited!")    // expect positive

  test("VADER golden labels") {
    val s0 = Vader.score(golden(0))
    assert(s0.compound >= 0.05, s"expected positive, got $s0")
    val s1 = Vader.score(golden(1))
    assert(s1.compound <= -0.05, s"expected negative, got $s1")
    val s3 = Vader.score(golden(3))
    assert(s3.compound >= 0.05, s"expected positive, got $s3")
    // golden(2) "It's okay, nothing special." — mild, not strongly
    // polar. With round-2 lexicon coverage "special" is negated by
    // "nothing" → slightly negative (the real VADER library scores
    // this sentence ≈ −0.09 too), so the window is symmetric.
    val s2 = Vader.score(golden(2))
    assert(s2.compound > -0.4 && s2.compound < 0.4, s"expected mild, got $s2")
  }

  test("VADER empty/null → neutral defaults {0,0,0,1}") {
    assert(Vader.score(null) == Vader.Neutral)
    assert(Vader.score("") == Vader.Neutral)
    assert(Vader.score("   ") == Vader.Neutral)
    assert(Vader.score("the of and") == Vader.Neutral) // no lexicon hits
  }

  test("VADER rules: negation flips, booster amplifies, caps amplify, '!' amplifies") {
    val base = Vader.score("this is good").compound
    assert(Vader.score("this is not good").compound < 0, "negation should flip")
    assert(Vader.score("this is very good").compound > base, "booster should amplify")
    assert(Vader.score("this is GOOD").compound > base, "caps should amplify")
    assert(Vader.score("this is good!").compound > base, "exclamation should amplify")
    val but = Vader.score("good but awful")
    assert(but.compound < 0, "'but' clause should dominate")
    // "no" carries BOTH a lexicon valence and negation duty; negation
    // must not be gated on the preceding word lacking a valence
    // (ADVICE r02: "no good" kept +1.9 instead of flipping)
    assert(Vader.score("no good").compound < 0, "negation by 'no' should flip")
    assert(Vader.score("there is no hope").compound < 0, "'no hope' should flip")
  }

  test("VADER totality: never throws; compound ∈ [-1,1]; proportions sum ≈ 1") {
    fuzzStrings(300).foreach { s =>
      val r = Vader.score(s)
      assert(r.compound >= -1.0 && r.compound <= 1.0)
      assert(r.positive >= 0 && r.negative >= 0 && r.neutral >= 0)
      assert(math.abs(r.positive + r.negative + r.neutral - 1.0) < 0.01 ||
        (r.positive == 0 && r.negative == 0 && r.neutral == 1.0))
    }
  }

  test("TextBlob golden polarity signs") {
    assert(TextBlobOps.score(golden(0)).polarity > 0.1)
    assert(TextBlobOps.score(golden(1)).polarity < -0.1)
    assert(TextBlobOps.score(golden(3)).polarity > 0.1)
    assert(TextBlobOps.score("").polarity == 0.0)
    assert(TextBlobOps.score(null) == TextBlobOps.Neutral)
  }

  test("TextBlob modifiers: intensifier scales, negator halves and flips") {
    val base = TextBlobOps.score("good").polarity
    assert(TextBlobOps.score("very good").polarity > base)
    val neg = TextBlobOps.score("not good").polarity
    assert(neg < 0 && math.abs(neg) < base)
  }

  test("TextBlob totality: polarity ∈ [-1,1], subjectivity ∈ [0,1]") {
    fuzzStrings(300).foreach { s =>
      val r = TextBlobOps.score(s)
      assert(r.polarity >= -1.0 && r.polarity <= 1.0)
      assert(r.subjectivity >= 0.0 && r.subjectivity <= 1.0)
    }
  }

  test("60 pinned fixture goldens regression-lock q33/q34/q35 analyzer outputs") {
    // (doc_id, vader compound/pos/neg/neu, textblob polarity/subjectivity)
    // over the first 60 sf0.001 documents, scored through the exact
    // q33/q34 path (cleanText → analyzer). Regenerate via graft.GoldenGen
    // ONLY for a deliberate analyzer change — any unexplained diff here
    // is a regression in lexicon, rules, or cleaning.
    val pinned = Seq(
      (0L, 0.2960, 0.091, 0.000, 0.909, -0.0250, 0.5000),
      (1L, -0.2960, 0.076, 0.102, 0.822, -0.1423, 0.4231),
      (2L, 0.5267, 0.095, 0.032, 0.874, -0.0792, 0.3750),
      (3L, 0.0000, 0.117, 0.117, 0.765, -0.0786, 0.4857),
      (4L, 0.0000, 0.066, 0.066, 0.868, -0.1500, 0.4500),
      (5L, 0.2960, 0.094, 0.047, 0.858, -0.1000, 0.3778),
      (6L, 0.2960, 0.093, 0.070, 0.837, -0.0500, 0.3917),
      (7L, -0.5267, 0.000, 0.095, 0.905, -0.1500, 0.2500),
      (8L, 0.0000, 0.054, 0.054, 0.891, -0.0864, 0.3273),
      (9L, -0.5267, 0.000, 0.115, 0.885, -0.2000, 0.3000),
      (10L, -0.5267, 0.073, 0.146, 0.781, -0.1182, 0.3545),
      (11L, 0.5267, 0.050, 0.000, 0.950, -0.0143, 0.3286),
      (12L, 0.0000, 0.053, 0.053, 0.894, -0.0864, 0.3273),
      (13L, 0.0000, 0.045, 0.045, 0.911, -0.1214, 0.3429),
      (14L, 0.2960, 0.124, 0.062, 0.815, -0.0800, 0.4800),
      (15L, -0.2960, 0.142, 0.213, 0.645, -0.1250, 0.4667),
      (16L, 0.0000, 0.090, 0.090, 0.820, -0.0400, 0.4200),
      (17L, -0.2960, 0.034, 0.067, 0.899, -0.1300, 0.3800),
      (18L, -0.2960, 0.000, 0.064, 0.936, -0.2750, 0.4000),
      (19L, -0.2960, 0.044, 0.089, 0.867, -0.1300, 0.3800),
      (20L, 0.0000, 0.070, 0.070, 0.860, -0.0778, 0.3444),
      (21L, 0.2960, 0.048, 0.024, 0.929, -0.0444, 0.3111),
      (22L, 0.7783, 0.096, 0.000, 0.904, -0.0222, 0.4556),
      (23L, 0.2960, 0.041, 0.000, 0.959, -0.0600, 0.3200),
      (24L, 0.2960, 0.069, 0.035, 0.896, -0.0929, 0.4143),
      (25L, 0.2960, 0.066, 0.000, 0.934, 0.2000, 0.6000),
      (26L, -0.5267, 0.046, 0.092, 0.861, -0.1409, 0.3818),
      (27L, 0.0000, 0.000, 0.000, 1.000, -0.2500, 0.4000),
      (28L, -0.2960, 0.025, 0.049, 0.926, -0.1045, 0.2818),
      (29L, -0.5267, 0.050, 0.100, 0.850, -0.1800, 0.4400),
      (30L, 0.0000, 0.065, 0.065, 0.871, -0.1083, 0.4000),
      (31L, -0.2960, 0.049, 0.073, 0.878, -0.1250, 0.4125),
      (32L, -0.5267, 0.000, 0.161, 0.839, -0.2125, 0.3250),
      (33L, -0.5267, 0.000, 0.328, 0.672, -0.3000, 0.4000),
      (34L, -0.5267, 0.026, 0.079, 0.895, -0.1545, 0.3364),
      (35L, -0.5267, 0.104, 0.146, 0.750, -0.1028, 0.4056),
      (36L, 0.9081, 0.178, 0.000, 0.822, -0.0062, 0.4312),
      (37L, -0.2960, 0.048, 0.096, 0.855, -0.0800, 0.3200),
      (38L, -0.5267, 0.000, 0.055, 0.945, -0.1929, 0.3143),
      (39L, 0.2960, 0.073, 0.036, 0.891, -0.1000, 0.3778),
      (40L, -0.5267, 0.082, 0.246, 0.672, -0.1900, 0.4400),
      (41L, 0.2960, 0.129, 0.086, 0.784, -0.0714, 0.4857),
      (42L, 0.2960, 0.121, 0.097, 0.782, -0.0265, 0.3353),
      (43L, 0.2960, 0.104, 0.078, 0.818, -0.0389, 0.4556),
      (44L, 0.5267, 0.104, 0.000, 0.896, 0.2000, 0.6000),
      (45L, -0.5267, 0.000, 0.136, 0.864, -0.2200, 0.3400),
      (46L, 0.2960, 0.124, 0.062, 0.815, -0.0300, 0.4200),
      (47L, 0.0000, 0.068, 0.068, 0.864, -0.0333, 0.3667),
      (48L, 0.2960, 0.096, 0.048, 0.855, 0.0200, 0.3600),
      (49L, 0.5267, 0.060, 0.000, 0.940, 0.0214, 0.2857),
      (50L, 0.2960, 0.095, 0.000, 0.905, -0.0250, 0.5000),
      (51L, -0.5267, 0.050, 0.151, 0.799, -0.1188, 0.3125),
      (52L, 0.2960, 0.052, 0.000, 0.948, -0.0750, 0.3750),
      (53L, -0.7783, 0.029, 0.144, 0.827, -0.1550, 0.3300),
      (54L, -0.5267, 0.045, 0.091, 0.864, -0.1083, 0.3333),
      (55L, 0.0000, 0.087, 0.087, 0.827, -0.0643, 0.3714),
      (56L, 0.5267, 0.075, 0.000, 0.925, 0.1333, 0.4333),
      (57L, -0.2960, 0.118, 0.237, 0.645, -0.1800, 0.4400),
      (58L, 0.5267, 0.216, 0.000, 0.784, -0.0250, 0.5000),
      (59L, 0.6808, 0.146, 0.058, 0.796, -0.0100, 0.4700))

    val spark = TestSpark.spark
    import spark.implicits._
    val cleaned = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", graft.queries.TextQueries.cleanText($"text").as("c"))
      .orderBy($"doc_id").limit(60).as[(Long, String)].collect().toMap
    pinned.foreach { case (id, comp, pos, neg, neu, pol, sub) =>
      val v = Vader.score(cleaned(id))
      val t = TextBlobOps.score(cleaned(id))
      def ≈(a: Double, b: Double) = math.abs(a - b) < 5e-5
      assert(≈(v.compound, comp) && ≈(v.positive, pos) &&
        ≈(v.negative, neg) && ≈(v.neutral, neu),
        s"VADER drift on doc $id: got $v, pinned ($comp,$pos,$neg,$neu)")
      assert(≈(t.polarity, pol) && ≈(t.subjectivity, sub),
        s"TextBlob drift on doc $id: got $t, pinned ($pol,$sub)")
    }
  }

  test("analyze endpoint: golden ensemble labels and confidence bounds") {
    val r0 = TweetApi.analyze(golden(0))
    assert(r0.sentiment == "positive")
    assert(r0.confidence > 0 && r0.confidence <= 1.0)
    val r1 = TweetApi.analyze(golden(1))
    assert(r1.sentiment == "negative")
    val rEmpty = TweetApi.analyze("")
    assert(rEmpty.sentiment == "neutral" && rEmpty.confidence == 0.0)
  }
}
