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
    // golden(2) "It's okay, nothing special." — mild, not strongly polar
    val s2 = Vader.score(golden(2))
    assert(s2.compound > -0.05 && s2.compound < 0.4, s"expected mild, got $s2")
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
