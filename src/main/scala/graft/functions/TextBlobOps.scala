package graft.functions

/** TextBlob-style pattern-lexicon sentiment (SURVEY C8).
  *
  * Re-implements the averaging algorithm of TextBlob's
  * `PatternAnalyzer` (the library the reference calls at
  * sentiment_analysis.py:249-272): each lexicon word carries
  * (polarity ∈ [−1,1], subjectivity ∈ [0,1]); document polarity /
  * subjectivity are the arithmetic means over matched words, with
  * preceding-word modifiers:
  *  - intensifiers multiply the next match's polarity and
  *    subjectivity by 1.3 (capped into range);
  *  - negators multiply the next match's polarity by −0.5.
  *
  * The en-sentiment.xml lexicon ships with the pip package and is not
  * reproducible offline; this embeds a compact subset (same coverage
  * rationale as [[Vader]]). Empty/null/no-match → (0.0, 0.0), matching
  * the reference's error default (sentiment_analysis.py:268-272).
  */
object TextBlobOps extends Serializable {

  final case class Scores(polarity: Double, subjectivity: Double)
  val Neutral: Scores = Scores(0.0, 0.0)

  // (polarity, subjectivity)
  private[graft] val lexicon: Map[String, (Double, Double)] = Map(
    "love" -> (0.5, 0.6), "loved" -> (0.7, 0.8), "lovely" -> (0.5, 0.75),
    "amazing" -> (0.6, 0.9), "awesome" -> (1.0, 1.0), "excellent" -> (1.0, 1.0),
    "fantastic" -> (0.4, 0.9), "great" -> (0.8, 0.75), "good" -> (0.7, 0.6),
    "best" -> (1.0, 0.3), "better" -> (0.5, 0.5), "happy" -> (0.8, 1.0),
    "glad" -> (0.5, 1.0), "excited" -> (0.375, 0.75), "exciting" -> (0.3, 0.8),
    "perfect" -> (1.0, 1.0), "nice" -> (0.6, 1.0), "cool" -> (0.35, 0.65),
    "beautiful" -> (0.85, 1.0), "brilliant" -> (0.9, 0.9), "wonderful" -> (1.0, 1.0),
    "super" -> (0.3, 0.3), "fun" -> (0.3, 0.2), "funny" -> (0.25, 1.0),
    "strong" -> (0.4, 0.5), "impressive" -> (1.0, 1.0), "easy" -> (0.43, 0.83),
    "free" -> (0.4, 0.8), "useful" -> (0.3, 0.0), "helpful" -> (0.4, 0.0),
    "fast" -> (0.2, 0.6), "reliable" -> (0.3, 0.4), "delicious" -> (1.0, 1.0),
    "favorite" -> (0.5, 0.6), "epic" -> (0.6, 0.8), "proud" -> (0.6, 0.8),
    "new" -> (0.136, 0.45), "special" -> (0.357, 0.57), "okay" -> (0.5, 0.5),
    "ok" -> (0.5, 0.5), "interesting" -> (0.5, 0.5), "pretty" -> (0.25, 1.0),
    "hate" -> (-0.8, 0.9), "hated" -> (-0.9, 0.7), "terrible" -> (-1.0, 1.0),
    "terribel" -> (-1.0, 1.0), "awful" -> (-1.0, 1.0), "horrible" -> (-1.0, 1.0),
    "bad" -> (-0.7, 0.67), "worse" -> (-0.5, 0.5), "worst" -> (-1.0, 1.0),
    "sad" -> (-0.5, 1.0), "unhappy" -> (-0.6, 0.8), "angry" -> (-0.5, 1.0),
    "mad" -> (-0.625, 0.9), "furious" -> (-0.8, 0.9), "fail" -> (-0.5, 0.5),
    "failed" -> (-0.6, 0.6), "failure" -> (-0.6, 0.6), "broken" -> (-0.4, 0.5),
    "slow" -> (-0.3, 0.4), "expensive" -> (-0.25, 0.7), "poor" -> (-0.4, 0.6),
    "disappointing" -> (-0.6, 0.7), "disappointed" -> (-0.75, 0.75),
    "boring" -> (-1.0, 1.0), "annoying" -> (-0.8, 1.0), "ugly" -> (-0.7, 1.0),
    "stupid" -> (-0.8, 0.9), "dumb" -> (-0.7, 0.8), "useless" -> (-0.5, 0.4),
    "wrong" -> (-0.5, 0.5), "disgusting" -> (-1.0, 1.0), "gross" -> (-0.6, 0.9),
    "pathetic" -> (-1.0, 1.0), "dead" -> (-0.2, 0.4), "old" -> (0.1, 0.2),
    "small" -> (-0.25, 0.4), "big" -> (0.0, 0.1), "hard" -> (-0.29, 0.54),
  )

  private val intensifiers: Set[String] = Set(
    "very", "really", "extremely", "so", "absolutely", "completely",
    "highly", "incredibly", "totally", "utterly", "quite", "too",
  )
  private val negators: Set[String] = Set(
    "not", "never", "no", "nothing", "neither", "nor",
    "dont", "don't", "doesnt", "doesn't", "isnt", "isn't", "wasnt",
    "wasn't", "cant", "can't", "cannot", "wont", "won't",
  )

  private def clamp(x: Double, lo: Double, hi: Double): Double =
    if (x < lo) lo else if (x > hi) hi else x

  /** Score one document: mean (polarity, subjectivity) over lexicon
    * matches with modifier handling. Pure, total, deterministic. */
  def score(text: String): Scores = {
    if (text == null) return Neutral
    val words = text.trim.toLowerCase.split("\\s+").toIndexedSeq
      .map(_.filter(c => c.isLetterOrDigit || c == '\'')).filter(_.nonEmpty)
    if (words.isEmpty) return Neutral

    var pSum = 0.0; var sSum = 0.0; var n = 0
    var i = 0
    while (i < words.length) {
      lexicon.get(words(i)).foreach { case (p0, s0) =>
        var p = p0; var sub = s0
        if (i > 0) {
          val prev = words(i - 1)
          if (intensifiers.contains(prev)) { p = clamp(p * 1.3, -1.0, 1.0); sub = clamp(sub * 1.3, 0.0, 1.0) }
          else if (negators.contains(prev)) p = p * -0.5
        }
        pSum += p; sSum += sub; n += 1
      }
      i += 1
    }
    if (n == 0) Neutral
    else Scores(math.rint(pSum / n * 10000) / 10000, math.rint(sSum / n * 10000) / 10000)
  }
}
