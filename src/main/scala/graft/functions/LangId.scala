package graft.functions

/** Character n-gram language identification — the classic profile-ranking
  * heuristic (Cavnar & Trenkle–style): score each candidate language by
  * hits of its most characteristic trigrams/function words, plus Unicode
  * script detection for CJK/Cyrillic where trigram evidence is
  * unnecessary. Deterministic; no model files.
  *
  * This is the typed-lane complement of TextOps.q32LangScore (the
  * declarative marker-word scorer with a DuckDB oracle): same shape of
  * evidence, richer profiles. Pure JVM functions — wrap in `udf(...)` at
  * the call site for ad-hoc column use; for bulk scoring prefer the
  * declarative scorer (codegen'd, no serialization).
  */
object LangId {

  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ", " to", "to "),
    "de" -> Seq("der", "ie ", " de", "che", "ein", "sch", "und", " un", "ich", "en ", "cht", " ge"),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", "que", " qu", "les", "ion", " et", "et "),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", "el ", " el", "ión", "ent", " en", "que", " qu"),
    "it" -> Seq(" di", "di ", " la", "la ", "to ", "re ", "ion", " co", "del", " de", "che", " ch"),
    "pt" -> Seq(" de", "de ", " da", "da ", "os ", "ão ", " co", "ent", " a ", "que", " qu", "ar "))

  /** Detect the dominant script; "" when Latin/other. */
  def script(text: String): String = {
    var cjk, cyr, latin = 0
    text.foreach { c =>
      val b = Character.UnicodeScript.of(c)
      if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL) cjk += 1
      else if (b == Character.UnicodeScript.CYRILLIC) cyr += 1
      else if (b == Character.UnicodeScript.LATIN) latin += 1
    }
    if (cjk > latin && cjk > cyr) "cjk"
    else if (cyr > latin) "cyr"
    else ""
  }

  /** Best-guess language code, "und" when there is no evidence. */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    script(text) match {
      case "cjk" => return "zh" // finer CJK split needs kana/hangul ratios
      case "cyr" => return "ru"
      case _     =>
    }
    val t = " " + text.toLowerCase.replaceAll("\\s+", " ") + " "
    val scores = profiles.view.mapValues { grams =>
      grams.map { g =>
        var c, i = 0
        while ({ i = t.indexOf(g, i); i >= 0 }) { c += 1; i += 1 }
        c
      }.sum
    }.toMap
    val best = scores.maxBy { case (lang, s) => (s, lang) } // deterministic tie-break
    if (best._2 == 0) "und" else best._1
  }
}
