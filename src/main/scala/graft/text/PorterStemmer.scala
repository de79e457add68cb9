package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** Snowball English ("Porter2") stemmer, implemented from the published
  * algorithm (snowballstem.org/algorithms/english/stemmer.html).
  *
  * The reference engine stems via rust-stemmers' English algorithm
  * (lantern_extras/src/stemmers.rs:95-152), which is the same Snowball
  * definition; golden vectors in PorterStemmerSpec come from the
  * reference's own tests (e.g. lazy→lazi, jumps→jump).
  *
  * Input is expected lowercase (callers lowercase first, as the
  * reference does). Pure function — safe inside codegen'd expressions.
  */
object PorterStemmer {

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  // 'Y' marks a consonant y; never a vowel
  @inline private def isV(w: Array[Char], i: Int): Boolean =
    i >= 0 && i < w.length && isVowel(w(i)) && w(i) != 'Y'

  /** JVM entry for codegen'd expressions. */
  def stemUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))

  def stem(input: String): String = {
    if (input.length <= 2) return input
    var word = input
    if (word.startsWith("'")) word = word.substring(1)
    exceptions1.get(word) match {
      case Some(r) => return r
      case None =>
    }
    if (word.length <= 2) return word

    // mark consonant y's as Y
    val chars = word.toCharArray
    if (chars(0) == 'y') chars(0) = 'Y'
    var i = 1
    while (i < chars.length) {
      if (chars(i) == 'y' && isV(chars, i - 1)) chars(i) = 'Y'
      i += 1
    }
    word = new String(chars)

    val r1 = computeR1(word)
    val r2 = computeRNext(word, r1)

    word = step0(word)
    word = step1a(word)
    if (exceptions2.contains(word)) return word.replace('Y', 'y')
    word = step1b(word, r1)
    word = step1c(word)
    word = step2(word, r1)
    word = step3(word, r1, r2)
    word = step4(word, r2)
    word = step5(word, r1, r2)
    word.replace('Y', 'y')
  }

  private def computeR1(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen")) {
      if (w.startsWith(p)) return p.length
    }
    computeRNext(w, 0)
  }

  /** First position after a non-vowel that follows a vowel, at/after `from`. */
  private def computeRNext(w: String, from: Int): Int = {
    val a = w.toCharArray
    var i = from
    while (i < a.length - 1) {
      if (isV(a, i) && !isV(a, i + 1)) return i + 2
      i += 1
    }
    a.length
  }

  /** Short syllable at end of `w`:
    *  (a) ...non-vowel, vowel, non-vowel(not w/x/Y), or
    *  (b) word is exactly vowel + non-vowel.
    */
  private def endsWithShortSyllable(w: String): Boolean = {
    val a = w.toCharArray
    val n = a.length
    if (n == 2) return isV(a, 0) && !isV(a, 1)
    if (n >= 3) {
      val c = a(n - 1)
      return !isV(a, n - 3) && isV(a, n - 2) && !isV(a, n - 1) &&
        c != 'w' && c != 'x' && c != 'Y'
    }
    false
  }

  private def isShortWord(w: String, r1: Int): Boolean =
    endsWithShortSyllable(w) && r1 >= w.length

  private def hasVowel(w: String, until: Int): Boolean = {
    val a = w.toCharArray
    var i = 0
    while (i < until && i < a.length) {
      if (isV(a, i)) return true
      i += 1
    }
    false
  }

  private val doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private def endsWithDouble(w: String): Boolean =
    w.length >= 2 && doubles.contains(w.substring(w.length - 2))

  private val liEnding = "cdeghkmnrt".toSet

  private def step0(w: String): String = {
    if (w.endsWith("'s'")) w.dropRight(3)
    else if (w.endsWith("'s")) w.dropRight(2)
    else if (w.endsWith("'")) w.dropRight(1)
    else w
  }

  private def step1a(w: String): String = {
    if (w.endsWith("sses")) return w.dropRight(4) + "ss"
    if (w.endsWith("ied") || w.endsWith("ies")) {
      val stemPart = w.dropRight(3)
      return if (stemPart.length > 1) stemPart + "i" else stemPart + "ie"
    }
    if (w.endsWith("us") || w.endsWith("ss")) return w
    if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel not immediately
      // before the s
      if (hasVowel(w, w.length - 2)) return w.dropRight(1)
    }
    w
  }

  private def step1b(w: String, r1: Int): String = {
    if (w.endsWith("eedly")) {
      return if (w.length - 5 >= r1) w.dropRight(5) + "ee" else w
    }
    if (w.endsWith("eed")) {
      return if (w.length - 3 >= r1) w.dropRight(3) + "ee" else w
    }
    for (suf <- Seq("ingly", "edly", "ing", "ed")) {
      if (w.endsWith(suf)) {
        val stemPart = w.dropRight(suf.length)
        if (hasVowel(stemPart, stemPart.length)) {
          if (stemPart.endsWith("at") || stemPart.endsWith("bl") ||
            stemPart.endsWith("iz")) return stemPart + "e"
          if (endsWithDouble(stemPart)) return stemPart.dropRight(1)
          if (isShortWord(stemPart, r1)) return stemPart + "e"
          return stemPart
        }
        return w
      }
    }
    w
  }

  private def step1c(w: String): String = {
    val n = w.length
    if (n > 2 && (w(n - 1) == 'y' || w(n - 1) == 'Y') &&
      !isV(w.toCharArray, n - 2)) {
      w.dropRight(1) + "i"
    } else w
  }

  // (suffix, replacement); searched longest-first, applied if in R1
  private val step2Subs: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
    "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble")

  private def step2(w: String, r1: Int): String = {
    for ((suf, rep) <- step2Subs) {
      if (w.endsWith(suf)) {
        return if (w.length - suf.length >= r1) w.dropRight(suf.length) + rep
        else w
      }
    }
    if (w.endsWith("ogi")) {
      return if (w.length - 3 >= r1 && w.length >= 4 && w(w.length - 4) == 'l')
        w.dropRight(3) + "og"
      else w
    }
    if (w.endsWith("li")) {
      return if (w.length - 2 >= r1 && w.length >= 3 &&
        liEnding.contains(w(w.length - 3))) w.dropRight(2)
      else w
    }
    w
  }

  private def step3(w: String, r1: Int, r2: Int): String = {
    val subs: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
      "ful" -> "", "ness" -> "")
    for ((suf, rep) <- subs) {
      if (w.endsWith(suf)) {
        return if (w.length - suf.length >= r1) w.dropRight(suf.length) + rep
        else w
      }
    }
    if (w.endsWith("ative")) {
      return if (w.length - 5 >= r2) w.dropRight(5) else w
    }
    w
  }

  private val step4Sufs = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic")

  private def step4(w: String, r2: Int): String = {
    for (suf <- step4Sufs) {
      if (w.endsWith(suf)) {
        return if (w.length - suf.length >= r2) w.dropRight(suf.length) else w
      }
    }
    if (w.endsWith("ion")) {
      return if (w.length - 3 >= r2 && w.length >= 4 &&
        (w(w.length - 4) == 's' || w(w.length - 4) == 't')) w.dropRight(3)
      else w
    }
    w
  }

  private def step5(w: String, r1: Int, r2: Int): String = {
    val n = w.length
    if (n > 0 && w(n - 1) == 'e') {
      if (n - 1 >= r2) return w.dropRight(1)
      if (n - 1 >= r1 && !endsWithShortSyllable(w.dropRight(1)))
        return w.dropRight(1)
      return w
    }
    if (n > 1 && w(n - 1) == 'l' && n - 1 >= r2 && w(n - 2) == 'l')
      return w.dropRight(1)
    w
  }

  /** Default English stopword list used by the reference
    * (lantern_extras/src/stemmers.rs:99-103) — applied AFTER stemming. */
  val defaultStopwords: Array[String] = Array(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")
}
