package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Vectors from the published Snowball English sample vocabulary and
  * the reference's own tests (lantern_extras/src/stemmers.rs:154-279).
  */
class PorterStemmerSpec extends AnyFunSuite {
  private val vectors = Seq(
    // reference test_text_to_stem_array (rust engine)
    "quick" -> "quick", "brown" -> "brown", "fox" -> "fox",
    "jumps" -> "jump", "over" -> "over", "lazy" -> "lazi", "dog" -> "dog",
    // snowball sample vocabulary
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
    "cries" -> "cri", "running" -> "run", "runner" -> "runner",
    "happiness" -> "happi", "happy" -> "happi",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "agreed" -> "agre", "feed" -> "feed",
    "plastered" -> "plaster", "bled" -> "bled", "motoring" -> "motor",
    "sing" -> "sing", "sized" -> "size", "hopping" -> "hop",
    "hoping" -> "hope", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
    "abilities" -> "abil", "ability" -> "abil",
    "generate" -> "generat", "generates" -> "generat",
    "general" -> "general", "generic" -> "generic",
    "communication" -> "communic",
    "nationalization" -> "nation",
    "consignment" -> "consign", "consign" -> "consign",
    // exceptional forms
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl",
    "ugly" -> "ugli", "early" -> "earli", "only" -> "onli",
    "singly" -> "singl", "sky" -> "sky", "news" -> "news", "bias" -> "bias",
    // post-1a stops
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "proceed" -> "proceed", "exceed" -> "exceed",
    "succeed" -> "succeed",
    // y-handling
    "cry" -> "cri", "by" -> "by", "say" -> "say", "enjoy" -> "enjoy",
    // short words / double endings
    "bed" -> "bed", "shed" -> "shed", "shred" -> "shred",
    "hop" -> "hop", "luxuriously" -> "luxuri")

  for ((in, want) <- vectors) {
    test(s"stem($in) == $want") {
      assert(PorterStemmer.stem(in) == want)
    }
  }

  test("words of length <= 2 unchanged") {
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem("ab") == "ab")
    assert(PorterStemmer.stem("as") == "as")
  }
}
