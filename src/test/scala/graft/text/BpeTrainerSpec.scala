package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  // the ACL'16 paper's corpus shape: low×5 lower×2 newest×6 widest×3
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
  ).toDF("doc_id", "text")

  test("learned merges match the hand-computed sequence (ties lexicographic)") {
    val merges = BpeTrainer.train(corpus, "text", numMerges = 5)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
  }

  test("distributed regime produces the identical merge table") {
    val words = BpeTrainer.wordCounts(corpus, "text")
    val dist = BpeTrainer.trainDistributed(words, 5)
    val local = BpeTrainer.train(corpus, "text", 5)
    assert(dist == local)
  }

  test("training stops when no pair repeats") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(BpeTrainer.train(tiny, "text", 10).isEmpty) // all pairs count 1
    val rep = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val m = BpeTrainer.train(rep, "text", 10)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"))) // then dry
  }

  test("applyMerges round-trips training words; bpeTokens matches per word") {
    val merges = BpeTrainer.train(corpus, "text", 5)
    assert(BpeTrainer.applyMerges("lowest", merges).toSeq ==
      Seq("low", "est"))
    assert(BpeTrainer.applyMerges("newest", merges).toSeq ==
      Seq("n", "ew", "est"))
    val toks = Seq((1L, "lowest newest"))
      .toDF("doc_id", "text")
      .select(BpeTrainer.bpeTokens($"text", merges).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("low", "est", "n", "ew", "est"))
  }

  test("byte-level BPE: multibyte round-trip, space-riding pretokens, regime parity") {
    val docs = Seq(
      (1L, "the cat the cat the cat"),
      (2L, "中文 中文 中文 and ümlaut ümlaut"),
      (3L, "emoji 😀😀 mix, with punct!!")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainBytes(docs, "text", 12)
    assert(merges.nonEmpty)
    // regime parity on bytes
    val dist = BpeTrainer.trainDistributed(
      BpeTrainer.byteWordCounts(docs, "text"), 12)
    assert(merges == dist)
    // every doc reconstructs exactly from its byte tokens
    val back = docs
      .select($"text",
        BpeTrainer.byteBpeTokens($"text", merges).as("t"))
      .as[(String, Seq[String])].collect()
    back.foreach { case (orig, toks) =>
      assert(BpeTrainer.fromByteString(toks.mkString("")) == orig)
    }
    // byte alphabet: every symbol char fits a byte
    merges.foreach(m =>
      assert((m.left + m.right).forall(_ <= 0xff.toChar)))
  }

  test("vocabulary layout and encodeIds: dense ids, OOV = -1, decode inverts") {
    val merges = BpeTrainer.train(corpus, "text", 5)
    val alphabet = BpeTrainer.corpusAlphabet(corpus, "text")
    val vocab = BpeTrainer.vocabulary(merges, alphabet)
    // alphabet chars take ids 0..|a|-1 in sorted order; merge products follow in rank order
    val sortedAlpha = alphabet.distinct.sorted
    sortedAlpha.zipWithIndex.foreach { case (c, i) => assert(vocab(c) == i) }
    merges.sortBy(_.rank).foldLeft(sortedAlpha.size) { case (nextId, m) =>
      val prod = m.left + m.right
      if (vocab(prod) >= sortedAlpha.size) assert(vocab(prod) == nextId)
      nextId + (if (vocab(prod) == nextId) 1 else 0)
    }
    val ids = Seq((1L, "lowest zzz"))
      .toDF("doc_id", "text")
      .select(BpeTrainer.encodeIds($"text", merges, vocab).as("ids"))
      .as[Seq[Int]].head()
    // "lowest" → low, est (both known); "zzz" → z×3, z ∉ corpus alphabet → -1
    assert(ids.take(2).forall(i => i >= 0 && i < vocab.size))
    assert(ids.drop(2) == Seq(-1, -1, -1))
    val inv = vocab.map(_.swap)
    assert(ids.take(2).map(inv).mkString("") == "lowest")
  }

  test("tie-break parity: supplementary vs BMP-high symbols (UTF-8 order)") {
    val sup = new String(Character.toChars(0x1D54F)) // 𝕏, surrogate pair
    val pua = "\uF8FF" // BMP private use
    // two pairs tie at count 2; UTF-8/code-point order puts U+F8FF
    // FIRST (3 bytes < 4 bytes), UTF-16 code-unit order would flip
    // (0xD835 < 0xF8FF) — both regimes must pick the same winner
    val vocab = Array((sup + "y", 2L), (pua + "y", 2L))
    val local = BpeTrainer.trainLocal(vocab, 2)
    val dist = BpeTrainer.trainDistributed(
      vocab.toSeq.toDF("word", "cnt"), 2)
    assert(local == dist)
    assert(local.head.left == pua)
    // code-point splitting keeps surrogate pairs whole in both regimes
    assert(BpeTrainer.charSyms(sup + "y").toSeq == Seq(sup, "y"))
    assert(local.map(m => (m.left, m.right)) ==
      Seq((pua, "y"), (sup, "y")))
    // and applyMerges tokenizes the supplementary word to one symbol
    assert(BpeTrainer.applyMerges(sup + "y", local).toSeq == Seq(sup + "y"))
  }
}
