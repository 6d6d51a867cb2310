package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, s: String): Any =
    Seq(s).toDF("t").select(c.as("r")).head().get(0)

  test("langId picks the language with most stopword hits") {
    assert(one(langId(col("t")), "the cat and the dog is in it") == "en")
    assert(one(langId(col("t")), "el perro y la casa de que los") == "es")
    assert(one(langId(col("t")), "der hund und die katze ist das") == "de")
    assert(one(langId(col("t")), "le chat et les maisons des une") == "fr")
    assert(one(langId(col("t")), "xyzzy plugh quux") == "und")
  }

  test("langId tie-break is deterministic preference order") {
    // 'la' is both es and fr; single hit each → es wins (preference order)
    assert(one(langId(col("t")), "la xyzzy") == "es")
  }

  test("token counts: whitespace vs bpe-ish") {
    assert(one(tokenCount(col("t")), "a  b\tc") == 3)
    assert(one(bpeishTokenCount(col("t")), "ab3 cd-4") == 5) // ab,3,cd,-,4
  }

  test("empty and whitespace-only documents count zero tokens") {
    // split('', '\s+') yields [''] — the raw tokens array keeps that
    // engine-shared convention, but the COUNT must not credit an empty
    // doc with one token (an empty-doc filter would never fire)
    // '\tword': trim strips only spaces, so the tab survives and split
    // yields a leading empty — the count must still be 1
    val got = Seq("", "   ", "\t\n", "\tword", "one two").toDF("text")
      .select(tokenCount($"text")).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0, 1, 2))
  }

  test("qualityScore stays in [0,1] over real documents") {
    val r = Tables.load(spark, sf0001, "documents")
      .select(qualityScore($"text").as("q")).as[Double].collect()
    r.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("fleschScore: hand-computed value; simple text outscores dense text") {
    // "The cat. The dog.": 4 words, 2 sentences, 4 vowel runs
    // → 206.835 − 1.015·2 − 84.6·1 = 120.205
    assert(one(fleschScore(col("t")), "The cat. The dog.") == 120.205)
    // punctuation-free text floors at one sentence (no divide-by-zero):
    // 50 words / 1 sentence, 50 vowel runs → 206.835 − 50.75 − 84.6
    val flat = one(fleschScore(col("t")), "word " * 50).asInstanceOf[Double]
    assert(flat == 71.485)
    val dense = one(fleschScore(col("t")),
      "Extraordinarily sophisticated terminology necessitates comprehension.")
      .asInstanceOf[Double]
    val simple = one(fleschScore(col("t")), "The cat sat. The dog ran.")
      .asInstanceOf[Double]
    assert(simple > dense)
  }

  test("qualityScore rewards long alpha-rich stopword-bearing text") {
    val good = ("the quick brown fox jumps over the lazy dog and runs " * 10)
    val bad = "@#$% 123 !!"
    val qg = one(qualityScore(col("t")), good).asInstanceOf[Double]
    val qb = one(qualityScore(col("t")), bad).asInstanceOf[Double]
    assert(qg > qb)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val a = one(fingerprintMd5(col("t")), "Hello   World")
    val b = one(fingerprintMd5(col("t")), "  hello world ")
    val c = one(fingerprintMd5(col("t")), "hello there")
    assert(a == b && a != c)
  }

  test("gopher signals: hand-computed char-weighted repetition fractions") {
    // doc 1: no repetition; doc 2: doubled 3-token phrase; doc 3: two
    // alternating tokens (every trigram duplicated); doc 4: single
    // token (degenerate single-gram fallback → top bigram frac 1.0)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma alpha beta gamma"),
      (3L, "spam ham spam ham spam ham spam ham"),
      (4L, "hello")).toDF("doc_id", "text")
    val r = graft.operators.Repetition.gopherSignals(docs)
      .orderBy("doc_id")
      .as[(Long, Double, Double)].collect()

    // doc 1: all 4 trigrams unique → 0.0; top bigram "alpha beta"
    // (first lexicographically among the all-count-1 tie), 10 chars of
    // the 56 bigram chars → 0.1786
    assert(r(0) == ((1L, 0.0, 0.1786)))
    // doc 2: "alpha beta gamma" ×2 (32 of 64 trigram chars) → 0.5;
    // top bigram "alpha beta" ×2 (20 of 51) → 0.3922
    assert(r(1) == ((2L, 0.5, 0.3922)))
    // doc 3: every trigram occurs 3× → 1.0; "spam ham" ×4 (32 of 56)
    assert(r(2) == ((3L, 1.0, 0.5714)))
    // doc 4: single fallback gram each — nothing repeats, but the one
    // "bigram" covers all chars
    assert(r(3) == ((4L, 0.0, 1.0)))
  }

  test("deflate ratio orders repetitive text below unique-token text; exact byte counts") {
    val rep = Seq.fill(200)("spam ham").mkString(" ")
    val noise = (0 until 300).map(i => s"tok${i * 7919 % 100000}").mkString(" ")
    val docs = Seq((1L, rep), (2L, noise), (3L, "")).toDF("doc_id", "text")
    val r = graft.operators.Repetition.compressionRatio(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // exact raw byte counts (ASCII here: chars == bytes)
    assert(r(0)._2 == rep.length && r(1)._2 == noise.length && r(2)._2 == 0)
    // a 200× repeated phrase compresses to a sliver; 300 distinct
    // tokens cannot (bounds loose enough to survive zlib revisions)
    assert(r(0)._4 < 0.05, s"repetitive ratio ${r(0)._4}")
    assert(r(1)._4 > 0.2, s"unique-token ratio ${r(1)._4}")
    assert(r(0)._4 < r(1)._4)
    // empty text: zero bytes, ratio pinned to 1.0 (never divides)
    assert(r(2)._3 >= 0 && r(2)._4 == 1.0)
  }

  test("charset quarantine: each damage class trips its own signal; clean text passes") {
    import graft.functions.TextAnalysis._
    val rows = Seq(
      "perfectly ordinary ascii text with numbers 123 and, punctuation!",
      "tab\tand\nnewline and\r cr are fine",
      "control byte here \u0001 breaks it",
      "decoder gave up �� on this one",
      "λπλπλπλπλπλπλπλπλπλπ tiny ascii",   // high non-ASCII mass
      "naïve café résumé — light diacritics in long enough ascii text")
      .toDF("text")
      .select(ctrlCharCount($"text").as("c"),
        replacementCharCount($"text").as("r"),
        nonAsciiCount($"text").as("n"),
        charsetQuarantine($"text").as("q"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getInt(3)))
    assert(rows(0) == ((0, 0, 0, 0)))
    assert(rows(1) == ((0, 0, 0, 0)), "tab/newline/CR must not count as control")
    assert(rows(2)._1 == 1 && rows(2)._4 == 1)
    assert(rows(3)._2 == 2 && rows(3)._4 == 1)
    assert(rows(4)._3 >= 20 && rows(4)._4 == 1, "codepoint mass must quarantine")
    assert(rows(5)._1 == 0 && rows(5)._2 == 0 && rows(5)._4 == 0,
      "light diacritics in mostly-ascii text must pass")
  }

  test("native stopword hits equal the filter-tree formulation") {
    val docs = Tables.load(spark, sf0001, "documents").select("text")
      .unionByName(Seq("", "the the THE the", "el que de y", "   ", "xyzzy")
        .toDF("text"))
    for ((lang, ws) <- stopwords) {
      val bad = docs.select(
          stopwordHits($"text", ws).as("fast"),
          stopwordHitsFold($"text", ws).as("ref"))
        .where($"fast" =!= $"ref")
      assert(bad.count() == 0, s"$lang stopword-hit divergence")
    }
  }
}
