package graft

import org.apache.spark.sql.functions._

import graft.functions.C4Clean
import graft.operators.QualityRules

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def gopherRow(text: String): org.apache.spark.sql.Row =
    QualityRules.gopherQuality(Seq((1L, text)).toDF("doc_id", "text"))
      .head()

  // 60 words, 4 letters each, two stopwords present — passes every rule.
  private val goodText =
    (Seq.fill(29)("word") ++ Seq("the", "with") ++ Seq.fill(29)("word"))
      .mkString(" ")

  test("gopher: a clean stopword-bearing 60-word doc passes all rules") {
    val r = gopherRow(goodText)
    assert(r.getAs[Long]("n_words") == 60)
    // 58×"word" + "the" + "with" = 239 chars over 60 words
    assert(r.getAs[Double]("mean_word_len") == 3.9833)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r.getAs[Double]("bullet_line_frac") == 0.0)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.0)
    assert(r.getAs[Double]("alpha_word_frac") == 1.0)
    assert(r.getAs[Long]("n_stop_distinct") == 2)
    assert(r.getAs[Int]("gopher_pass") == 1)
  }

  test("gopher: each rule fails on its own planted violation") {
    // too short (59 words won't do it — drop to 10)
    assert(gopherRow(("the with " * 5).trim).getAs[Int]("gopher_pass") == 0)
    // symbol spam: 12 hashes over 72 words > 0.1
    val spam = goodText + " " + ("### " * 12).trim
    val rs = gopherRow(spam)
    assert(rs.getAs[Double]("symbol_word_ratio") > 0.1)
    assert(rs.getAs[Int]("gopher_pass") == 0)
    // only one distinct stopword
    val oneStop = goodText.replace(" with ", " word ")
    assert(gopherRow(oneStop).getAs[Long]("n_stop_distinct") == 1)
    assert(gopherRow(oneStop).getAs[Int]("gopher_pass") == 0)
    // numeric words dilute the alpha fraction below 0.8
    val numeric = goodText + " " + (1 to 20).map(_.toString).mkString(" ")
    val rn = gopherRow(numeric)
    assert(rn.getAs[Double]("alpha_word_frac") < 0.8)
    assert(rn.getAs[Int]("gopher_pass") == 0)
    // mean word length beyond 10
    val longWords = (Seq.fill(48)("supercalifragilistic") ++
      Seq("the", "with") ++ Seq.fill(10)("word")).mkString(" ")
    assert(gopherRow(longWords).getAs[Int]("gopher_pass") == 0)
  }

  test("gopher: line fractions count bullets and ellipsis line-ends") {
    // 4 lines: 2 bulleted, 2 ending in '...', last line has no newline
    val t = "- " + goodText + "\n* second bullet\nplain line...\ntail..."
    val r = gopherRow(t)
    assert(r.getAs[Double]("bullet_line_frac") == 0.5)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.5)
    // a 91%-bulleted doc fails the ≤0.9 rule
    val bullets = (("- " + goodText + "\n") * 10) + "plain\n" +
      ("- b\n" * 89).trim
    val rb = gopherRow(bullets)
    assert(rb.getAs[Double]("bullet_line_frac") > 0.9)
    assert(rb.getAs[Int]("gopher_pass") == 0)
  }

  test("c4: native clean equals the expression-tree fold on tricky lines") {
    val docs = Seq(
      "Good sentence with many words here.\nshort one.\nNo terminal punct line with words",
      "Ends with a quoted word \"done.\"\nJavaScript is CASE insensitive here ok.\nFive words exactly right here?",
      "",
      "\n\n",
      "tab\tseparated words do count as five.",
      "trailing spaces kill the terminal punct. \nBang ending line with five words!"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val both = docs.select(
      C4Clean.c4LineClean(col("text")).as("native"),
      C4Clean.c4LineCleanFold(col("text")).as("fold")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("c4: page-level drops and line retention match the published rules") {
    val corpus = Seq(
      // 3 proper sentences → kept
      (1L, "One proper sentence with enough words.\nTwo proper sentence with enough words!\nThree proper sentence with enough words?"),
      // javascript line dropped, only 2 sentences survive → page dropped
      (2L, "One proper sentence with enough words.\nthis line mentions javascript libraries today.\nTwo proper sentence with enough words."),
      // lorem ipsum page-dropped even with 3 good sentences
      (3L, "One proper sentence with enough words.\nTwo proper sentence with enough words.\nThree lorem ipsum sentence with words."),
      // curly brace page-dropped
      (4L, "One proper sentence with enough words.\nTwo proper sentence with enough words.\nThree { brace sentence with words."),
      // four-word line dropped; flat line without punct dropped
      (5L, "Only four words here.\nflat line no punctuation at all")
    ).toDF("doc_id", "text")
    val r = QualityRules.c4Filter(corpus).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_lines_kept") == 3 &&
      r(0).getAs[Int]("c4_keep") == 1)
    assert(r(1).getAs[Long]("n_lines_kept") == 2 &&
      r(1).getAs[Int]("c4_keep") == 0)
    assert(r(2).getAs[Int]("c4_keep") == 0)
    assert(r(3).getAs[Int]("c4_keep") == 0)
    assert(r(4).getAs[Long]("n_lines_kept") == 0 &&
      r(4).getAs[String]("clean_text") == "")
  }

  test("fineweb pipeline: four planted classes land on four verdicts") {
    // ids: 1 = English but fails Gopher (short); 2/3 = full survivors
    // sharing a fingerprint (3 is a whitespace-inflated copy of 2);
    // 4 = lorem-ipsum page (cut by c4_page BEFORE gopher, though it
    // would fail gopher too); 5 = Spanish (cut at lang, first stage).
    val surv = goodText + " more filler words so the count clears fifty"
    val corpus = Seq(
      (1L, "the quick brown fox jumps with energy"),
      (2L, surv),
      (3L, " " + surv.replaceAll(" ", "  ") + "  "),
      (4L, surv + " lorem ipsum { " + ("### " * 12).trim),
      (5L, "el perro y la casa de que los " + surv.replace("the", "xx")
        .replace("with", "yy"))
    ).toDF("doc_id", "text")
    val got = QualityRules.fineWebPipeline(corpus).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "gopher", 2L -> "kept", 3L -> "dedup",
      4L -> "c4_page", 5L -> "lang"))
  }

  test("fineweb pipeline: cut rows never reach the dedup exchange") {
    val docs = Tables.load(spark, sf0001, "documents")
    val plan = QualityRules.fineWebPipeline(docs)
      .queryExecution.executedPlan.toString
    // Only the dedup stage shuffles, and only on the fingerprint:
    // every hash exchange must be fingerprint-keyed (the keeper side
    // broadcasting instead is fine — that's the small-side plan).
    val keys = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.subsetOf(Set("fingerprint")),
      s"non-fingerprint shuffle keys $keys in:\n$plan")
  }

  test("both suites are zero-shuffle single-pass projections") {
    val docs = Tables.load(spark, sf0001, "documents")
    Seq(QualityRules.gopherQuality(docs), QualityRules.c4Filter(docs))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      }
  }
}
