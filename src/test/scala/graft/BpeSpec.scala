package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The classic BPE walkthrough corpus: low×3, lower×1, newest×2.
  private val corpus = Seq(
    (1L, "low low low lower"),
    (2L, "newest newest")).toDF("doc_id", "text")

  test("trainMerges learns the hand-computed merge sequence") {
    val m = Bpe.trainMerges(corpus, numMerges = 4)
    // pair counts r1: (l,o)=4 (o,w)=4 (w,e)=3 (n,e)=(e,w)=(e,s)=(s,t)=2
    // (e,r)=1 — ties break to the lexicographically smallest pair.
    assert(m.map(x => (x.merge_rank, x.left_sym, x.right_sym, x.n_pair)) ==
      Seq((1, "l", "o", 4L), (2, "lo", "w", 4L),
        (3, "e", "s", 2L), (4, "e", "w", 2L)))
  }

  test("bpeTokenCount applies the merges in rank order") {
    val merges = Bpe.trainMerges(corpus, numMerges = 4)
    // low → [low]; lower → [low, e, r]; newest → [n, ew, es, t]
    val got = Seq((1L, "low lower newest"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
      .select($"doc_id", Bpe.bpeTokenCount($"text", merges).as("n"))
      .orderBy("doc_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 8), (2L, 0), (3L, 0)))
  }

  test("merges never cross word boundaries") {
    // "ab" appears only split across words: 'a' ends word1, 'b' starts
    // word2 — the only in-word pairs are (x,a) and (b,y).
    val m = Bpe.trainMerges(
      Seq((1L, "xa by xa by xa by")).toDF("doc_id", "text"), numMerges = 1)
    assert(m.head.left_sym == "b" && m.head.right_sym == "y")
  }

  test("training stops when no pair is left to merge") {
    val m = Bpe.trainMerges(
      Seq((1L, "a b c a b")).toDF("doc_id", "text"), numMerges = 5)
    assert(m.isEmpty)
  }

  test("repeated trainings leave no pinned storage behind") {
    // the per-iteration vocabulary localCheckpoints unpersist as the
    // loop advances, and the FINAL state unpersists before return —
    // a bench rep or a retrain must not leak executor blocks
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    (1 to 2).foreach(_ => Bpe.trainMerges(corpus, numMerges = 2))
    def leaked = sc.getPersistentRDDs.keySet -- before
    val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(leaked.isEmpty,
      s"vocabulary checkpoint blocks must drain after training: $leaked")
  }

  test("bpeSegment: symbol stream agrees with bpeTokenCount and the merges") {
    val docs = Seq((1L, "low lower lowest"), (2L, ""), (3L, "  \t "))
      .toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, numMerges = 3)
    val got = docs.select($"doc_id",
        Bpe.bpeSegment($"text", m).as("seg"),
        Bpe.bpeTokenCount($"text", m).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    // empty/whitespace docs segment to the empty string, count 0
    assert(got(2L) == ("", 0) && got(3L) == ("", 0))
    val (seg, n) = got(1L)
    assert(seg.split(" ").length == n,
      s"segment '$seg' has ${seg.split(" ").length} symbols, count says $n")
    // every learned merge's joined symbol appears in the stream
    m.foreach(mg => assert(seg.contains(mg.left_sym + mg.right_sym)
      || !seg.contains(s"${mg.left_sym} ${mg.right_sym}"),
      s"merge ${mg.left_sym}+${mg.right_sym} left an unmerged adjacent pair"))
    // the most frequent pair ("l","o" in this corpus) merged everywhere:
    // no adjacent single-symbol 'l o' survives
    assert(!s" $seg ".contains(s" ${m.head.left_sym} ${m.head.right_sym} "))
  }
}
