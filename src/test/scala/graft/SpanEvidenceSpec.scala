package graft

import org.apache.spark.sql.functions._

/** q196 span-evidence retrieval: the planted-case contract — the
  * verbatim twin wins on span where bag-of-terms scoring cannot see
  * it — plus the GramFpsSeq/declarative-composition identity. */
class SpanEvidenceSpec extends SparkSpec {
  import spark.implicits._

  private def plant(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q196: the verbatim twin outranks an equal-bag impostor, span length exact") {
    val evalTokens = (1 to 20).map(i => s"w$i")
    val window = evalTokens.slice(4, 16) // tokens w5..w16 — 12 tokens
    // twin: the 12-token window verbatim inside filler
    val twin = (Seq("x1", "x2", "x3") ++ window ++ Seq("y1", "y2")).mkString(" ")
    // impostor: the SAME BAG of tokens, adjacency destroyed (reversed)
    val impostor = (Seq("x1", "x2", "x3") ++ window.reverse ++ Seq("y1", "y2")).mkString(" ")
    val dir = plant(Seq(
      (1L, evalTokens.mkString(" "), "en", "src0"),
      (10L, twin, "en", "src1"),
      (11L, impostor, "en", "src2"),
      // a second eval doc with NO 8-gram overlap anywhere: absent
      (2L, (1 to 12).map(i => s"z$i").mkString(" "), "en", "src0")))
    val out = graft.queries.TextQueries.spanEvidence(spark, dir).collect()
    assert(out.length == 1, s"only eval 1 has span evidence: ${out.mkString(",")}")
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getLong(1) == 10L, "the verbatim twin wins")
    assert(out.head.getLong(2) == 12L, "span = the planted 12-token window")
  }

  test("q196: ties break on min train_id; sub-n docs never produce grams") {
    val window = (1 to 9).map(i => s"t$i")
    val dir = plant(Seq(
      (1L, window.mkString(" "), "en", "src0"),
      // both trains carry the same 9-token window → equal spans
      (21L, ("pre" +: window).mkString(" "), "en", "src1"),
      (20L, (window :+ "post").mkString(" "), "en", "src1"),
      // shorter than n=8 tokens: contributes nothing
      (30L, "t1 t2 t3", "en", "src1")))
    val out = graft.queries.TextQueries.spanEvidence(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 20L, "equal span 9 → smaller train_id wins")
    assert(out.head.getLong(2) == 9L)
  }

  test("q197: top-m offsets — planted spans recovered exactly, rank order deterministic") {
    val evalTokens = (1 to 30).map(i => s"w$i")
    // twin A: eval tokens w5..w16 (0-based eval positions 4..15)
    // planted at train positions 3..14
    val winA = evalTokens.slice(4, 16)
    val twinA = (Seq("x1", "x2", "x3") ++ winA ++ Seq("y1", "y2")).mkString(" ")
    // twin B: a SHORTER window w10..w18 (eval 9..17) planted at train
    // position 0 — must rank BELOW twin A (span 9 < 12)
    val winB = evalTokens.slice(9, 18)
    val twinB = (winB ++ Seq("q1", "q2", "q3")).mkString(" ")
    // impostor: same bag as A reversed — no 8-gram overlap, absent
    val impostor = (Seq("x1", "x2", "x3") ++ winA.reverse ++ Seq("y1", "y2")).mkString(" ")
    val dir = plant(Seq(
      (1L, evalTokens.mkString(" "), "en", "src0"),
      (10L, twinA, "en", "src1"),
      (11L, twinB, "en", "src2"),
      (12L, impostor, "en", "src3")))
    val out = graft.queries.TextQueries.spanEvidenceOffsets(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // (eval, rank, train, span, eval_start, eval_end, train_start)
    assert(out.toSeq == Seq(
      (1L, 1L, 10L, 12L, 4L, 15L, 3L),
      (1L, 2L, 11L, 9L, 9L, 17L, 0L)),
      s"got ${out.mkString(", ")}")
  }

  test("q197: within one pair the best run wins; offsets point at the maximal span") {
    // one train doc carrying TWO separate copies of eval material:
    // a 8-token window early and a LONGER 10-token window later —
    // offsets must name the longer one
    val evalTokens = (1 to 24).map(i => s"e$i")
    val short = evalTokens.slice(0, 8)   // eval 0..7
    val long = evalTokens.slice(12, 22)  // eval 12..21
    val train = (short ++ Seq("gap1", "gap2") ++ long).mkString(" ")
    val dir = plant(Seq(
      (1L, evalTokens.mkString(" "), "en", "src0"),
      (40L, train, "en", "src1")))
    val out = graft.queries.TextQueries.spanEvidenceOffsets(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(3) == 10L, s"span must be the longer window: ${r.getLong(3)}")
    assert(r.getLong(4) == 12L && r.getLong(5) == 21L, "eval offsets = 12..21")
    assert(r.getLong(6) == 10L, "train offset = after short(8) + gap(2)")
  }

  test("gram_fps_seq: identical to the ordered declarative composition (positions preserved)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and then returns home",
      "a b a b a b a b a b a b", // repetition: seq keeps EVERY gram
      "one two three four five six seven eight",
      "short doc", "", "héllo wörld ünïcode çhars über ålpha ómega ßharp x y")
    val df = texts.toDF("text")
    for (n <- Seq(3, 8)) {
      val toks = split(trim(col("text")), "\\s+")
      val want = df.select(
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => graft.functions.expressions.codepoint_rolling_hash(
              concat_ws(" ", slice(toks, i, lit(n))))))
          .otherwise(array().cast("array<long>")).as("fp")).collect()
      val got = df.select(
        graft.functions.expressions.gram_fps_seq(toks, n).as("fp")).collect()
      texts.indices.foreach { i =>
        assert(got(i).getSeq[Long](0) == want(i).getSeq[Long](0),
          s"n=$n text $i: seq expression != ordered composition")
      }
    }
  }
}
