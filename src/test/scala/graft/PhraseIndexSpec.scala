package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** The positional BM25 index and its phrase serving
  * ([[TextOps.phraseOccurrencesIndexed]] / [[TextOps.bm25PhraseTopK]]):
  * exact parity against a corpus-side brute force, the full index
  * lifecycle (append, delete, compaction) preserving phrase answers,
  * the non-positional refusal, and the mixed-layout merge refusal. */
class PhraseIndexSpec extends SparkSpec {

  private def freshDir(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_$tag").resolve("ix").toString

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001")
    .documents.toDF().localCheckpoint()

  /** Corpus-side brute force, independent of the postings machinery:
    * every 0-based token index whose successors spell the phrase. */
  private def brute(d: org.apache.spark.sql.DataFrame,
      phrase: Seq[String]): Array[String] = {
    val k = phrase.size
    val conds = phrase.zipWithIndex
      .map { case (w, i) => s"w[CAST(p + $i AS INT)] = '$w'" }
      .mkString(" AND ")
    d.select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= k)
      .withColumn("starts", expr(
        s"filter(sequence(0, size(w) - $k), p -> $conds)"))
      .where(size(col("starts")) > 0)
      .select(col("doc_id"),
        size(col("starts")).cast("long").as("n_occ"),
        element_at(col("starts"), 1).cast("long").as("first_pos"))
      .collect().map(_.toString).sorted
  }

  private def served(idx: String, phrase: Seq[String]): Array[String] =
    TextOps.phraseOccurrencesIndexed(spark, idx, phrase)
      .collect().map(_.toString).sorted

  test("phrase serving equals the corpus brute force for 1-, 2- and " +
    "3-token phrases (single word == plain tf semantics)") {
    val idx = freshDir("phr_parity")
    TextOps.bm25IndexWrite(docs, idx, positional = true)
    for (phrase <- Seq(Seq("order"), Seq("order", "fast"),
        Seq("big", "order", "scan"))) {
      val rows = served(idx, phrase)
      assert(rows.nonEmpty, s"fixture too weak: $phrase matches nothing")
      assert(rows.sameElements(brute(docs, phrase)),
        s"phrase $phrase must equal the corpus brute force")
    }
  }

  test("the lifecycle preserves phrase answers: append == rebuild, " +
    "deletions mask, compaction keeps positions through the rewrite") {
    val idx = freshDir("phr_life")
    val phrase = Seq("order", "fast")
    TextOps.bm25IndexWrite(docs.where(col("doc_id") % 2 === 0), idx,
      positional = true)
    // append follows the STORED layout — no flag on the call
    TextOps.bm25IndexAppend(docs.where(col("doc_id") % 2 =!= 0), idx)
    val full = served(idx, phrase)
    assert(full.nonEmpty && full.sameElements(brute(docs, phrase)),
      "write+append must answer phrases like the full corpus")

    val victims = TextOps.phraseOccurrencesIndexed(spark, idx, phrase)
      .select(col("doc_id")).limit(3).localCheckpoint()
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    graft.operators.EmbeddingOps.indexDelete(spark, idx, victims,
      keyCol = "doc_id")
    val masked = served(idx, phrase)
    assert(!masked.exists(r => victimIds.exists(v =>
        r.startsWith(s"[$v,"))),
      "tombstoned docs must leave the phrase serve immediately")

    assert(TextOps.bm25IndexCompact(spark, idx) === 2)
    assert(served(idx, phrase).sameElements(masked),
      "compaction must preserve phrase answers (ps survives the " +
        "postings rewrite)")
  }

  test("a non-positional index refuses phrase serving with the " +
    "rebuild guidance; a mixed positional/non-positional merge " +
    "refuses naming the layout") {
    val plain = freshDir("phr_plain")
    TextOps.bm25IndexWrite(docs, plain)
    val e = intercept[IllegalArgumentException] {
      TextOps.phraseOccurrencesIndexed(spark, plain,
        Seq("order", "fast")).collect()
    }
    assert(e.getMessage.contains("positional = true"))

    val pos = freshDir("phr_pos")
    TextOps.bm25IndexWrite(docs.where(col("doc_id") % 2 === 0), pos,
      positional = true)
    val eMix = intercept[IllegalArgumentException] {
      TextOps.bm25IndexMerge(spark, Seq(plain, pos),
        freshDir("phr_mix"))
    }
    assert(eMix.getMessage.contains("positional flag differs"))
  }

  test("termsNearIndexed equals the corpus brute force at several " +
    "windows, and widening the window never loses a match") {
    val idx = freshDir("phr_near")
    TextOps.bm25IndexWrite(docs, idx, positional = true)
    var prev = 0
    for (window <- Seq(1, 3, 6)) {
      val brute = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("starts", expr(
          "filter(sequence(0, size(w) - 1), p -> " +
            "w[CAST(p AS INT)] = 'order' AND exists(" +
            s"sequence(greatest(0, p - $window), " +
            s"least(size(w) - 1, p + $window)), " +
            "q -> w[CAST(q AS INT)] = 'scan'))"))
        .where(size(col("starts")) > 0)
        .select(col("doc_id"),
          size(col("starts")).cast("long").as("n_anchors"),
          element_at(col("starts"), 1).cast("long").as("first_pos"))
        .collect().map(_.toString).sorted
      val got = TextOps.termsNearIndexed(spark, idx,
          Seq("order", "scan"), window)
        .collect().map(_.toString).sorted
      assert(got.nonEmpty && got.sameElements(brute),
        s"window=$window must equal the corpus brute force")
      assert(got.length >= prev,
        "a wider window must never lose a matching doc")
      prev = got.length
    }
  }

  test("the batched phrase serve equals the single-phrase serve per " +
    "query, including an unmatched phrase contributing zero rows") {
    val idx = freshDir("phr_batch")
    TextOps.bm25IndexWrite(docs, idx, positional = true)
    val batch = Seq(1L -> Seq("order", "fast"),
      2L -> Seq("big", "order", "scan"), 3L -> Seq("vector"),
      4L -> Seq("order", "zzz_nonexistent"))
    val got = TextOps.phraseOccurrencesIndexedBatch(spark, idx, batch)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq)
      .toMap
    batch.foreach { case (qid, phrase) =>
      val single = TextOps.phraseOccurrencesIndexed(spark, idx, phrase)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got.getOrElse(qid, Seq.empty) === single,
        s"batch row set for query $qid must equal the single serve")
    }
    assert(!got.contains(4L),
      "an unmatched phrase must contribute zero rows")
    assert(got.keySet === Set(1L, 2L, 3L))
  }

  test("phraseSnippetsIndexed clamps the context window at both " +
    "document edges and matches the corpus brute force") {
    val fixture = docsDf(Seq(
      (1L, "order fast tail words beyond the window", "en", "syn"),
      (2L, "a b c d e f order fast", "en", "syn"),
      (3L, "x order fast y", "en", "syn"),
      (4L, "no match here", "en", "syn")))
    val idx = freshDir("phr_snip")
    TextOps.bm25IndexWrite(fixture, idx, positional = true)
    val got = TextOps.phraseSnippetsIndexed(spark, idx, fixture,
        Seq("order", "fast"), ctx = 3)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got === Map(
      1L -> "order fast tail words beyond", // head-clamped
      2L -> "d e f order fast", // tail-clamped
      3L -> "x order fast y")) // both-clamped

    // corpus-scale parity: snippet == the sliced token array
    val idx2 = freshDir("phr_snip2")
    TextOps.bm25IndexWrite(docs, idx2, positional = true)
    val ctx = 4
    val brute = TextOps.phraseOccurrencesIndexed(spark, idx2,
        Seq("order", "fast"))
      .join(docs.select(col("doc_id"),
        split(col("text"), " ").as("w")), Seq("doc_id"))
      .select(col("doc_id"), expr(
        s"concat_ws(' ', slice(w, " +
          s"CAST(greatest(first_pos - $ctx, 0) + 1 AS INT), " +
          s"CAST(first_pos + ${2 + ctx} - " +
          s"greatest(first_pos - $ctx, 0) AS INT)))").as("snippet"))
      .collect().map(_.toString).sorted
    assert(TextOps.phraseSnippetsIndexed(spark, idx2, docs,
        Seq("order", "fast"), ctx)
      .select(col("doc_id"), col("snippet"))
      .collect().map(_.toString).sorted.sameElements(brute))
  }

  test("bm25PhraseTopK ranks exactly the matched docs, descending by " +
    "the exact-integer score") {
    val idx = freshDir("phr_topk")
    TextOps.bm25IndexWrite(docs, idx, positional = true)
    val phrase = Seq("big", "order", "scan")
    val top = TextOps.bm25PhraseTopK(spark, idx, phrase, k = 100)
      .collect()
    val matched = TextOps.phraseOccurrencesIndexed(spark, idx, phrase)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(top.nonEmpty &&
      top.map(_.getAs[Long]("doc_id")).toSet === matched,
      "at k >= |matches| the ranking must cover exactly the matches")
    val scores = top.map(_.getAs[Long]("score_q"))
    assert(scores.sameElements(scores.sorted.reverse),
      "scores must be non-increasing")
  }
}
