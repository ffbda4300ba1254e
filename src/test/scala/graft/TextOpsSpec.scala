package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "spark join hash table scan filter sort merge group agg window batch"
  private val nearDup = base + " dup" // one extra token
  private val other =
    "row value line part key column data stream order query fast slow"

  private def docs = docsDf(Seq(
    (1L, base, "en", "s1"),
    (2L, base, "en", "s1"), // exact dup of 1
    (3L, nearDup, "en", "s2"), // near dup of 1
    (4L, other, "fr", "s3")))

  test("dedupExact groups identical texts keeping the lowest id") {
    val d = TextOps.dedupExact(docs)
    assert(d.count() == 3)
    val dup = d.where($"n_copies" === 2).collect()(0)
    assert(dup.getAs[Long]("kept_doc_id") == 1L)
  }

  test("shingles: n tokens yield n-2 trigrams") {
    val sh = TextOps.shingles(docsDf(Seq((1L, "a b c d e", "en", "s"))))
    assert(sh.count() == 3)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = TextOps.nearDupMinhash(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val j12 = TextOps.nearDupMinhash(docs, 0.5)
      .where($"doc_a" === 1 && $"doc_b" === 2).collect()(0)
      .getAs[Double]("jaccard")
    assert(j12 == 1.0)
  }

  test("piiScan counts and redacts emails and digit runs") {
    // the driver corpus contains no PII at all, so the oracle row alone
    // is vacuous — this spec feeds actual matches through both patterns
    val d = docsDf(Seq(
      (1L, "contact me at jane.doe+x@example.org or bob@test.io now", "en", "s"),
      (2L, "call 555-123-4567 or 555 987 6543 today", "en", "s"),
      (3L, "clean text with no pii at all", "en", "s")))
    val r = TextOps.piiScan(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_emails"), x.getAs[Long]("n_digit_runs"),
          x.getAs[String]("redacted_hash"))).toMap
    assert(r(1L)._1 == 2L && r(1L)._2 == 0L)
    assert(r(2L)._1 == 0L && r(2L)._2 == 2L)
    assert(r(3L) == (0L, 0L,
      // untouched text hashes to its own md5
      d.where($"doc_id" === 3).select(md5($"text")).collect()(0).getString(0)))
    // redaction actually replaced the matches (hash differs from raw)
    assert(r(1L)._3 !=
      d.where($"doc_id" === 1).select(md5($"text")).collect()(0).getString(0))
  }

  test("dupGroups labels every member with its component's min id") {
    // components: {1,2,3} (chain 1-2, 2-3), {7,9}; isolated docs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val g = TextOps.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("dedupSurvivors keeps the min doc per group and all non-dups") {
    // {1,2,3} form one near-dup group (min=1); 4 is unrelated
    val s = TextOps.dedupSurvivors(docs).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s == Set(1L, 4L))
  }

  test("ngram Jaccard with prefix blocking finds dups, skips unrelated") {
    val pairs = TextOps.nearDupNgramJaccard(docs, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // identical docs share every shingle (and so every prefix hash)
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    // near dup differs by one trailing token: same smallest hashes
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("winnowing near-dup pairs docs sharing long substrings only") {
    // maxDf high and minShared low so the tiny corpus is not filtered
    val pairs = TextOps.nearDupWinnowing(docs, minShared = 2,
        threshold = 0.5, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical -> jaccard 1
    assert(pairs.contains((1L, 3L))) // shared prefix -> shared fingerprints
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated
  }

  test("kgram_hashes O(n) slide equals the stepwise per-slice fold") {
    val d = docsDf(Seq((1L, "the quick brown fox jumps over it", "en", "s")))
    val viaExpr = d.select(explode(
        call_function("kgram_hashes", col("text"), lit(8))).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val viaFold = d.select(explode(expr(
      """transform(sequence(1, length(text) - 7),
        |  i -> aggregate(slice(split(text, ''), i, 8), 0L,
        |    (acc, c) -> (acc * 131 + ascii(c)) % 2147483647))"""
        .stripMargin)).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr.nonEmpty && viaExpr == viaFold)
    // fewer code points than k -> empty array, not null / error
    val short = docsDf(Seq((2L, "short", "en", "s")))
      .select(size(call_function("kgram_hashes", col("text"), lit(8)))
        .as("n")).collect()(0).getInt(0)
    assert(short == 0)
  }

  test("kgram_hashes misuse surfaces as analysis errors") {
    import org.apache.spark.sql.AnalysisException
    val d = docsDf(Seq((1L, "abcdefgh", "en", "s")))
    // wrong arity
    intercept[AnalysisException] {
      d.select(expr("kgram_hashes(text)"))
    }
    // non-foldable k
    intercept[AnalysisException] {
      d.select(call_function("kgram_hashes", col("text"), col("doc_id")))
    }
    // fractional k must error, not silently truncate to 2
    intercept[AnalysisException] {
      d.select(call_function("kgram_hashes", col("text"), lit(2.9)))
    }
    // k below the valid range
    intercept[AnalysisException] {
      d.select(call_function("kgram_hashes", col("text"), lit(0)))
    }
    // the non-Integer integral widening path still works: byte-typed k
    val n = d.select(size(call_function("kgram_hashes", col("text"),
      lit(3.toByte))).as("n")).collect()(0).getInt(0)
    assert(n == 6)
  }

  test("heavyHitters: every exact heavy hitter is in the sketch set") {
    // 100 tokens: "the" x30 is the only word above support 0.1 (>10)
    val text = ("the " * 30 + (1 to 70).map(i => s"w$i").mkString(" ")).trim
    val d = docsDf(Seq((1L, text, "en", "s")))
    val r = TextOps.heavyHitters(d, support = 0.1).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 100L)
    assert(r.getAs[Long]("n_true_hh") == 1L)
    assert(r.getAs[Boolean]("all_found"))
    // the corpus-scale run holds the same containment contract
    val big = TextOps.heavyHitters(
      Tables(spark, "/root/testdata/sf0.001").documents).collect()(0)
    assert(big.getAs[Boolean]("all_found"))
  }

  test("lengthQuantilesApprox lands within the sketch's rank bound") {
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val rows = TextOps.lengthQuantilesApprox(d).collect()
    val nLangs = d.select("lang").distinct().count()
    assert(rows.length == nLangs * 3) // one row per (lang, pct)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"),
      s"${r.getAs[String]("lang")} p${r.getAs[Double]("pct")}"))
    // a coarse sketch must still satisfy ITS OWN (wider) bound
    val coarse = TextOps.lengthQuantilesApprox(d, accuracy = 100).collect()
    coarse.foreach(r => assert(r.getAs[Boolean]("within_bound")))
  }

  test("lengthQuantiles selects exact rank-index values per language") {
    // 10 docs with lengths 1..10 (texts of i chars): p50 -> rank 5,
    // p90 -> rank 9, p99 -> rank 10
    val d = docsDf((1L to 10L).map(i => (i, "x" * i.toInt, "en", "s")))
    val q = TextOps.lengthQuantiles(d).collect()(0)
    assert(q.getAs[Long]("n_docs") == 10L)
    assert(q.getAs[Long]("p50_chars") == 5L)
    assert(q.getAs[Long]("p90_chars") == 9L)
    assert(q.getAs[Long]("p99_chars") == 10L)
  }

  test("simhash is content-determined; hamming 0 for identical docs") {
    val sh = TextOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
    val pairs = TextOps.nearDupSimhash(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("langId recovers labels on separable corpora") {
    val corpus = docsDf(
      (1L to 6L).map(i => (i, "alpha beta alpha gamma", "en", "s")) ++
      (7L to 12L).map(i => (i, "un deux trois un deux", "fr", "s")))
    val out = TextOps.langId(corpus)
    assert(out.where(!$"correct").count() == 0)
  }

  test("quality ratios and tier boundaries") {
    val q = TextOps.quality(docsDf(Seq(
      (1L, "short text", "en", "s"), // 2 tokens -> too_short
      (2L, ("the " * 10).trim + " " + base, "en", "s")))) // stopword heavy
    val byId = q.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("quality_tier")).toMap
    assert(byId(1L) == "too_short")
    assert(byId(2L) == "boilerplate")
  }

  test("tokenCounts: bpe estimate is ceil(chars/4)") {
    val t = TextOps.tokenCounts(docsDf(Seq((1L, "abcde fgh", "en", "s"))))
      .collect()(0)
    assert(t.getAs[Long]("ws_tokens") == 2L)
    assert(t.getAs[Long]("bpe_est_tokens") == 3L) // 9 chars -> ceil 2.25
  }

  test("fingerprint: identical docs share every hash") {
    val f = TextOps.fingerprint(docs)
    val h1 = f.where($"doc_id" === 1).collect()(0)
    val h2 = f.where($"doc_id" === 2).collect()(0)
    assert(h1.getAs[String]("content_hash") == h2.getAs[String]("content_hash"))
    assert(h1.getAs[String]("min_shingle_hash") ==
      h2.getAs[String]("min_shingle_hash"))
  }

  test("sampleStratified: rate 0 drops, 1000 keeps, default fills gaps") {
    val corpus = docsDf((0L until 200L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "fr", "s")))
    val kept = TextOps.sampleStratified(corpus,
      Seq(("en", 0L), ("fr", 1000L)))
    val langs = kept.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("en"))
    assert(langs("fr") == 100L)
    // an unlisted stratum falls back to defaultPermille
    val deflt = TextOps.sampleStratified(corpus, Seq(("en", 0L)), 1000L)
    assert(deflt.where($"lang" === "fr").count() == 100L)
    assertThrows[IllegalArgumentException](
      TextOps.sampleStratified(corpus, Seq(("en", 1001L))))
    // a duplicated stratum would fan out the rates join
    assertThrows[IllegalArgumentException](
      TextOps.sampleStratified(corpus, Seq(("en", 250L), ("en", 500L))))
  }

  test("sampleStratified: decision depends on doc_id only") {
    val a = docsDf(Seq((1L, "some text", "en", "s"),
      (2L, "other text", "en", "s")))
    val b = docsDf(Seq((1L, "REWRITTEN", "en", "s"),
      (2L, "also rewritten", "en", "s")))
    val rates = Seq(("en", 500L))
    val keptA = TextOps.sampleStratified(a, rates)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val keptB = TextOps.sampleStratified(b, rates)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(keptA == keptB)
  }

  test("tfidfTopTerm: quantized idf prefers the rare repeated term") {
    // "rare" appears in 1 of 4 docs -> idf_q = floor(log2(4)) = 2;
    // "common" in all 4 -> idf_q = 0. Doc 1's top term must be rare
    // (score 2*2=4) even though common has tf 3 (score 0).
    val corpus = docsDf(Seq(
      (1L, "common common common rare rare", "en", "s"),
      (2L, "common half", "en", "s"),
      (3L, "common half", "en", "s"),
      (4L, "common x", "en", "s")))
    val top = TextOps.tfidfTopTerm(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("top_term"), r.getAs[Long]("idf_q"),
          r.getAs[Long]("score"))).toMap
    assert(top(1L) == (("rare", 2L, 4L)))
    // "half" is in 2 of 4 docs -> idf_q = floor(log2(2)) = 1
    assert(top(2L) == (("half", 1L, 1L)))
    // doc 4: "x" (df 1, idf 2) beats "common" (idf 0)
    assert(top(4L)._1 == "x")
  }

  test("tfidfTopTerm: all-zero scores tie-break on the term order") {
    // every term in every doc -> all idf_q 0 -> alphabetical argmax
    val corpus = docsDf(Seq(
      (1L, "zeta alpha", "en", "s"),
      (2L, "alpha zeta", "en", "s")))
    TextOps.tfidfTopTerm(corpus).collect().foreach(r =>
      assert(r.getAs[String]("top_term") == "alpha"))
  }

  test("seqPack: greedy boundaries, oversize docs, shard scoping") {
    // token counts: doc 0 -> 3, doc 1 -> 3, doc 2 -> 2, doc 3 -> 9
    // (oversize), doc 4 -> 2; budget 5, shard 100
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val corpus = docsDf(Seq(
      (0L, words(3), "en", "s"), (1L, words(3), "en", "s"),
      (2L, words(2), "en", "s"), (3L, words(9), "en", "s"),
      (4L, words(2), "en", "s"),
      (100L, words(2), "en", "s"))) // next shard: pack ids restart
    val out = TextOps.seqPack(corpus, maxTokens = 5, shardDocs = 100)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("pack_id"),
          r.getAs[Long]("pack_fill")))).toMap
    assert(out(0L) == ((0L, 0L, 3L))) // opens pack 0
    assert(out(1L) == ((0L, 1L, 3L))) // 3+3 > 5 -> new pack
    assert(out(2L) == ((0L, 1L, 5L))) // fits exactly
    assert(out(3L) == ((0L, 2L, 9L))) // oversize doc: own pack
    assert(out(4L) == ((0L, 3L, 2L))) // oversize pack is full
    assert(out(100L) == ((1L, 0L, 2L))) // new shard restarts at pack 0
    assertThrows[IllegalArgumentException](
      TextOps.seqPack(corpus, maxTokens = 0))
  }

  test("qualityFilter composes tier, pii, and length reasons") {
    val long20 = (1 to 25).map(i => s"tok$i").mkString(" ")
    val corpus = docsDf(Seq(
      (1L, long20, "en", "s"), // ok: >= 20 distinct tokens
      (2L, "short text", "en", "s"), // too_short
      (3L, long20 + " mail me a@b.com", "en", "s"), // pii only
      (4L, "short 12345-678-90", "en", "s"))) // too_short AND pii
    val f = TextOps.qualityFilter(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[String]("reasons")))).toMap
    assert(f(1L) == ((true, "")))
    assert(f(2L) == ((false, "too_short")))
    assert(f(3L) == ((false, "pii")))
    assert(f(4L) == ((false, "too_short,pii")))
    // the length cap fires and joins the reason list
    val capped = TextOps.qualityFilter(corpus, maxChars = 5L)
      .where($"doc_id" === 2L).collect()(0)
    assert(!capped.getAs[Boolean]("keep"))
    assert(capped.getAs[String]("reasons") == "too_short,too_long")
  }

  test("decontaminate flags containment, not mere overlap") {
    val bench = docsDf(Seq(
      (100L, "alpha beta gamma delta epsilon", "en", "b")))
    val corpus = docsDf(Seq(
      // identical text -> containment 1.0 -> contaminated
      (1L, "alpha beta gamma delta epsilon", "en", "c"),
      // shares ONE shingle of its four -> 0.25 < 0.8 -> clean
      (2L, "alpha beta gamma other words six", "en", "c"),
      // disjoint -> 0 shared
      (3L, "completely different token stream here", "en", "c")))
    val out = TextOps.decontaminate(corpus, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated"))))
      .toMap
    assert(out(1L) == ((3L, true)))
    assert(out(2L)._1 >= 1L && !out(2L)._2)
    assert(out(3L) == ((0L, false)))
    assertThrows[IllegalArgumentException](
      TextOps.decontaminate(corpus, bench, num = 3, den = 2))
  }

  test("repetition separates dominated, repetitive, and varied docs") {
    val d = docsDf(Seq(
      (1L, "a b a b a b a b", "en", "s"), // bigram "a b" 4/7; tri 6 total, 2 distinct
      (2L, "w x y z q r s t", "en", "s"))) // all distinct
    val out = TextOps.repetition(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") == 7L)
    assert(r1.getAs[Long]("top_bigram_c") == 4L)
    assert(r1.getAs[Double]("top_bigram_frac") == 4.0 / 7)
    assert(r1.getAs[Long]("n_trigrams") == 6L)
    assert(r1.getAs[Long]("n_distinct_trigrams") == 2L)
    assert(r1.getAs[Double]("dup_trigram_frac") == 4.0 / 6)
    val r2 = out(2L)
    assert(r2.getAs[Long]("top_bigram_c") == 1L)
    assert(r2.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("dupNgramSpans counts cross-document occurrences only") {
    val d = docsDf(Seq(
      (1L, "p q r s t", "en", "s"), // pqr qrs rst; pqr shared with doc 2
      (2L, "p q r x y", "en", "s"), // pqr qrx rxy
      (3L, "m n o u v", "en", "s"), // disjoint
      (4L, "z z z z z", "en", "s"))) // 3x "z z z" but only within ONE doc
    val out = TextOps.dupNgramSpans(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams")))).toMap
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 1L)))
    assert(out(3L) == ((3L, 0L)))
    // within-doc repetition is repetition, not cross-doc duplication
    assert(out(4L) == ((3L, 0L)))
  }

  test("dedupSpans excises cross-doc runs, keeping the smallest doc's " +
      "copy and splitting around mid-doc excisions") {
    val d = docsDf(Seq(
      (1L, "p q r s t", "en", "s"), // canonical holder of "p q r"
      (2L, "a b p q r c d", "en", "s"), // mid-doc copy -> split in two
      (3L, "p q r s t", "en", "s"), // full duplicate of 1 -> emptied
      (4L, "z z z z z", "en", "s"), // within-doc repetition only
      (5L, "a b", "en", "s"))) // below the 3-token window
    val out = TextOps.dedupSpans(d, minTokens = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 keeps everything: it is min_doc of all its shingles
    assert(out(1L).getAs[Long]("n_removed") == 0L)
    assert(out(1L).getAs[String]("text_clean") == "p q r s t")
    assert(out(1L).getAs[Long]("n_segments") == 1L)
    // doc 2 loses the copied run, keeping the flanks as two segments
    assert(out(2L).getAs[String]("text_clean") == "a b c d")
    assert(out(2L).getAs[Long]("n_removed") == 3L)
    assert(out(2L).getAs[Long]("n_segments") == 2L)
    // doc 3: every position covered by a duplicated window -> empty
    assert(out(3L).getAs[String]("text_clean") == "")
    assert(out(3L).getAs[Long]("n_removed") == 5L)
    assert(out(3L).getAs[Long]("n_segments") == 0L)
    assert(out(3L).getAs[Double]("removed_frac") == 1.0)
    // within-doc repetition is not cross-doc duplication
    assert(out(4L).getAs[Long]("n_removed") == 0L)
    // a doc below the window size passes through unchanged
    assert(out(5L).getAs[String]("text_clean") == "a b")
    assert(out(5L).getAs[Long]("n_segments") == 1L)
  }

  test("globalShuffle is a deterministic permutation with dense " +
      "per-shard positions") {
    val corpus = Tables(spark, "/root/testdata/sf0.001").documents
    val out = TextOps.globalShuffle(corpus, nShards = 64)
    val n = corpus.count()
    assert(out.count() == n)
    assert(out.select($"doc_id").distinct().count() == n)
    // positions within each shard are exactly 1..|shard|
    val shards = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos_in_shard").as("lo"),
        max($"pos_in_shard").as("hi"),
        countDistinct($"pos_in_shard").as("nd"))
      .collect()
    shards.foreach { s =>
      assert(s.getAs[Long]("lo") == 1L)
      assert(s.getAs[Long]("hi") == s.getAs[Long]("n"))
      assert(s.getAs[Long]("nd") == s.getAs[Long]("n"))
    }
    // content-independent determinism: a re-run reproduces the order
    val again = TextOps.globalShuffle(corpus, nShards = 64)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("mixRebalance caps, trims, and drops sources by token mass") {
    val corpus = Tables(spark, "/root/testdata/sf0.001").documents
    // src0 far above natural mass (capped), src1 below (trimmed),
    // src2..19 unlisted (dropped)
    val out = TextOps.mixRebalance(corpus,
      Seq(("src0", 200L), ("src1", 30L)))
    val kept = out.groupBy($"source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(kept.keySet == Set("src0", "src1"))
    val src0Total = corpus.where($"source" === "src0").count()
    val src1Total = corpus.where($"source" === "src1").count()
    assert(kept("src0") == src0Total, "capped source must keep all docs")
    assert(kept("src1") < src1Total, "below-target source must trim")
    assert(kept("src1") > 0L)
    // rate derivation is exact: keep_permille for the capped source is
    // exactly 1000
    assert(out.where($"source" === "src0")
      .select(min($"keep_permille")).collect()(0).getLong(0) == 1000L)
    assertThrows[IllegalArgumentException](
      TextOps.mixRebalance(corpus, Seq(("a", 600L), ("b", 600L))))
    assertThrows[IllegalArgumentException](
      TextOps.mixRebalance(corpus, Seq(("a", 10L), ("a", 10L))))
  }

  test("vocabBuild prunes by min-df floor and max-df ceiling") {
    val d = docsDf(Seq(
      (1L, "common rare stopper stopper", "en", "s"),
      (2L, "common stopper", "en", "s"),
      (3L, "common stopper", "en", "s"),
      (4L, "common stopper", "en", "s")))
    // df: common=4, stopper=4, rare=1; max-df 3/4 drops common+stopper,
    // min-df 2 drops rare -> empty vocab
    assert(TextOps.vocabBuild(d, minDf = 2, maxDfNum = 3, maxDfDen = 4)
      .isEmpty)
    // ceiling at 4/4 keeps both survivors of the floor, ranked tf desc
    val v = TextOps.vocabBuild(d, minDf = 2, maxDfNum = 1, maxDfDen = 1)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("word"),
        r.getAs[Long]("tf"), r.getAs[Long]("df")))
    assert(v.toSeq == Seq((1L, "stopper", 5L, 4L), (2L, "common", 4L, 4L)))
    // topK cuts AFTER the ordering
    val v1 = TextOps.vocabBuild(d, minDf = 2, maxDfNum = 1, maxDfDen = 1,
      topK = 1).collect()
    assert(v1.length == 1 && v1(0).getAs[String]("word") == "stopper")
    assertThrows[IllegalArgumentException](TextOps.vocabBuild(d, minDf = 0))
  }

  test("bpePairStats counts within-word adjacent pairs only") {
    val d = docsDf(Seq(
      (1L, "abab ab", "en", "s"), // abab: ab,ba,ab; ab: ab -> ab=4? no: ab x3, ba x1
      (2L, "cd x", "en", "s"))) // cd: cd; x too short
    val out = TextOps.bpePairStats(d).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n_pairs")).toMap
    // no cross-word pair ("b a" across the space, "b c" across docs)
    assert(out == Map("ab" -> 3L, "ba" -> 1L, "cd" -> 1L))
    val ranked = TextOps.bpePairStats(d).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("pair")))
    assert(ranked.toSeq == Seq((1L, "ab"), (2L, "ba"), (3L, "cd")))
  }

  test("minhashRegistry registers every doc, signatures only above the floor") {
    val d = docsDf(Seq(
      (1L, "one two three four", "en", "s"),
      (2L, "too short", "en", "s"))) // 2 tokens -> below shingle floor
    val reg = TextOps.minhashRegistry(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(reg.size == 2)
    // short doc: registered with its content hash, NULL signature
    assert(!reg(2L).isNullAt(reg(2L).fieldIndex("content_hash")))
    assert(reg(2L).isNullAt(reg(2L).fieldIndex("m0")))
    // signature-bearing doc: identical to minhashSignature's values
    val sig = TextOps.minhashSignature(d).collect()
    assert(sig.length == 1 && sig(0).getLong(0) == 1L)
    (0 until 16).foreach { k =>
      val f = s"m$k"
      assert(reg(1L).getString(reg(1L).fieldIndex(f)) ==
        sig(0).getString(sig(0).fieldIndex(f)), f)
    }
  }

  test("bpeMerges runs the full iterated trainer with canonical greedy merges") {
    // round 1: pairs in "aaaa" -> (a,a) x3 (weighted x2 docs = 6),
    // "bcbc" -> (b,c) x2, (c,b) x1. winner (a,a).
    // canonical greedy run-merge: [a,a,a,a] -> [aa,aa], NOT [aa,a,a] —
    // the wrapped-symbol replace must not consume the run boundary.
    val d = docsDf(Seq(
      (1L, "aaaa bcbc", "en", "s"),
      (2L, "aaaa", "en", "s")))
    val out = TextOps.bpeMerges(d, rounds = 10).collect()
      .map(r => (r.getAs[Long]("merge_round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("n_pairs")))
      .sortBy(_._1)
    assert(out(0) == ((1L, "a", "a", "aa", 6L)))
    // round 2: "aaaa" is now [aa,aa] (pair (aa,aa) x2 weighted), bcbc
    // unchanged -> (b,c) x2 and (c,b) x1; tie 2 vs 2 broken by lhs asc
    assert(out(1) == ((2L, "aa", "aa", "aaaa", 2L)))
    // round 3: only bcbc pairs remain: (b,c) x2 wins
    assert(out(2) == ((3L, "b", "c", "bc", 2L)))
    // round 4: [bc,bc] -> (bc,bc) x1
    assert(out(3) == ((4L, "bc", "bc", "bcbc", 1L)))
    // every word fully merged -> trainer stops EARLY, well before 10
    assert(out.length == 4, s"expected early stop at 4, got ${out.length}")
    assertThrows[IllegalArgumentException](TextOps.bpeMerges(d, 0))
  }

  test("bpeMerges: winners are monotone non-increasing; minCount stops the prefix") {
    // the law the convergence stop (and the text_bpe_converged oracle)
    // rests on: merging the max-count pair can only create pairs whose
    // occurrences each contain the merged symbol, so no later round
    // beats the count that won this one
    val d = docsDf(Seq(
      (1L, "abab abab cdcd", "en", "s"),
      (2L, "abab cdcd efef", "en", "s"),
      (3L, "wxyz", "en", "s")))
    val full = TextOps.bpeMerges(d, rounds = 20).collect()
      .map(r => (r.getAs[Long]("merge_round"), r.getAs[Long]("n_pairs")))
      .sortBy(_._1)
    assert(full.length >= 4)
    full.sliding(2).foreach { case Array((r1, n1), (r2, n2)) =>
      assert(n1 >= n2, s"round $r1 ($n1) < round $r2 ($n2): law broken")
    }
    // a floor between two observed winners stops training at exactly
    // the filtered prefix of the unconstrained run
    val distinctCounts = full.map(_._2).distinct
    assert(distinctCounts.length >= 2, "fixture needs a count drop")
    val floor = distinctCounts(1) + 1 // above the 2nd distinct winner
    val stopped = TextOps.bpeMerges(d, rounds = 20, minCount = floor)
      .collect()
      .map(r => (r.getAs[Long]("merge_round"), r.getAs[Long]("n_pairs")))
      .sortBy(_._1)
    assert(stopped.sameElements(full.filter(_._2 >= floor)),
      s"stopped=${stopped.toSeq} vs full=${full.toSeq} floor=$floor")
    // encode under the floor equals encode trained for exactly the
    // surviving rounds — the stop changes WHEN training ends, never
    // what the trained prefix means
    val viaFloor = TextOps.bpeEncode(d, rounds = 20, minCount = floor)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val viaRounds = TextOps.bpeEncode(d, rounds = stopped.length.max(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(viaFloor.sameElements(viaRounds))
    assertThrows[IllegalArgumentException](
      TextOps.bpeMerges(d, rounds = 5, minCount = 0L))
  }

  test("bpeEncode applies the trained merges to the corpus") {
    val d = docsDf(Seq(
      (1L, "aaaa bcbc x", "en", "s"),
      (2L, "aaaa", "en", "s")))
    def counts(rounds: Int): Map[Long, Long] =
      TextOps.bpeEncode(d, rounds).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens"))
        .toMap
    // after round 1 (merge (a,a)): aaaa->[aa,aa]=2, bcbc->4 chars,
    // x->1 (single-char word, below the trainer's pair floor)
    assert(counts(1) == Map(1L -> 7L, 2L -> 2L))
    // trained to convergence every word is one token
    assert(counts(10) == Map(1L -> 3L, 2L -> 1L))
  }

  test("chunk covers every token with bounded overlapping windows") {
    val d = docsDf(Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" "), "en", "s"), // 20 toks
      (2L, "a b c", "en", "s"))) // shorter than one window
    val out = TextOps.chunk(d, maxTokens = 8, stride = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunk_tokens")))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts every 4 tokens; last window reaches token 20 exactly
    assert(d1.map(_._3).toSeq == Seq(0L, 4L, 8L, 12L))
    assert(d1.map(_._4).toSeq == Seq(8L, 8L, 8L, 8L))
    assert(d1.last._3 + d1.last._4 == 20L)
    // a short doc is one whole-document chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L)))
    assertThrows[IllegalArgumentException](
      TextOps.chunk(d, maxTokens = 4, stride = 5))
  }

  test("seqPack: every pack is within budget unless a lone oversize doc") {
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.seqPack(Tables(spark, dir).documents, 512, 200)
    val packs = out.groupBy($"lang", $"shard", $"pack_id")
      .agg(max($"pack_fill").as("fill"), count(lit(1)).as("n_docs"))
      .collect()
    packs.foreach { p =>
      assert(p.getAs[Long]("fill") <= 512 || p.getAs[Long]("n_docs") == 1,
        s"overfull multi-doc pack: $p")
    }
    // no document is lost or duplicated
    assert(out.select($"doc_id").distinct().count() == out.count())
    assert(out.count() == Tables(spark, dir).documents.count())
  }

  test("lmScore: common continuations are cheap, rare ones cost bits") {
    val d = docsDf(Seq(
      (1L, "a b a b", "en", "s"), // bigrams (a,b)x2 (b,a)x1
      (2L, "a c", "en", "s"), // the rare continuation of context a
      (3L, "x", "en", "s"))) // 1 token: no bigrams, not assessable
    val out = TextOps.lmScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("nll_sum"), r.getAs[Long]("n_bigrams"),
          r.getAs[Double]("avg_nll"))).toMap
    // LM: c(a,b)=2 c(b,a)=1 c(a,c)=1; contexts c(a)=3 c(b)=1
    // q(a,b)=floor(log2(3 div 2))=0; q(b,a)=floor(log2(1))=0;
    // q(a,c)=floor(log2(3 div 1))=1
    assert(out(1L) == ((0L, 3L, 0.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(!out.contains(3L))
    assert(out(2L)._3 > out(1L)._3) // the improbable doc scores higher
  }

  test("dsirWeight: target-like raw docs outweigh out-of-domain ones") {
    val d = docsDf(Seq(
      (1L, "t t t t t t t", "en", "src0"), // the trusted target slice
      (2L, "t t t", "en", "srcX"), // raw, target-like
      (3L, "z z z", "en", "srcX"), // raw, out-of-domain
      (4L, "q", "en", "srcX"))) // raw, 1 token: unigram feature only
    val out = TextOps.dsirWeight(d, "src0").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("avg_weight"))).toMap
    assert(!out.contains(1L)) // target docs are the model, not the output
    assert(out(2L)._1 == 5L) // 3 unigrams + 2 bigrams
    assert(out(4L)._1 == 1L) // no null bigram features from a 1-token doc
    // 't' features have target mass, 'z'/'q' features have none
    assert(out(2L)._2 > out(3L)._2)
    assert(out(3L)._2 < 0.0) // raw-only features weigh negative
    assertThrows[IllegalArgumentException](
      TextOps.dsirWeight(d, "src0", nBuckets = 1000))
  }

  test("mixTemperature: q=1 is proportional passthrough; q=2 flattens toward small sources") {
    import spark.implicits._
    // 3 sources with very different token masses
    val d = docsDf(
      (1L to 60L).map(i => (i, "a b c d e f g h i j", "en", "big")) ++
        (61L to 75L).map(i => (i, "a b c d e f g h i j", "en", "mid")) ++
        (76L to 80L).map(i => (i, "a b c d e f g h i j", "en", "small")))
    // q = 1: p_s proportional to n_s, budget = total -> keep rate 1000
    // everywhere, every doc kept
    val q1 = TextOps.mixTemperature(d, q = 1)
    assert(q1.count() == 80L)
    assert(q1.select("keep_permille").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1000L))
    // q = 2: the scarcest-after-flattening source (smallest n_s) caps
    // the budget at keep ~1000; bigger sources keep LESS than smaller
    val q2 = TextOps.mixTemperature(d, q = 2)
      .select($"source", $"keep_permille").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q2("small") > q2("mid") && q2("mid") > q2("big"),
      s"flattening must favor scarce sources, got $q2")
    assert(q2("small") >= 990L, s"cap source should keep ~all, got $q2")
    // the integer root is exact: 600 tokens -> isqrt 24 (24^2=576),
    // 150 -> 12, 50 -> 7; totT = 43; budget = min(600*43 div 24,
    // 150*43 div 12, 50*43 div 7) = min(1075, 537, 307) = 307 (the
    // small source binds); keep(big) = 307*24*1000 div (43*600) = 285,
    // keep(mid) = 571, keep(small) = 999
    assert(q2("big") == 285L && q2("mid") == 571L &&
      q2("small") == 999L, s"exact-arithmetic drift: $q2")
  }

  test("mixTemperature: driver-collapsed rates equal the distributed " +
    "route bit-for-bit (both q, degenerate sources included)") {
    import spark.implicits._
    val d = docsDf(
      (1L to 60L).map(i => (i, "a b c d e f g h i j", "en", "big")) ++
        (61L to 75L).map(i => (i, "a b c d e f g h i j", "en", "mid")) ++
        (76L to 80L).map(i => (i, "a b c d e f g h i j", "en", "small")) ++
        Seq((81L, "x", "en", "tiny"))) // 1 token: pow/floor edge
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    for (q <- Seq(1, 2, 3)) {
      // localSourceLimit = 1 forces the distributed arm (4 sources)
      val dist = TextOps.mixTemperature(d, q = q, localSourceLimit = 1)
      val coll = TextOps.mixTemperature(d, q = q)
      assert(rows(coll) == rows(dist),
        s"collapsed vs distributed mixTemperature diverge at q=$q")
      assert(coll.schema.map(f => (f.name, f.dataType)) ==
        dist.schema.map(f => (f.name, f.dataType)))
    }
    // explicit-totals door, with a 0-token source (null t_s in the
    // plan: sum/min skip it, least(1000, null) = 1000 — the driver
    // mirror must reproduce that, not divide by zero)
    val bySource = Seq(("big", 600L), ("mid", 150L), ("small", 50L),
      ("empty", 0L)).toDF("source", "source_tokens")
    val distW = TextOps.mixTemperatureWith(d, bySource, q = 2,
      localSourceLimit = 1)
    val collW = TextOps.mixTemperatureWith(d, bySource, q = 2)
    assert(rows(collW) == rows(distW),
      "collapsed vs distributed mixTemperatureWith diverge on a " +
        "0-token source")
  }

  test("corpusReport: exact per-source masses and short-doc permille") {
    import spark.implicits._
    val d = docsDf(Seq(
      (1L, "a b c d e f", "en", "s1"),  // 6 tokens
      (2L, "a b", "en", "s1"),          // 2 tokens (short at default 5)
      (3L, "x y z", "de", "s1"),        // 3 tokens (short)
      (4L, "one two three four five", "en", "s2"))) // 5 tokens (not short)
    val r = TextOps.corpusReport(d).collect()
      .map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    assert(s1.getLong(1) == 3L && s1.getLong(2) == 2L) // n_docs, n_langs
    assert(s1.getLong(3) == 11L)                       // total_tokens
    assert(s1.getLong(5) == 2L && s1.getLong(6) == 6L) // min, max
    assert(s1.getDouble(7) == 11.0 / 3)                // avg: ONE division
    assert(s1.getLong(8) == 666L)                      // 2 of 3 short
    assert(r("s2").getLong(8) == 0L)                   // 5 tokens: not short
    // the threshold is a parameter: at 7, everything in s2 is short
    val strict = TextOps.corpusReport(d, shortTokens = 7).collect()
      .map(x => x.getString(0) -> x.getLong(8)).toMap
    assert(strict("s2") == 1000L)
  }

  test("reliable-checkpoint flag: every pin site flips to storage-backed checkpoint") {
    // local[*] pins lineage with localCheckpoint (executor-local,
    // lost on executor failure); cluster deployments set the one flag
    // and every pinned intermediate goes through the fault-tolerant
    // checkpoint dir instead — results must be identical either way
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val local = TextOps.lmScore(docs).collect().map(_.toString).sorted
    val ckptDir =
      java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    spark.conf.set(graft.operators.Stage.ReliableFlag, "true")
    try {
      val reliable = TextOps.lmScore(docs)
        .collect().map(_.toString).sorted
      assert(reliable.sameElements(local))
      // and the pin really went through the checkpoint dir
      assert(Option(ckptDir.toFile.list()).exists(_.nonEmpty),
        "reliable mode wrote nothing to the checkpoint dir")
    } finally
      spark.conf.set(graft.operators.Stage.ReliableFlag, "false")
  }

  test("cleanRepetition excises later WITHIN-doc copies, keeping the " +
    "first occurrence; cross-doc duplication is untouched") {
    val d = docsDf(Seq(
      (1L, "z z z z z", "en", "s"), // overlapping self-repeat
      (2L, "a b c a b c d", "en", "s"), // disjoint self-repeat
      (3L, "p q r s t", "en", "s"), // no repeats
      (4L, "p q r s t", "en", "s"))) // cross-doc dup of 3: NOT excised
    val out = TextOps.cleanRepetition(d, minTokens = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "z z z z z": windows at 0,1,2 share one shingle; 0 keeps, the
    // covers of 1 and 2 blanket positions 1..4 -> only token 0 stays
    assert(out(1L).getAs[String]("text_clean") == "z")
    assert(out(1L).getAs[Long]("n_removed") == 4L)
    assert(out(1L).getAs[Long]("n_segments") == 1L)
    // "a b c a b c d": "a b c" repeats at 0 and 3; cover 3..5 excises
    // the second copy, "d" survives as a second segment
    assert(out(2L).getAs[String]("text_clean") == "a b c d")
    assert(out(2L).getAs[Long]("n_removed") == 3L)
    assert(out(2L).getAs[Long]("n_segments") == 2L)
    // within-doc semantics only: identical docs 3 and 4 both keep
    // everything (that is dedupSpans' job)
    Seq(3L, 4L).foreach { id =>
      assert(out(id).getAs[Long]("n_removed") == 0L)
      assert(out(id).getAs[String]("text_clean") == "p q r s t")
    }
  }

  test("unigramVocab: Viterbi-EM keeps used pieces, drops unused seeds, " +
    "and re-derives exact bit-length costs") {
    // wf: ab -> 2, abab -> 1. Seed counts: a 4, b 4, ab 4, ba/aba/bab/
    // abab 1 each; V=2 keeps (ab, aba). tot 13, costs: a/b/ab
    // floor(log2(13 div 4)) = 1, aba floor(log2 13) = 3. The E-step
    // then segments both words as [ab]+ -> usage ab = 4, a/b unused;
    // M-step: a/b smoothed to 1, ab to 5, aba pruned (zero usage);
    // tot 7 -> costs a/b = floor(log2 7) = 2, ab = floor(log2 1) = 0.
    val d = docsDf(Seq((1L, "ab ab abab", "en", "s")))
    val v = TextOps.unigramVocab(d, maxPieceLen = 4, vocabSize = 2,
      rounds = 1).collect()
      .map(r => r.getAs[String]("piece") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("c"),
          r.getAs[Long]("cost_q")))).toMap
    assert(v.keySet == Set("a", "b", "ab"))
    assert(v("ab") == ((1L, 5L, 0L)))
    assert(v("a") == ((2L, 1L, 2L)))
    assert(v("b") == ((3L, 1L, 2L)))
  }

  test("unigramEncode: per-doc piece counts and NLL under the trained " +
    "vocabulary; ties break to the smallest last piece") {
    val d = docsDf(Seq((1L, "ab ab abab", "en", "s")))
    val out = TextOps.unigramEncode(d, maxPieceLen = 4, vocabSize = 2,
      rounds = 1).collect()
    assert(out.length == 1)
    val r = out(0)
    // ab -> [ab] (1 piece, cost 0) twice; abab -> [ab, ab] (2 pieces)
    assert(r.getAs[Long]("n_pieces") == 4L)
    assert(r.getAs[Long]("nll_sum") == 0L)
    assert(r.getAs[Double]("avg_nll") == 0.0)
  }

  test("extractHtml strips script/style wholesale, breaks lines at " +
    "structure, decodes entities last, and drops low-density lines") {
    val df = Seq((1L,
      "<html><head><title>T</title>" +
        "<style>body { color: red; }</style></head><body>" +
        "<nav>home about</nav><script>var a = 1 < 2;</script>" +
        "<p>alpha beta gamma delta epsilon</p>" +
        "<p>one &amp; two &lt;three&gt; four</p>" +
        "<p>escaped &amp;lt; stays literal here</p>" +
        "<ul><li>ad</li><li>buy now</li></ul>" +
        "<div>tiny</div></body></html>"))
      .toDF("doc_id", "html")
    val out = TextOps.extractHtml(df).collect()
    assert(out.length == 1)
    val r = out(0)
    // script body ("1 < 2" would shed "< 2;" into text if tags were
    // stripped first) and style rules are gone wholesale; the three
    // <p> lines survive the density filter; title/nav/li/div chrome
    // does not
    assert(r.getAs[String]("text_extracted") ==
      "alpha beta gamma delta epsilon\n" +
        "one & two <three> four\n" +
        "escaped &lt; stays literal here")
    // nonblank lines: T | home about | 3x prose | ad | buy now | tiny
    assert(r.getAs[Long]("n_lines") == 8L)
    assert(r.getAs[Long]("n_lines_kept") == 3L)
    assert(r.getAs[Long]("n_chars") ==
      r.getAs[String]("text_extracted").length.toLong)
  }

  test("dedupSurvivorsBest keeps each group's LONGEST member, not its " +
    "min doc_id") {
    // docs 1,2 exact dups, 3 near-dup with ONE extra token -> the
    // quality-aware policy keeps 3 (longest), where dedupSurvivors
    // keeps 1 (first)
    val best = TextOps.dedupSurvivorsBest(docs)
      .select($"doc_id").as[Long].collect().sorted
    assert(best.sameElements(Array(3L, 4L)))
    val first = TextOps.dedupSurvivors(docs)
      .select($"doc_id").as[Long].collect().sorted
    assert(first.sameElements(Array(1L, 4L)))
  }

  test("dedupLines removes lines shared by >= minDf docs from ALL of " +
    "them, keeps order, and counts exactly") {
    val d = Seq(
      (1L, "shared header\nunique alpha\nshared footer"),
      (2L, "shared header\nunique beta\nboth twice\nshared footer"),
      (3L, "shared header\nboth twice\nunique gamma\nshared footer"))
      .toDF("doc_id", "text")
    val out = TextOps.dedupLines(d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // header/footer in 3 docs, "both twice" in 2 -> all removed
    assert(out(1L).getAs[String]("text_deduped") == "unique alpha")
    assert(out(2L).getAs[String]("text_deduped") == "unique beta")
    assert(out(3L).getAs[String]("text_deduped") == "unique gamma")
    assert(out(2L).getAs[Long]("n_lines") == 4L)
    assert(out(2L).getAs[Long]("n_lines_kept") == 1L)
    // a doc whose every line is boilerplate survives as an empty text
    val all = TextOps.dedupLines(d.unionAll(Seq(
        (4L, "shared header\nshared footer")).toDF("doc_id", "text")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(all(4L).getAs[String]("text_deduped") == "")
    assert(all(4L).getAs[Long]("n_lines_kept") == 0L)
    // raising minDf above the max df keeps everything
    val keepAll = TextOps.dedupLines(d, minDf = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(keepAll(1L).getAs[String]("text_deduped") ==
      "shared header\nunique alpha\nshared footer")
  }

  test("pplBuckets: the sharded distributed rank equals a direct global " +
    "ordering; buckets split as evenly as possible") {
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val out = TextOps.pplBuckets(d).collect()
    // direct (single-partition) reference ordering over the same scores
    val ref = TextOps.lmScore(d)
      .select($"doc_id", $"avg_nll").collect()
      .sortBy(r => (r.getAs[Double]("avg_nll"), r.getAs[Long]("doc_id")))
      .zipWithIndex
      .map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1).toLong }
      .toMap
    out.foreach { r =>
      assert(r.getAs[Long]("ppl_rank") == ref(r.getAs[Long]("doc_id")),
        s"rank mismatch for doc ${r.getAs[Long]("doc_id")}")
    }
    val sizes = out.groupBy(_.getAs[Int]("bucket")).view
      .mapValues(_.length).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"bucket sizes not even: $sizes")
    // the shard granularity is a skew knob, not a semantics knob:
    // any granularity yields the identical ranking
    val fine = TextOps.pplBuckets(d, granularity = 64)
      .select($"doc_id", $"ppl_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(
      fine(r.getAs[Long]("doc_id")) == r.getAs[Long]("ppl_rank")))
  }

  test("canonicalizeUrl: each rule pinned; urlDedup and capPerDomain " +
    "compose on the canonical key") {
    val urls = Seq(
      // scheme+host case, www, default port, tracking params,
      // unsorted survivors, fragment, trailing slash
      (1L, "HTTPS://WWW.News.Example.COM:443/a/b/?z=1&utm_source=x&a=2#top"),
      (2L, "https://news.example.com/a/b?a=2&z=1"), // canonical twin of 1
      (3L, "http://blog.example.com:80"),           // bare host -> "/"
      (4L, "http://blog.example.com/?ref=tw&utm_campaign=s"), // all params drop
      (5L, "https://other.org/path"))
      .toDF("doc_id", "url")
    val c = TextOps.canonicalizeUrl(urls)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(c(1L).getAs[String]("canonical_url") ==
      "https://news.example.com/a/b?a=2&z=1")
    assert(c(2L).getAs[String]("canonical_url") ==
      c(1L).getAs[String]("canonical_url"))
    assert(c(3L).getAs[String]("canonical_url") ==
      "http://blog.example.com/")
    assert(c(4L).getAs[String]("canonical_url") ==
      "http://blog.example.com/")
    assert(c(5L).getAs[String]("canonical_url") == "https://other.org/path")
    assert(c(1L).getAs[String]("domain") == "example.com")
    assert(c(5L).getAs[String]("domain") == "other.org")
    // dedup keeps min doc_id per canonical page: 2 and 4 lose
    val kept = TextOps.urlDedup(TextOps.canonicalizeUrl(urls))
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 5L)))
    // the domain cap then bounds example.com to 1 doc
    val capped = TextOps.capPerDomain(
        TextOps.urlDedup(TextOps.canonicalizeUrl(urls)), 1)
      .select($"doc_id").as[Long].collect().sorted
    assert(capped.sameElements(Array(1L, 5L)))
  }

  test("nbClassify: argmax keep/drop with Laplace smoothing; unseen " +
    "words contribute qlog2(1) = 0; exact-tie keeps") {
    val d = docsDf(Seq(
      (1L, "good good good fine", "en", "p"),
      (2L, "good fine", "en", "p"),
      (3L, "bad bad bad ugly", "en", "n"),
      (4L, "bad ugly", "en", "n"),
      (10L, "good good", "en", "x"),
      (11L, "bad bad", "en", "x"),
      (12L, "zzz yyy", "en", "x")))
    val out = TextOps.nbClassify(d, "p", "n")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(10L, 11L, 12L))
    // hand arithmetic: V=4, N_p=N_n=6 -> qd=qlog2(10)=3; priors
    // d_p=d_n=2 -> qp = qlog2(3)-qlog2(6) = -1.
    // doc 10 (good x2): s_p = 2*qlog2(4+1) = 4, s_n = 2*qlog2(1) = 0
    //   -> score_p = -1+4-6 = -3, score_n = -1+0-6 = -7 -> keep
    assert(out(10L).getAs[Long]("score_p") == -3L)
    assert(out(10L).getAs[Long]("score_n") == -7L)
    assert(out(10L).getAs[String]("pred") == "keep")
    assert(out(10L).getAs[Double]("margin") == 2.0)
    // doc 11 is the mirror image -> drop
    assert(out(11L).getAs[String]("pred") == "drop")
    assert(out(11L).getAs[Double]("margin") == -2.0)
    // doc 12: both words unseen -> both scores collapse to priors +
    // normalizers (-7 each); the deterministic tie keeps
    assert(out(12L).getAs[Long]("score_p") ==
      out(12L).getAs[Long]("score_n"))
    assert(out(12L).getAs[String]("pred") == "keep")
  }

  test("lmScoreBackoff: hand-computed seen and backed-off arms") {
    // model "a b a b": c_ab(a,b)=2, c_ab(b,a)=1; ctx a=2, b=1;
    // uni b=2, a=1; N=3. score "a b c a":
    //  (a,b) seen:   2 div 2 = 1        -> q = 0
    //  (b,c) OOV rhs: cb=1, 15 div 2 = 7 -> q = 2
    //  (c,a) unseen: cb=2, 15 div 4 = 3  -> q = 1
    val model = TextOps.lmModel(docsDf(Seq((1L, "a b a b", "en", "s"))))
    val r = TextOps.lmScoreBackoff(
      docsDf(Seq((2L, "a b c a", "en", "s"))), model).collect()(0)
    assert(r.getAs[Long]("nll_sum") == 3L)
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("n_backoff") == 2L)
    assert(r.getAs[Double]("avg_nll") == 1.0)
  }

  test("packReport: hand-computed fill and oversize arithmetic") {
    // budget 10: doc1 (6) + doc2 (4) fill pack 0 exactly; doc3 (12)
    // overflows into its own pack -> 2 packs, 22 tokens, capacity 20,
    // fill_permille = 22000 div 20 = 1100 (>1000 BECAUSE of the
    // oversized doc — surfaced, not clamped)
    val d = docsDf(Seq(
      (1L, "a b c d e f", "en", "s"),
      (2L, "g h i j", "en", "s"),
      (3L, "k l m n o p q r s t u v", "en", "s")))
    val r = TextOps.packReport(d, maxTokens = 10, shardDocs = 100)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_docs") == 3L)
    assert(r(0).getAs[Long]("n_packs") == 2L)
    assert(r(0).getAs[Long]("total_tokens") == 22L)
    assert(r(0).getAs[Long]("n_oversize") == 1L)
    assert(r(0).getAs[Long]("capacity") == 20L)
    assert(r(0).getAs[Long]("fill_permille") == 1100L)
  }

  test("dupClusterStats: the fixture's one 3-doc cluster") {
    val r = TextOps.dupClusterStats(docs, threshold = 0.5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("cluster_size") == 3L)
    assert(r(0).getAs[Long]("n_clusters") == 1L)
  }

  test("gopherRules: every rule trips on its own violation only") {
    val stopRich = "the cat and the dog go to the park with all of them well"
    val d = docsDf(Seq(
      (1L, stopRich + (" wordier" * 10), "en", "s"), // passes all
      (2L, "too few of the and that words", "en", "s"), // < 20 words
      (3L, stopRich + (" word" * 100), "en", "s"), // > 90 words
      (4L, stopRich + (" a a a a a a a a a a a a"), "en", "s"), // mean wlen < 4
      (5L, ("word " * 24) + "nostopshere", "en", "s"))) // no stop words
    val out = TextOps.gopherRules(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("r_min_words") &&
      !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("r_max_words") &&
      !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("r_mean_wlen") &&
      !out(4L).getAs[Boolean]("keep"))
    assert(!out(5L).getAs[Boolean]("r_stops") &&
      !out(5L).getAs[Boolean]("keep"))
  }

  test("minhash index: serve parity with batch dedup; append equals " +
    "one-shot; a killed append leaves serving unchanged") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .localCheckpoint()
    import org.apache.spark.sql.functions.col
    val storedAll = all.where(col("doc_id") % 5 =!= 0)
    val stored1 = storedAll.where(col("doc_id") < 250)
    val stored2 = storedAll.where(col("doc_id") >= 250)
    val batch = all.where(col("doc_id") % 5 === 0)

    // one-shot index over the full stored slice: serving must equal
    // the batch-mode nearDupMinhash answer restricted to cross-slice
    // pairs (identical band candidates, identical exact-Jaccard)
    val idxFull = java.nio.file.Files
      .createTempDirectory("graft_mh_idx_full").toString
    TextOps.minhashIndexWrite(storedAll, idxFull)
    val served = TextOps.nearDupServe(spark, idxFull, batch).collect()
      .map(r => (Set(r.getLong(0), r.getLong(1)),
        r.getAs[Double]("jaccard"))).toSet
    val cross = TextOps.nearDupMinhash(all, 0.7).collect()
      .filter(r => (r.getLong(0) % 5 == 0) != (r.getLong(1) % 5 == 0))
      .map(r => (Set(r.getLong(0), r.getLong(1)),
        r.getAs[Double]("jaccard"))).toSet
    assert(served.nonEmpty && served == cross)

    // incremental: write half, kill the append in BOTH crash windows
    // (serving unchanged each time), then the retry completes and the
    // incremental index serves byte-identically to the one-shot one
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_idx_inc").toString
    TextOps.minhashIndexWrite(stored1, idx)
    val before = TextOps.nearDupServe(spark, idx, batch).collect()
      .map(_.toString).sorted
    for (window <- Seq("staged-written", "segment-renamed")) {
      val boom = intercept[RuntimeException] {
        TextOps.minhashIndexAppend(stored2, idx,
          fp => if (fp == window) throw new RuntimeException(s"kill@$fp"))
      }
      assert(boom.getMessage.contains(window))
      val after = TextOps.nearDupServe(spark, idx, batch).collect()
        .map(_.toString).sorted
      assert(after.sameElements(before),
        s"serving changed after a crash at '$window'")
    }
    TextOps.minhashIndexAppend(stored2, idx)
    val healed = TextOps.nearDupServe(spark, idx, batch).collect()
      .map(_.toString).sorted
    val oneShot = TextOps.nearDupServe(spark, idxFull, batch).collect()
      .map(_.toString).sorted
    assert(healed.sameElements(oneShot))
  }

  test("minhash index tombstones mask served pairs; compaction applies " +
    "and clears them") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .localCheckpoint()
    import org.apache.spark.sql.functions.col
    val stored = all.where(col("doc_id") % 5 =!= 0)
    val batch = all.where(col("doc_id") % 5 === 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_idx_del").toString
    TextOps.minhashIndexWrite(stored, idx)
    val before = TextOps.nearDupServe(spark, idx, batch).collect()
    // delete one doc_a that actually serves a pair: its pairs must
    // disappear, everything else byte-identical
    val victim = before.map(_.getLong(0)).min
    TextOps.minhashIndexDelete(spark, idx,
      spark.range(victim, victim + 1).select(col("id").as("doc_id")))
    val masked = TextOps.nearDupServe(spark, idx, batch).collect()
    assert(masked.length < before.length)
    assert(masked.forall(_.getLong(0) != victim))
    assert(masked.map(_.toString).sorted.sameElements(
      before.filter(_.getLong(0) != victim).map(_.toString).sorted))
    // compaction applies the tombstone physically and clears it;
    // serving identical, dels manifest gone
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    val after = TextOps.nearDupServe(spark, idx, batch).collect()
    assert(after.map(_.toString).sorted.sameElements(
      masked.map(_.toString).sorted))
    val delsDir = new java.io.File(idx, "_dels")
    assert(!delsDir.exists || delsDir.listFiles().isEmpty)
  }

  test("minhash index snapshot: pinned serving ignores later appends " +
    "and deletes bit-identically; one compaction retains it, the " +
    "second expires it") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .localCheckpoint()
    import org.apache.spark.sql.functions.col
    val storedAll = all.where(col("doc_id") % 5 =!= 0)
    val batch = all.where(col("doc_id") % 5 === 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_idx_snap").toString
    TextOps.minhashIndexWrite(storedAll.where(col("doc_id") < 250), idx)
    val snap = graft.operators.EmbeddingOps.indexSnapshot(spark, idx)
    val at = TextOps.nearDupServe(spark, idx, batch).collect()
      .map(_.toString).sorted
    // mutate: append the rest of the stored slice, then delete a
    // doc_a the capture-time view serves
    TextOps.minhashIndexAppend(storedAll.where(col("doc_id") >= 250), idx)
    val victimId = TextOps.nearDupServe(spark, idx, batch,
        asOf = Some(snap)).collect().map(_.getLong(0)).min
    TextOps.minhashIndexDelete(spark, idx,
      spark.range(victimId, victimId + 1).select(col("id").as("doc_id")))
    // pinned == capture time, bit-identical; live masks the victim
    // and sees the appended segment
    val pinned = TextOps.nearDupServe(spark, idx, batch,
      asOf = Some(snap)).collect().map(_.toString).sorted
    assert(pinned.sameElements(at),
      "pinned near-dup serve drifted from the capture-time view")
    val live = TextOps.nearDupServe(spark, idx, batch).collect()
    assert(live.forall(_.getLong(0) != victimId))
    assert(!live.map(_.toString).sorted.sameElements(at))
    // compaction retires the replaced tree: the pinned serve keeps
    // replaying the capture-time view from the retained copy
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    assert(TextOps.nearDupServe(spark, idx, batch, asOf = Some(snap))
      .collect().map(_.toString).sorted.sameElements(at),
      "retained pinned serve drifted from the capture-time view")
    // the SECOND swap (a rebuild) prunes it — now the token expires
    TextOps.minhashIndexWrite(storedAll, idx)
    val err = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, batch, asOf = Some(snap))
    }
    assert(err.getMessage.contains("snapshot expired"))
  }

  test("retention grace composed with a DURABLE token on the BM25 " +
    "family: the token file re-read after a compaction serves the " +
    "capture-time ranking from the retired tree; the next swap " +
    "expires it") {
    // the long-training-run contract end to end: a run stamps a token
    // file next to its outputs, the index compacts routinely while
    // the run is still going, and the re-read token must either
    // replay bit-identically (within the one-epoch grace) or refuse
    // loudly — never silently serve the wrong incarnation
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .localCheckpoint()
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm_ret").resolve("ix").toString
    TextOps.bm25IndexWrite(all.where(col("doc_id") < 250), idx)
    val tok = java.nio.file.Files
      .createTempDirectory("graft_bm_ret_tok").resolve("t.json").toString
    graft.operators.EmbeddingOps.snapshotWrite(spark, tok,
      graft.operators.EmbeddingOps.indexSnapshot(spark, idx))
    val terms = Seq("join", "vector", "filter")
    val at = TextOps.bm25TopKIndexed(spark, idx, terms,
        asOf = Some(graft.operators.EmbeddingOps.snapshotRead(spark, tok)))
      .collect().map(_.toString).sorted
    // mutate + compact: append the rest, delete a doc, consolidate
    TextOps.bm25IndexAppend(all.where(col("doc_id") >= 250), idx)
    graft.operators.EmbeddingOps.indexDelete(spark, idx,
      spark.range(1L).select(col("id").as("doc_id")), keyCol = "doc_id")
    assert(TextOps.bm25IndexCompact(spark, idx) >= 1)
    // the durable token, re-read from disk, rides the retired tree
    val retained = TextOps.bm25TopKIndexed(spark, idx, terms,
        asOf = Some(graft.operators.EmbeddingOps.snapshotRead(spark, tok)))
      .collect().map(_.toString).sorted
    assert(retained.sameElements(at),
      "retained pinned BM25 serve drifted from the capture-time view")
    // the second swap prunes the retired tree: the token refuses
    TextOps.bm25IndexWrite(all, idx)
    val err = intercept[IllegalArgumentException] {
      TextOps.bm25TopKIndexed(spark, idx, terms,
        asOf = Some(graft.operators.EmbeddingOps.snapshotRead(spark, tok)))
    }
    assert(err.getMessage.contains("snapshot expired"))
  }

  test("groupSplit keeps every near-dup group member in one split") {
    // docs 1/2/3 form one dup group (exact + near), 4 stands alone
    val out = TextOps.groupSplit(docs, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_id"), r.getAs[String]("split"))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(4L)._1 == 4L) // outside any group: keys by its own id
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1)
  }

  test("splitLeakage: the naive split leaks, the group split cannot") {
    // md5-nibble arithmetic puts doc 1 (c4ca... -> bucket 8, val) and
    // doc 2 (c81e... -> bucket 0, train) on OPPOSITE sides of the
    // doc-id-keyed fence even though they are exact duplicates — the
    // one group both straddles naive and, by construction, never
    // straddles the group-keyed split
    val r = TextOps.splitLeakage(docs, threshold = 0.5).collect()(0)
    assert(r.getAs[Long]("n_groups") == 1L)
    assert(r.getAs[Long]("n_docs_in_groups") == 3L)
    assert(r.getAs[Long]("n_leaky_naive") == 1L)
    assert(r.getAs[Long]("n_leaky_grouped") == 0L)
  }

  private def bm25Docs = docsDf(Seq(
    (1L, "join join vector filter p1 p2 p3 p4", "en", "s1"),
    (2L, "join q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15", "en", "s1"),
    (3L, "join r1 r2 r3", "en", "s2"),
    (4L, "f1 f2 f3 f4 f5", "en", "s2"),
    (5L, "f6 f7 f8", "en", "s3"),
    (6L, "f9 f10", "en", "s3"),
    (7L, "f11 f12 f13", "en", "s4"),
    (8L, "f14 f15", "en", "s4")))

  test("bm25TopK ranks multi-term matches first and normalizes by length") {
    val r = TextOps.bm25TopK(bm25Docs, Seq("join", "vector", "filter"))
      .collect()
    // only docs containing at least one query term surface
    assert(r.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    // doc 1 matches three terms (two of them rare -> high idf): top
    assert(r(0).getAs[Long]("doc_id") == 1L)
    assert(r(0).getAs[Long]("n_terms") == 3L)
    // docs 2 and 3 have identical tf=1/idf for 'join'; doc 3 is much
    // shorter than average, doc 2 much longer -> doc 3 outranks doc 2
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score_q")).toMap
    assert(byId(3L) > byId(2L))
    assert(r.map(_.getAs[Long]("score_q")).forall(_ > 0L))
  }

  test("bm25TopK respects k with a total-order tie-break") {
    val r = TextOps.bm25TopK(bm25Docs, Seq("join"), k = 1).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("doc_id") == 1L) // tf=2 beats both tf=1 docs
  }

  test("sampleTopN carves exactly n per stratum, deterministically") {
    val d = docsDf((1L to 9L).map(i =>
      (i, s"w$i", "en", if (i <= 5) "sa" else "sb")))
    val r1 = TextOps.sampleTopN(d, n = 2)
    val rows = r1.collect()
    assert(rows.count(_.getAs[String]("source") == "sa") == 2)
    assert(rows.count(_.getAs[String]("source") == "sb") == 2)
    assert(rows.map(_.getAs[Int]("pick_rank")).forall(p => p == 1 || p == 2))
    // re-run picks the SAME docs (hash order, not partition order)
    val r2 = TextOps.sampleTopN(d, n = 2).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet ==
      r2.map(_.getAs[Long]("doc_id")).toSet)
    // a stratum smaller than n yields the whole stratum
    val small = TextOps.sampleTopN(d.where($"source" === "sa"), n = 99)
    assert(small.count() == 5)
  }

  test("bm25TopKWith serves from foreign stats and drops unseen terms") {
    val statsCorpus = docsDf(Seq(
      (10L, "join scan join filter pad", "en", "s1"),
      (11L, "scan sort merge", "en", "s1"),
      (12L, "pad pad pad pad", "en", "s2"),
      (13L, "sort merge", "en", "s2")))
    val batch = docsDf(Seq(
      (1L, "join join vector", "en", "b"), // 'vector' unseen in stats
      (2L, "join sort sort sort sort sort", "en", "b"),
      (3L, "scan free", "en", "b")))
    val r = TextOps.bm25TopKWith(batch,
      TextOps.bm25Stats(statsCorpus), Seq("join", "vector"))
      .collect()
    // 'vector' has no stats-corpus df: contributes nothing, so doc 1
    // counts ONE matched term, and doc 3 (no 'join') never surfaces
    assert(r.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
    assert(r.forall(_.getAs[Long]("n_terms") == 1L))
    // doc 1 (tf=2, shorter) outranks doc 2 (tf=1, longer)
    assert(r(0).getAs[Long]("doc_id") == 1L)
    // serving from stats built over the SAME corpus equals the direct path
    val direct = TextOps.bm25TopK(statsCorpus, Seq("join", "scan"))
      .collect().map(_.toString)
    val served = TextOps.bm25TopKWith(statsCorpus,
      TextOps.bm25Stats(statsCorpus), Seq("join", "scan"))
      .collect().map(_.toString)
    assert(direct.sameElements(served))
  }

  test("spanCorrupt masks deterministic spans that splice back to the " +
      "original text") {
    val d = docsDf((1L to 20L).map(i =>
      (i, (1 to 23).map(j => s"t$j").mkString(" "), "en", "s")))
    val rows = TextOps.spanCorrupt(d).collect()
    assert(rows.length == 20)
    val again = TextOps.spanCorrupt(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("input_text"))
      .toMap
    rows.foreach { r =>
      val inp = r.getAs[String]("input_text")
      val tgt = r.getAs[String]("target_text")
      val n = r.getAs[Long]("n_masked")
      // deterministic across runs
      assert(again(r.getAs[Long]("doc_id")) == inp)
      // sentinel counts agree between the two sides
      val sentRe = "<extra_id_\\d+>".r
      assert(sentRe.findAllIn(inp).length == n)
      assert(sentRe.findAllIn(tgt).length == n)
      if (n == 0) assert(tgt == "")
      // splice each target span back over its sentinel -> original
      val spans = ("<extra_id_\\d+> ((?:(?!<extra_id_)\\S+ ?)+)").r
        .findAllMatchIn(tgt).map(_.group(1).trim).toSeq
      val restored = spans.zipWithIndex.foldLeft(inp) {
        case (acc, (span, i)) => acc.replace(s"<extra_id_$i>", span)
      }
      assert(restored == (1 to 23).map(j => s"t$j").mkString(" "),
        s"splice failed for doc ${r.getAs[Long]("doc_id")}")
    }
    // with the default 3/16 nibble rate, SOME doc has a masked span
    assert(rows.map(_.getAs[Long]("n_masked")).sum > 0)
  }

  test("lengthBuckets assigns power-of-two capacities and exact waste") {
    val d = docsDf(Seq(
      (1L, "a", "en", "s"), // 1 token -> bucket 1
      (2L, "a b", "en", "s"), // 2 -> 2
      (3L, "a b c", "en", "s"), // 3 -> 4
      (4L, "a b c d e", "en", "s"), // 5 -> 8
      (5L, "a b c d e f g h", "en", "s"))) // 8 -> 8
    val r = TextOps.lengthBuckets(d).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("sum_tokens"),
          x.getAs[Long]("padding_waste"), x.getAs[Long]("waste_permille")))
      .toMap
    assert(r.keySet == Set(1L, 2L, 4L, 8L))
    assert(r(1L) == ((1L, 1L, 0L, 0L)))
    assert(r(2L) == ((1L, 2L, 0L, 0L)))
    assert(r(4L) == ((1L, 3L, 1L, 250L)))
    assert(r(8L) == ((2L, 13L, 3L, 187L))) // 16 capacity, 13 real
  }

  test("budgetSelect keeps the best-scored prefix within the token budget") {
    import spark.implicits._
    val scored = Seq(
      (1L, 0.5, 40L), // best: cum 40
      (2L, 1.5, 50L), // cum 90
      (3L, 2.5, 30L), // cum 120 > 100: dropped
      (4L, 2.5, 10L), // tie on score, doc_id later: cum 130, dropped
      (5L, 0.9, 10L)) // second-best: cum 50 (before doc 2)
      .toDF("doc_id", "score", "n_tokens")
    val r = TextOps.budgetSelect(scored, budget = 100L).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("cum_tokens"), x.getAs[Boolean]("kept"))).toMap
    assert(r(1L) == ((40L, true)))
    assert(r(5L) == ((50L, true)))
    assert(r(2L) == ((100L, true))) // exactly exhausts the budget
    assert(r(3L) == ((130L, false)))
    assert(r(4L) == ((140L, false)))
    // the shard-offset prefix sum equals the naive global ordering
    val naive = scored.collect()
      .sortBy(x => (x.getDouble(1), x.getLong(0)))
      .scanLeft(0L)((acc, x) => acc + x.getLong(2)).tail
    assert(r.toSeq.sortBy(_._2._1).map(_._2._1) == naive.sorted.toSeq)
  }

  test("minhashBandSweep histograms candidate pairs by exact-Jaccard band") {
    val sweep = TextOps.minhashBandSweep(docs).collect()
      .map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_pairs")).toMap
    // docs 1/2 are identical (jaccard 1.0 -> band 20); 1-3 and 2-3
    // are near dups below 1.0; doc 4 shares no shingles
    assert(sweep.getOrElse(20L, 0L) == 1L)
    assert(sweep.filter(_._1 < 20L).values.sum == 2L)
    // the swept pair count equals the un-thresholded candidate mass:
    // pairs at >= 0.5 in nearDupMinhash are a subset
    val dedup = TextOps.nearDupMinhash(docs, threshold = 0.5).count()
    assert(sweep.values.sum >= dedup)
  }

  test("decontaminateBloom equals the exact route row-for-row") {
    val corpus = docs
    val bench = docsDf(Seq((99L, base, "en", "bench")))
    val exact = TextOps.decontaminate(corpus, bench)
      .collect().map(_.toString).sorted
    val bloom = TextOps.decontaminateBloom(corpus, bench)
      .collect().map(_.toString).sorted
    assert(exact.nonEmpty && bloom.sameElements(exact))
    // a tight sketch (high fpp) still agrees: the verify join removes
    // whatever the sketch over-admits
    val loose = TextOps.decontaminateBloom(corpus, bench, fpp = 0.5)
      .collect().map(_.toString).sorted
    assert(loose.sameElements(exact))
  }

  test("blocklistScreen counts occurrences per doc across phrase lengths") {
    val d = docsDf(Seq(
      (1L, "bad pair x bad pair y very bad trigram z", "en", "s"),
      (2L, "clean text only here", "en", "s"),
      (3L, "bad pair", "en", "s"))) // exactly one 2-gram, too short for 3
    val r = TextOps.blocklistScreen(d,
      Seq("bad pair", "very bad trigram")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Long]("n_phrases"),
          x.getAs[Boolean]("blocked"))).toMap
    assert(r(1L) == ((3L, 2L, true))) // two bigram hits + one trigram
    assert(r(2L) == ((0L, 0L, false)))
    assert(r(3L) == ((1L, 1L, true)))
  }

  test("branchingCard counts the continuations needed per context") {
    // context 'a': continuations b:3, c:1 -> top-1 covers 750 < 900,
    // top-2 covers 1000 -> n_needed 2; context 'b': only 'a' -> 1
    val d = docsDf(Seq((1L, "a b a b a b a c", "en", "s")))
    // bigrams: ab,ba,ab,ba,ab,ba? tokens a b a b a b a c:
    //   (a,b)x3, (b,a)x3, (a,c)x1 -> ctx a: b=3,c=1; ctx b: a=3
    val r = TextOps.branchingCard(d).collect()
      .map(x => x.getAs[Int]("n_needed") -> x.getAs[Long]("n_contexts"))
      .toMap
    assert(r == Map(1 -> 1L, 2 -> 1L))
    // permille=500: ctx a's top-1 (3/4 = 750) already clears
    val r2 = TextOps.branchingCard(d, permille = 500).collect()
      .map(x => x.getAs[Int]("n_needed") -> x.getAs[Long]("n_contexts"))
      .toMap
    assert(r2 == Map(1 -> 2L))
  }

  test("lmScoreTrigramWith ladders through all three backoff rungs " +
      "with exact hand-computed arms") {
    val corp = docsDf(Seq((100L, "a b c a b c", "en", "m")))
    // model: c_abc(a,b,c)=2, c12(a,b)=2; bigrams ab=2, bc=2, ca=1, N=5
    val tri = TextOps.lmTrigramModel(corp)
    val bi = TextOps.lmModel(corp)
    val batch = docsDf(Seq(
      (1L, "a b c", "en", "s"), // seen trigram: q = bitlen(2 div 2)-1 = 0
      (2L, "x a b z w", "en", "s")))
    // doc 2: (x,a,b) -> bigram rung via (a,b): bitlen(10 div 4)-1 = 1
    //        (a,b,z) -> unigram rung (z unseen): bitlen(125 div 4)-1 = 4
    //        (b,z,w) -> unigram rung (w unseen): 4
    val r = TextOps.lmScoreTrigramWith(batch, tri, bi).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("nll_sum"), x.getAs[Long]("n_trigrams"),
          x.getAs[Long]("n_bo_bigram"), x.getAs[Long]("n_bo_unigram")))
      .toMap
    assert(r(1L) == ((0L, 1L, 0L, 0L)))
    assert(r(2L) == ((9L, 3L, 1L, 2L)))
  }

  test("clusterTopics labels each real cell with <=5 terms, exact ranks") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val r = TextOps.clusterTopics(t.documents, t.embeddings).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[String]("cell")).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getAs[Int]("rk")).sorted
        .sameElements(1 to rows.length))
    }
    // every labeled cell is a real trained cell id
    assert(r.map(_.getAs[String]("cell")).forall(_.startsWith("c")))
  }

  test("distinctiveTerms surfaces a source-exclusive word at the top") {
    val common = "shared words everywhere always"
    val d = docsDf(Seq(
      (1L, s"$common zebra zebra zebra", "en", "sa"),
      (2L, s"$common zebra zebra", "en", "sa"),
      (3L, common, "en", "sb"),
      (4L, common, "en", "sb")))
    val top = TextOps.distinctiveTerms(d, k = 1).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[String]("word"), x.getAs[Long]("c_s"),
          x.getAs[Long]("c_r"))).toMap
    // 'zebra' appears ONLY in sa: its cross-multiplied ratio dwarfs
    // every shared word's
    assert(top("sa") == (("zebra", 5L, 0L)))
  }

  test("minhashBandRecall counts true pairs and caught pairs honestly") {
    // docs fixture: (1,2) identical (jaccard 1), (1,3)/(2,3) near
    // (above 0.5); identical signatures ALWAYS co-band, so recall
    // can never be reported below the identical-pair floor
    val r = TextOps.minhashBandRecall(docs, threshold = 0.5).collect()(0)
    val nTrue = r.getAs[Long]("n_true")
    val nCaught = r.getAs[Long]("n_caught")
    assert(nTrue == 3L)
    assert(nCaught >= 1L && nCaught <= nTrue)
    assert(r.getAs[Long]("recall_permille") == nCaught * 1000 / nTrue)
    // impossible threshold -> no true pairs, recall reports 0 not /0
    val empty = TextOps.minhashBandRecall(
      docsDf(Seq((1L, "a b c d e", "en", "s"),
        (2L, "f g h i j", "en", "s"))), threshold = 0.9).collect()(0)
    assert(empty.getAs[Long]("n_true") == 0L)
    assert(empty.getAs[Long]("recall_permille") == 0L)
  }

  test("simhashTopK ranks the exact duplicate at hamming 0") {
    val r = TextOps.simhashTopK(docs, nQueries = 3, k = 3).collect()
    val top = r.filter(_.getAs[Int]("rk") == 1)
      .map(x => x.getAs[Long]("query_id") ->
        (x.getAs[Long]("doc_id"), x.getAs[Int]("hamming"))).toMap
    // docs 1 and 2 are byte-identical: each other's nearest, distance 0
    assert(top(1L) == ((2L, 0)))
    assert(top(2L) == ((1L, 0)))
    r.foreach(x => assert(x.getAs[Long]("query_id") !=
      x.getAs[Long]("doc_id")))
  }

  test("worstSpan localizes the injected rare-bigram region") {
    val common = (1 to 10).map(_ => "c1 c2").mkString(" ") // 20 tokens
    val inject = "c1 c2 c1 c2 c1 c2 c1 c2 c1 " +
      (1 to 12).map(i => s"u$i").mkString(" ") // rare tail from pos 9
    val d = docsDf((1L to 30L).map(i => (i, common, "en", "s")) :+
      (31L, inject, "en", "s"))
    val r = TextOps.worstSpan(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("span_start"), x.getAs[Long]("span_nll"))).toMap
    // the surprise is the common->rare transition at bigram pos 8
    // (c1 -> u1): unique->unique bigrams score 0 under a self-trained
    // LM (probability 1), so every window containing pos 8 ties and
    // the earliest start wins — the WINDOW must cover pos 8
    val (start, nll) = r(31L)
    assert(start <= 8 && start + 9 >= 8, s"window at $start misses pos 8")
    assert(nll > 0L)
    // fully self-similar docs have a zero-surprise worst span
    assert(r(1L)._2 == 0L)
  }

  test("persisted BM25 index lifecycle: build, crash-safe append, " +
      "delete, compact") {
    import spark.implicits._
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .localCheckpoint()
    val a = all.where($"doc_id" < 300)
    val b = all.where($"doc_id" >= 300)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx").resolve("ix").toString
    val terms = Seq("join", "vector", "filter")
    def served = TextOps.bm25TopKIndexed(spark, idx, terms)
      .collect().map(_.toString)
    TextOps.bm25IndexWrite(a, idx)
    assert(served.sameElements(
      TextOps.bm25TopK(a, terms).collect().map(_.toString)))
    // crash between the two directory publishes: the manifest is
    // uncommitted, serving unchanged; the retry replaces leftovers
    val before = served
    intercept[RuntimeException] {
      TextOps.bm25IndexAppend(b, idx,
        fp => if (fp == "staged-totals") throw new RuntimeException("boom"))
    }
    assert(served.sameElements(before))
    TextOps.bm25IndexAppend(b, idx)
    assert(served.sameElements(
      TextOps.bm25TopK(all, terms).collect().map(_.toString)))
    // tombstone the top doc: it leaves the serving top-k immediately
    val top = TextOps.bm25TopKIndexed(spark, idx, terms)
      .collect()(0).getAs[Long]("doc_id")
    graft.operators.EmbeddingOps.indexDelete(spark, idx,
      Seq(top).toDF("doc_id"), keyCol = "doc_id")
    assert(!TextOps.bm25TopKIndexed(spark, idx, terms).collect()
      .map(_.getAs[Long]("doc_id")).contains(top))
    // compaction applies the deletion physically AND recomputes the
    // totals, so serving equals a direct build over the live docs
    assert(TextOps.bm25IndexCompact(spark, idx) >= 1)
    assert(served.sameElements(
      TextOps.bm25TopK(all.where($"doc_id" =!= top), terms)
        .collect().map(_.toString)))
  }

  test("contaminationBySource attributes leakage to the right feed") {
    val bench = docsDf(Seq((100L, base, "en", "bench")))
    val corpus = docsDf(Seq(
      (1L, base, "en", "dirty"), // fully shared with the benchmark
      (2L, other, "en", "clean"),
      (3L, other, "fr", "clean")))
    val r = TextOps.contaminationBySource(corpus, bench).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_contaminated"),
          x.getAs[Long]("shared_permille"))).toMap
    assert(r("dirty") == ((1L, 1L, 1000L)))
    assert(r("clean") == ((2L, 0L, 0L)))
  }

  test("rankFusion's shard ranks equal the naive global ordering") {
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val r = TextOps.rankFusion(d, "src0", k = 1000000).collect()
    // both rank columns are permutations of 1..N
    val n = r.length
    val expectedRanks = Array.tabulate(n)(i => i + 1L)
    assert(r.map(_.getAs[Long]("ppl_rank")).sorted
      .sameElements(expectedRanks))
    assert(r.map(_.getAs[Long]("dsir_rank")).sorted
      .sameElements(expectedRanks))
    // the shard-offset rank equals the naive sort rank, both signals
    val byNll = r.sortBy(x =>
      (x.getAs[Double]("avg_nll"), x.getAs[Long]("doc_id")))
    byNll.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Long]("ppl_rank") == i + 1L)
    }
    val byW = r.sortBy(x =>
      (-x.getAs[Double]("avg_weight"), x.getAs[Long]("doc_id")))
    byW.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Long]("dsir_rank") == i + 1L)
    }
    r.foreach(x => assert(x.getAs[Long]("borda") ==
      x.getAs[Long]("ppl_rank") + x.getAs[Long]("dsir_rank")))
  }

  test("scorePercentile ranks within each source, 0..1000 inclusive") {
    import spark.implicits._
    val scored = Seq(
      (1L, "sa", 1.0), (2L, "sa", 2.0), (3L, "sa", 3.0), (4L, "sa", 2.0),
      (5L, "sb", 9.0), (6L, "sb", 1.0),
      (7L, "sc", 5.0)) // singleton stratum
      .toDF("doc_id", "source", "score")
    val r = TextOps.scorePercentile(scored).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("src_rank"), x.getAs[Long]("n_src"),
          x.getAs[Long]("pct_permille"))).toMap
    assert(r(1L) == ((1L, 4L, 0L)))
    assert(r(2L) == ((2L, 4L, 333L))) // tie on score: doc_id breaks it
    assert(r(4L) == ((3L, 4L, 666L)))
    assert(r(3L) == ((4L, 4L, 1000L)))
    assert(r(6L) == ((1L, 2L, 0L)))
    assert(r(5L) == ((2L, 2L, 1000L)))
    assert(r(7L) == ((1L, 1L, 0L))) // greatest(n-1,1) guards the /0
    // the sharded rank equals a naive per-source ordering on real data
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val real = TextOps.scorePercentile(
      TextOps.lmScore(d).select($"doc_id", $"avg_nll".as("score"))
        .join(d.select($"doc_id", $"source"), Seq("doc_id"))).collect()
    real.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val naive = rows.sortBy(x =>
        (x.getAs[Double]("score"), x.getAs[Long]("doc_id")))
      naive.zipWithIndex.foreach { case (row, i) =>
        assert(row.getAs[Long]("src_rank") == i + 1L)
      }
    }
  }

  test("denoiserMix accounts every doc to one arm with its own rate") {
    val d = docsDf((1L to 60L).map(i =>
      (i, (1 to 24).map(j => s"w$j").mkString(" "), "en", "s")))
    val r = TextOps.denoiserMix(d).collect()
      .map(x => x.getAs[String]("arm") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_windows"),
          x.getAs[Long]("n_masked"), x.getAs[Long]("masked_permille")))
      .toMap
    assert(r.keySet == Set("r", "s", "x"))
    // every doc lands in exactly one arm
    assert(r.values.map(_._1).sum == 60L)
    // window widths: 24 tokens -> 8 windows at L=3, 3 at L=8
    assert(r("r")._2 == r("r")._1 * 8)
    assert(r("s")._2 == r("s")._1 * 3)
    assert(r("x")._2 == r("x")._1 * 8)
    // the extreme arm masks at a much higher rate than the 3/16 arms
    assert(r("x")._4 > r("r")._4)
    r.values.foreach(v => assert(v._4 == v._3 * 1000 / v._2))
  }

  test("negSamplingTable computes exact integer 3/4-power weights") {
    // counts by construction: a=16 -> 16^0.75 = 8 exactly;
    // b=81 -> 27 exactly; c=100 -> floor(31.62) = 31; d=1 -> 1
    val text = (Seq.fill(16)("a") ++ Seq.fill(81)("b") ++
      Seq.fill(100)("c") ++ Seq("d")).mkString(" ")
    val r = TextOps.negSamplingTable(docsDf(Seq((1L, text, "en", "s"))))
      .collect()
      .map(x => x.getAs[String]("word") ->
        (x.getAs[Long]("c"), x.getAs[Long]("w34"), x.getAs[Long]("ppm")))
      .toMap
    assert(r("a") == ((16L, 8L, 8L * 1000000 / 67)))
    assert(r("b") == ((81L, 27L, 27L * 1000000 / 67)))
    assert(r("c") == ((100L, 31L, 31L * 1000000 / 67)))
    assert(r("d") == ((1L, 1L, 1L * 1000000 / 67)))
    // the flattening property: frequency ratios shrink under ^(3/4)
    assert(r("c")._2.toDouble / r("d")._2 < 100.0)
  }

  test("ictPairs excises the query window; splice restores the doc") {
    val d = docsDf((1L to 25L).map(i =>
      (i, (1 to 20).map(j => s"t$j").mkString(" "), "en", "s")) :+
      (26L, "a b c d e f g h", "en", "s")) // exactly w tokens: dropped
    val rows = TextOps.ictPairs(d).collect()
    assert(rows.length == 25) // doc 26 has no non-empty context
    rows.foreach { r =>
      val q = r.getAs[String]("query_text").split(" ")
      val c = r.getAs[String]("context_text").split(" ").filter(_.nonEmpty)
      val start = r.getAs[Int]("start_pos")
      assert(q.length == 8)
      assert(c.length == 12)
      // splicing the query back at start_pos restores the original
      val restored = (c.take(start) ++ q ++ c.drop(start)).mkString(" ")
      assert(restored == (1 to 20).map(j => s"t$j").mkString(" "))
    }
    // window choice is deterministic and varies across docs
    assert(rows.map(_.getAs[Int]("start_pos")).distinct.length > 1)
  }

  test("sftPack assembles role-templated pairs with a length cut") {
    val d = docsDf(Seq(
      (0L, "how do i join", "en", "s"),
      (1L, "use a hash join", "en", "s"),
      (2L, "what is spark", "en", "s"),
      (3L, (1 to 50).map(i => s"w$i").mkString(" "), "en", "s"),
      (4L, "orphan prompt", "en", "s"))) // no response: dropped
    val r = TextOps.sftPack(d, maxTokens = 12).collect()
      .map(x => x.getAs[Long]("pair_id") -> x).toMap
    assert(r.keySet == Set(0L, 1L))
    assert(r(0L).getAs[String]("seq") ==
      "<|user|> how do i join <|assistant|> use a hash join <|end|>")
    assert(r(0L).getAs[Long]("n_tokens") == 11L) // 4 + 4 + 3 markers
    assert(r(0L).getAs[Boolean]("kept"))
    assert(!r(1L).getAs[Boolean]("kept")) // 50-token response blows the cut
    assert(r(1L).getAs[Long]("prompt_id") == 2L)
    assert(r(1L).getAs[Long]("response_id") == 3L)
  }

  test("normalizeText lowercases, strips punctuation, collapses spaces") {
    val d = docsDf(Seq(
      (1L, "Hello, WORLD!!  (spark)   4ever", "en", "s"),
      (2L, "...", "en", "s"))) // all punctuation -> empty
    val r = TextOps.normalizeText(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("text_norm"), x.getAs[Long]("n_tokens_raw"),
          x.getAs[Long]("n_tokens_norm"))).toMap
    // raw count is a plain single-space split: empty tokens from the
    // double/triple spaces count (5 words + 2 empties)
    assert(r(1L) == (("hello world spark 4ever", 7L, 4L)))
    assert(r(2L)._1 == "")
  }

  test("vocabGrowth counts each word once, at its first slice") {
    val d = docsDf(Seq(
      (0L, "a b", "en", "s"), // slice 0: a b new
      (1L, "b c", "en", "s"), // slice 0 (2 docs/slice at nSlices=2... )
      (2L, "a d", "en", "s"),
      (3L, "e e e", "en", "s")))
    // nSlices=2 over 4 docs: docs 0-1 -> slice 0, docs 2-3 -> slice 1
    val r = TextOps.vocabGrowth(d, nSlices = 2).collect()
      .map(x => x.getAs[Long]("slice") ->
        (x.getAs[Long]("n_new_words"), x.getAs[Long]("vocab_size"))).toMap
    assert(r(0L) == ((3L, 3L))) // a b c
    assert(r(1L) == ((2L, 5L))) // d e
  }

  test("dedupCascadeReport funnels raw -> exact -> bow -> near-dup") {
    val d = docsDf(Seq(
      (1L, base, "en", "s1"),
      (2L, base, "en", "s1"), // exact dup of 1: exact stage removes
      (3L, nearDup, "en", "s2"), // near dup of 1: minhash stage removes
      (4L, other, "fr", "s3"),
      (5L, other.split(" ").reverse.mkString(" "), "fr", "s3"))) // bow dup of 4
    val r = TextOps.dedupCascadeReport(d, threshold = 0.5).collect()
      .map(x => x.getAs[String]("stage") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_removed"))).toMap
    assert(r("raw") == ((5L, 0L)))
    assert(r("exact") == ((4L, 1L))) // doc 2 gone
    assert(r("bow") == ((3L, 1L))) // doc 5 gone
    assert(r("near_dup") == ((2L, 1L))) // doc 3 gone
  }

  test("dedupBagOfWords collapses word permutations; dedupExact does not") {
    val d = docsDf(Seq(
      (1L, "spark join hash table", "en", "s1"),
      (2L, "table hash join spark", "en", "s1"), // permutation of 1
      (3L, "spark join hash table", "en", "s2"), // exact dup of 1
      (4L, "spark join hash hash", "en", "s2"))) // different multiset
    val bow = TextOps.dedupBagOfWords(d).collect()
    assert(bow.length == 2)
    val grp = bow.find(_.getAs[Long]("n_copies") == 3L).get
    assert(grp.getAs[Long]("kept_doc_id") == 1L)
    assert(TextOps.dedupExact(d).count() == 3) // 1+3 merge, 2 stays apart
  }

  test("curateSemantic: a never-matching threshold is the identity " +
    "gate; a duplicated embedding drops the GREATER doc before the " +
    "text funnel, and the gate composes as curate-over-filtered-input") {
    import spark.implicits._
    val raw = Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id", $"source", $"lang", $"text".as("html"))
      .localCheckpoint()
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    // relax the LM gate: plain (unfixtured) text trains a sparse
    // bigram LM that rejects everything — this spec pins the SEMANTIC
    // gate, so the perplexity gate is held open in all three arms
    val keepAll = 1000000L
    val plain = TextOps.curate(raw, lmKeepMilli = keepAll).collect()
    // cos is bounded by 1: a threshold above it gates nothing and the
    // composed run IS the plain curate, row for row
    val id = TextOps.curateSemantic(raw, e, threshold = 1.5,
        lmKeepMilli = keepAll)
      .collect().map(_.toString).sorted
    assert(id.sameElements(plain.map(_.toString).sorted),
      "identity gate changed the curate output")
    // duplicate the embedding of the lowest id onto a surviving
    // higher id: cos = 1 exactly, same quantizer cell by
    // construction, so the pair is found and the greater id drops
    val target = plain.map(_.getLong(0)).filter(_ >= 16).max
    val e2 = e.where($"vec_id" =!= target)
      .unionByName(e.where($"vec_id" === 0L)
        .select(lit(target).as("vec_id"), $"embedding", $"label"))
      .localCheckpoint()
    val gated = TextOps.curateSemantic(raw, e2, lmKeepMilli = keepAll)
      .collect()
    assert(plain.exists(_.getLong(0) == target) &&
      !gated.exists(_.getLong(0) == target),
      s"doc $target (embedding duplicate of 0) was not gated out")
    // composition contract: gate-then-curate == curate over the
    // anti-joined input (the oracle's filtered-source replay shape)
    val dropped = graft.operators.EmbeddingOps.semanticDedup(e2)
      .select($"vec_b".as("doc_id")).distinct()
    val composed = TextOps.curate(
      raw.join(dropped, Seq("doc_id"), "left_anti"),
      lmKeepMilli = keepAll)
      .collect().map(_.toString).sorted
    assert(gated.map(_.toString).sorted.sameElements(composed),
      "curateSemantic diverges from curate over the filtered input")
  }

  test("curateSemantic + forget-ledger: the ledger gates the SCORING " +
    "side — a doc whose only near-dup was a forgotten doc survives; " +
    "the forgotten doc itself is gone from the corpus side") {
    import spark.implicits._
    val raw = Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id", $"source", $"lang", $"text".as("html"))
      .localCheckpoint()
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val keepAll = 1000000L
    val plain = TextOps.curate(raw, lmKeepMilli = keepAll).collect()
    val victim = plain.map(_.getLong(0)).filter(_ >= 16).max
    // victim's embedding becomes an exact copy of doc 0's — at
    // threshold ~1 the ONLY near-dup pair is (0, victim), so the
    // victim's fate isolates the scoring-side ledger question
    val e2 = e.where($"vec_id" =!= victim)
      .unionByName(e.where($"vec_id" === 0L)
        .select(lit(victim).as("vec_id"), $"embedding", $"label"))
      .localCheckpoint()
    val thr = 0.9999
    val noLedger = TextOps.curateSemantic(raw, e2,
      lmKeepMilli = keepAll, threshold = thr).collect()
    assert(!noLedger.exists(_.getLong(0) == victim),
      "without a ledger the duplicated doc must drop")
    // forget doc 0, the pair's lower id: the corpus gate removes 0,
    // and the SCORING gate removes its vector — so the pair never
    // forms and the victim survives
    val lg = java.nio.file.Files
      .createTempDirectory("graft_sem_ledger").resolve("lg").toString
    graft.operators.Forget.ledgerInit(spark, lg)
    graft.operators.Forget.ledgerAppend(spark, lg,
      Seq(0L).toDF("doc_id"))
    val gated = TextOps.curateSemantic(raw, e2,
      lmKeepMilli = keepAll, threshold = thr,
      ledgerPath = Some(lg)).collect()
    assert(!gated.exists(_.getLong(0) == 0L),
      "the forgotten doc leaked through the corpus gate")
    assert(gated.exists(_.getLong(0) == victim),
      "the victim's only near-dup was forgotten, yet it still dropped " +
        "— the ledger is not gating the scoring side")
  }
}
