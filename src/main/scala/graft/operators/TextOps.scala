package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data text operators over the `documents` table:
  * exact + near deduplication (MinHash/LSH, SimHash banding), language
  * identification, quality scoring, token counting, fingerprinting.
  *
  * These go beyond the reference's own surface (SURVEY.md §2 covers its
  * analytics; a 100 TB training-data pipeline additionally needs dedup
  * and text hygiene). Every operator is deterministic so it can be
  * cross-checked against a DuckDB oracle:
  *
  *  - all hashing is `md5` hex (bit-identical across engines);
  *  - set similarity is exact integer intersection/union with ONE final
  *    IEEE division;
  *  - SimHash bits come from exact integer vote sums.
  *
  * Scale design: everything is shuffle-by-key (doc_id / shingle /
  * bucket); candidate generation is LSH-banded so the pair space never
  * goes quadratic; no driver-side collects anywhere.
  */
object TextOps {

  /** (doc_id, pos, word) token stream — posexplode keeps the position
    * so downstream shingling needs no self-join. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))

  /** All 3-word shingles per doc (with repeats), built per-row from
    * the token array with a higher-order transform — no window, no
    * shuffle at all: rows never leave the partition of their document.
    * Consumers that need set semantics dedupe downstream, each at its
    * cheapest representation (a min-aggregate needs no dedup; Jaccard
    * dedupes 8-byte hash surrogates — see [[nearDupMinhash]]). */
  def shinglesRaw(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("s"))

  /** Distinct 3-word shingles per doc: [[shinglesRaw]] + one distinct
    * shuffle on (doc_id, s). Kept for callers that need the actual
    * shingle strings as a set. */
  def shingles(docs: DataFrame): DataFrame =
    shinglesRaw(docs).distinct()

  /** HTML/boilerplate text extraction — the front door of a web-corpus
    * curation chain (CCNet processes WET text, but trafilatura/jusText
    * -class pipelines start from markup): strip non-content blocks,
    * convert structure to line breaks, drop low-density lines. The
    * rendering is deliberately regex/array-expression-only (no UDF, no
    * DOM parse) so it is whole-stage-codegen'd AND bit-replayable by
    * the DuckDB oracle — which also constrains the dialect to the
    * RE2-compatible subset (no backreferences, hence one pass per
    * stripped block tag).
    *
    * Pipeline per row (pure per-partition projection — NO shuffle, the
    * operator is a map over the corpus):
    *  1. `<script>`/`<style>` blocks removed wholesale ((?is),
    *     non-greedy) — BEFORE tag stripping, so `1 < 2` inside script
    *     bodies cannot shed tag fragments into text;
    *  2. line-structuring tags (`<br>`, closes of p/div/li/ul/nav/
    *     title/h1-6/tr) become newlines;
    *  3. every remaining tag becomes a space;
    *  4. the five ubiquitous entities decode (`&amp;` LAST, so
    *     `&amp;lt;` decodes to the literal `&lt;` and not `<`);
    *  5. lines split on newline, inner whitespace collapses, blanks
    *     drop — `n_lines` counts the nonblank lines;
    *  6. the text-density filter keeps lines with at least
    *     `minLineTokens` whitespace tokens (nav crumbs, list chrome,
    *     button labels are short; body prose is not — the jusText
    *     length heuristic reduced to its deterministic core).
    *
    * Output: (doc_id, text_extracted — kept lines joined by newline,
    * n_lines, n_lines_kept, n_chars). Scale shape: one projection,
    * no shuffle, no state; plans fuse with whatever consumes it. */
  def extractHtml(docs: DataFrame, htmlCol: String = "html",
      minLineTokens: Int = 4): DataFrame = {
    require(minLineTokens >= 1,
      s"minLineTokens must be >= 1, got $minLineTokens")
    val noScript = regexp_replace(col(htmlCol),
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val broken = regexp_replace(noStyle,
      "(?i)<(br|/p|/div|/li|/ul|/nav|/title|/h[1-6]|/tr)[^>]*>", "\n")
    val untagged = regexp_replace(broken, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (e, ch)) => regexp_replace(c,
        java.util.regex.Pattern.quote(e), ch) }
    docs
      .withColumn("__decoded", decoded)
      .withColumn("__lines", expr(
        "filter(transform(split(__decoded, '\\n'), " +
          "l -> trim(regexp_replace(l, '\\\\s+', ' '))), l -> l != '')"))
      .withColumn("__kept", expr(
        s"filter(__lines, l -> size(split(l, ' ')) >= $minLineTokens)"))
      .select(col("doc_id"),
        array_join(col("__kept"), "\n").as("text_extracted"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        length(array_join(col("__kept"), "\n")).cast("long")
          .as("n_chars"))
  }

  /** Exact dedup by content hash (hash-groupBy): one row per distinct
    * text, keeping the lowest doc_id. At 100 TB this is a single
    * shuffle on a 32-char key instead of the full text. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))

  /** T5-style span corruption (Raffel et al. 2020, the denoising
    * objective behind T5/UL2): deterministic hash-chosen token
    * windows mask out of the input and become the target, each span
    * introduced by its own `<extra_id_k>` sentinel. The construction
    * here is fixed-width: positions group into windows of `spanLen`
    * tokens, window g of doc d masks iff the first md5 nibble of
    * `d:g:corrupt` is below `maskNibbles` (maskNibbles/16 of windows
    * — 3/16 ~ the paper's 15% at the default), sentinels number
    * masked windows left to right (adjacent masked windows keep
    * separate sentinels rather than merging). Hash-deterministic like
    * [[splitAssign]]: every engine, run, and machine corrupts a doc
    * identically, and re-runs over a grown corpus never re-roll an
    * existing doc's spans.
    *
    * Scale shape: token-cardinality keyed shuffles only — window
    * grouping on (doc, g), the sentinel numbering as a running sum
    * over each doc's windows, one doc-keyed reassembly aggregate
    * (per-doc collect_list, bounded by the doc's own length — the
    * [[dedupLines]] reassembly discipline); zero broadcasts, zero
    * UDFs. */
  def spanCorrupt(docs: DataFrame, spanLen: Int = 3,
      maskNibbles: Int = 3): DataFrame = {
    require(spanLen > 0, "spanLen must be positive")
    require(maskNibbles >= 0 && maskNibbles <= 16,
      "maskNibbles is a nibble threshold in [0, 16]")
    val win = tokens(docs)
      .withColumn("g", expr(s"pos div $spanLen"))
      .groupBy(col("doc_id"), col("g"))
      .agg(concat_ws(" ", expr(
        "transform(sort_array(collect_list(struct(pos, word))), r -> r.word)"))
        .as("wtext"))
      .withColumn("masked",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("g").cast("string"), lit(":corrupt"))), 1, 1), 16, 10)
          .cast("int") < maskNibbles)
    val wk = Window.partitionBy(col("doc_id")).orderBy(col("g"))
    win
      .withColumn("k",
        sum(when(col("masked"), 1L).otherwise(0L)).over(wk))
      .withColumn("sentinel",
        concat(lit("<extra_id_"), (col("k") - 1).cast("string"), lit(">")))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(g, " +
            "if(masked, sentinel, wtext) as t))), r -> r.t)"))
          .as("input_text"),
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(if(masked, struct(g, " +
            "concat(sentinel, ' ', wtext) as t), null))), r -> r.t)"))
          .as("target_text"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
  }

  /** UL2-style mixture-of-denoisers accounting (Tay et al. 2022):
    * docs assign hash-deterministically to the R/S/X denoiser arms
    * (regular short spans / sequential long span / extreme rate), and
    * the card reports each arm's doc count, window count, and masked
    * mass under ITS corruption parameters — the objective-mixture
    * budget read before generating the actual pairs with
    * [[spanCorrupt]] per arm. Window masking reuses spanCorrupt's
    * rule exactly (first md5 nibble of `doc:g:corrupt` under the
    * arm's threshold over spanLen-token windows), so the counts here
    * ARE the pair generator's. Pure keyed aggregates. */
  def denoiserMix(docs: DataFrame): DataFrame = {
    // (arm, spanLen, maskNibbles): R = short spans at ~19%,
    // S = long spans at ~19%, X = short spans at ~50% (extreme rate)
    val arms = Seq(("r", 3, 3), ("s", 8, 3), ("x", 3, 8))
    // arm draw: 4 hex nibbles (16 bits) mod 3 — 65536 % 3 = 1, so the
    // residual bias toward arm 0 is 1/65536 (~0.0015%), negligible
    // against the intended even R/S/X mixture (2 nibbles would skew
    // arm 0 by ~0.4%: 86/256 vs 85/256)
    val assigned = docs
      .withColumn("arm_i",
        pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":denoiser"))), 1, 4), 16, 10).cast("long"), lit(3L)))
      .pinned
    arms.zipWithIndex.map { case ((arm, spanLen, nib), i) =>
      tokens(assigned.where(col("arm_i") === i.toLong))
        .withColumn("g", expr(s"pos div $spanLen"))
        .select(col("doc_id"), col("g")).distinct()
        .withColumn("masked",
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("g").cast("string"), lit(":corrupt"))), 1, 1),
            16, 10).cast("int") < nib)
        .groupBy()
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_windows"),
          sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
        .select(lit(arm).as("arm"), col("n_docs"), col("n_windows"),
          col("n_masked"))
    }.reduce(_ unionByName _)
      .withColumn("masked_permille",
        expr("n_masked * 1000 div n_windows"))
  }

  /** Length-bucketed batching card — the padding-efficiency read
    * before choosing bucket boundaries for fixed-shape training
    * batches: docs bucket to the smallest power of two holding their
    * token count, and each bucket reports how much of its padded
    * capacity is waste (bucket_size*n_docs - real tokens, exact
    * integers, one permille division). One per-row bucket expression
    * + one aggregate — nothing else moves. */
  def lengthBuckets(docs: DataFrame): DataFrame =
    docs
      .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", when(col("n_tokens") <= 1, 1L)
        .otherwise(expr(
          "cast(shiftleft(1L, length(bin(n_tokens - 1))) as long)")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padding_waste",
        col("bucket") * col("n_docs") - col("sum_tokens"))
      .withColumn("waste_permille",
        expr("padding_waste * 1000 div (bucket * n_docs)"))

  /** Token-budget greedy selection — "keep the best documents until
    * the training budget is spent", the budgeted form of CCNet-style
    * quality selection: documents order by (score asc, doc_id) —
    * lower score = better, e.g. an LM [[lmScore]] avg_nll — and a doc
    * is kept iff the corpus-wide running token total THROUGH it stays
    * within `budget`. The exact global prefix sum runs without a
    * single-partition window via the [[pplBuckets]] order-aligned
    * shard trick: docs shard by floor(score*granularity) (monotone in
    * score, so shard order refines score order), per-shard token
    * masses cumulate over the shard-cardinality counts frame, and
    * each doc adds its within-shard running sum to its shard's
    * offset. Input is any (doc_id, score, n_tokens) frame; output
    * adds (cum_tokens, kept). */
  def budgetSelect(scored: DataFrame, budget: Long,
      granularity: Int = 8): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(granularity >= 1,
      s"granularity must be >= 1, got $granularity")
    val sh = scored.withColumn("shard",
      floor(col("score") * granularity).cast("long")).pinned
    val counts = sh.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("tok"))
    val wOff = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = counts.withColumn("offset",
      coalesce(sum(col("tok")).over(wOff), lit(0L)))
      .select(col("shard"), col("offset"))
    val wIn = Window.partitionBy(col("shard"))
      .orderBy(col("score"), col("doc_id"))
    sh.join(broadcast(off), Seq("shard"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(wIn) + col("offset"))
      .withColumn("kept", col("cum_tokens") <= budget)
      .select(col("doc_id"), col("score"), col("n_tokens"),
        col("cum_tokens"), col("kept"))
  }

  /** LSH threshold-tuning card: every banded candidate pair's exact
    * Jaccard, quantized to `nBands` integer bands by one
    * cross-multiplied division, histogrammed — the read before
    * CHOOSING [[nearDupMinhash]]'s threshold (where does the
    * candidate mass sit, how sharp is the cliff). Candidate
    * generation is the same banding as the dedup itself (band
    * membership does not depend on any threshold), so the card
    * measures exactly the pairs the dedup would verify; everything
    * downstream is the keyed verify shuffle plus one band aggregate
    * whose output is <= nBands+1 rows. */
  def minhashBandSweep(docs: DataFrame, nBands: Int = 20): DataFrame = {
    require(nBands >= 1, s"nBands must be >= 1, got $nBands")
    val ds = shinglesRaw(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .distinct()
      .pinned
    val cand = cappedBandPairs(minhashBands(minhashSignature(docs)),
      Seq("band_idx", "band_hash"))
    val sz = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    interFromCandidates(ds, cand)
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .withColumn("band",
        expr(s"n_common * $nBands div (na + nb - n_common)"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-batch BM25 index frames: postings (word, doc_id, tf, dl, tb)
    * with the doc length DENORMALIZED onto every posting row — serve
    * never needs a doc-cardinality side table — and the 1-row batch
    * totals. tb = pmod(hash(word), nBuckets) is the directory
    * partition key the serve path prunes on. */
  private def bm25SegFrames(batch: DataFrame,
      nBuckets: Int): (DataFrame, DataFrame) = {
    val dl = batch.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl")).pinned
    val postings = tokens(batch)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
      .withColumn("tb", pmod(hash(col("word")), lit(nBuckets)))
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_tok"))
    (postings, totals)
  }

  /** Persisted BM25 inverted index — the [[graft.operators
    * .EmbeddingOps.ivfIndexWrite]] protocol applied to retrieval.
    * Layout under `path`: `postings/seg=N/tb=B/` (term-bucketed
    * posting lists, doc length denormalized), `totals/seg=N/` (one
    * accumulating row per segment), `params/` (the write-once bucket
    * modulus), `_segs` manifest. Crash-atomic: built under a hidden
    * sibling, swapped in whole; a killed rebuild heals on the next
    * call. Serving ([[bm25TopKIndexed]]) reads ONLY the query terms'
    * buckets — IO is |corpus|·|terms' buckets|/nBuckets, never the
    * collection. */
  def bm25IndexWrite(docs: DataFrame, path: String,
      nBuckets: Int = 16): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val s = docs.sparkSession
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    Warehouse.recoverSwap(fs, root) // heal a crashed previous rebuild
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val (postings, totals) = bm25SegFrames(docs, nBuckets)
    postings.repartition(col("tb"))
      .write.partitionBy("tb").mode("overwrite")
      .parquet(s"$tmp/postings/seg=0")
    totals.write.mode("overwrite").parquet(s"$tmp/totals/seg=0")
    val sess = s
    import sess.implicits._
    Seq(nBuckets).toDF("n_buckets")
      .write.mode("overwrite").parquet(s"$tmp/params")
    EmbeddingOps.commitGen(fs,
      new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
  }

  private def bm25Params(s: org.apache.spark.sql.SparkSession,
      path: String): Int =
    s.read.parquet(s"$path/params").head.getAs[Int]("n_buckets")

  /** Append a NEW batch of documents as one crash-atomic segment:
    * postings bucket under the STORED modulus, the batch's totals row
    * lands beside the prior segments' (collection stats accumulate by
    * segment sum). Both directories stage hidden and publish by
    * rename BEFORE the manifest commit — a crash at any point leaves
    * serving on the previous manifest, and the retry replaces the
    * unreferenced leftovers wholesale ([[graft.operators.EmbeddingOps
    * .appendSegment]]'s contract, widened to a two-directory
    * segment). Not registry-guarded: compose with an upstream dedup
    * gate for at-least-once feeds. */
  def bm25IndexAppend(docs: DataFrame, path: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val s = docs.sparkSession
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_segs")
    val (gen, segs) = EmbeddingOps.committedSegs(fs, metaDir)
    require(gen >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — build the index first")
    val segId = segs.max + 1
    val (postings, totals) = bm25SegFrames(docs, bm25Params(s, path))
    def stage(dataDir: String, write: String => Unit): Unit = {
      val dir = new org.apache.hadoop.fs.Path(root, dataDir)
      val staged = new org.apache.hadoop.fs.Path(dir, s".seg-$segId.stage")
      val dest = new org.apache.hadoop.fs.Path(dir, s"seg=$segId")
      if (fs.exists(staged)) fs.delete(staged, true)
      if (fs.exists(dest)) fs.delete(dest, true)
      write(staged.toString)
      failpoint(s"staged-$dataDir")
      require(fs.rename(staged, dest),
        s"could not publish index segment $dest (staged at $staged)")
    }
    stage("postings", p => postings.repartition(col("tb"))
      .write.partitionBy("tb").mode("overwrite").parquet(p))
    stage("totals", p => totals.write.mode("overwrite").parquet(p))
    failpoint("segments-renamed")
    EmbeddingOps.commitGen(fs, metaDir, gen + 1, segs :+ segId)
  }

  /** Serve BM25 top-k for a literal term set from the persisted
    * index: the terms' bucket ids (bounded by |terms|) collect and
    * push as a literal IN beside the committed-segment filter, so the
    * postings scan carries STATIC partition filters on (seg, tb);
    * document frequencies come off the pruned+tombstone-masked
    * postings (df stays EXACT under deletion); the totals row sums
    * the per-segment frame (one row per segment — totals include
    * tombstoned docs' mass until [[bm25IndexCompact]] applies
    * deletions physically, the index family's standard drift
    * contract). Output is column-for-column [[bm25TopK]]. */
  /** The pruned live-postings read behind [[bm25TopKIndexed]],
    * exposed un-pinned so plan probes can assert the (seg, tb)
    * partition filters on the actual serve path: committed-segment
    * filter + the terms' bucket ids as a literal IN, exact term
    * filter within the bucket, tombstone anti-join. */
  private[graft] def bm25PostingsScan(
      s: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    val nBuckets = bm25Params(s, path)
    import s.implicits._
    val tq = terms.toDF("word")
      .withColumn("tb", pmod(hash(col("word")), lit(nBuckets)))
      .pinned // bucket-id collect + exact term filter, one build
    val tbs = tq.select(col("tb")).distinct()
      .collect().map(_.getInt(0)) // bounded by |terms| by construction
    s.read.parquet(s"$path/postings")
      .where(EmbeddingOps.segFilter(s, path) &&
        col("tb").isin(tbs.map(Int.box): _*))
      .join(broadcast(tq.select(col("word"))), Seq("word"))
      .join(EmbeddingOps.tombstones(s, path, "doc_id"),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("word"), col("tf"), col("dl"))
  }

  def bm25TopKIndexed(s: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String], k: Int = 10,
      k1Permille: Long = 1200L, bPermille: Long = 750L): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "query terms must be non-empty and distinct")
    val posts = bm25PostingsScan(s, path, terms)
      .pinned // df branch + scoring branch, one pruned scan
    // df is count(DISTINCT doc_id), not count(rows): appending an
    // already-indexed doc (the bm25IndexAppend contract says route
    // ingestion through a dedup gate) would silently inflate a
    // row-count df. The distinct keeps df exact regardless — and
    // since duplicated postings would STILL corrupt ranking (the doc
    // scores once per copy), a row-count/distinct mismatch fails the
    // serve loudly instead of returning corrupt top-k. Both
    // aggregates ride the |terms|-bounded frame.
    val df_ = broadcast(posts.groupBy(col("word"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("doc_id")).as("df"))
      .select(col("word"),
        when(col("n_rows") === col("df"), col("df"))
          .otherwise(raise_error(concat(
            lit("bm25 index corrupt: duplicate doc_ids in postings " +
              "for term "), col("word"),
            lit(" — an append bypassed the dedup gate")))).as("df")))
    val tot = broadcast(s.read.parquet(s"$path/totals")
      .where(EmbeddingOps.segFilter(s, path))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("t_tok")).as("t_tok")))
    bm25Rank(posts.join(df_, Seq("word")).crossJoin(tot),
      k, k1Permille, bPermille)
  }

  /** Consolidate all segments into one and apply tombstones
    * PHYSICALLY — and, unlike the generic [[graft.operators
    * .EmbeddingOps.ivfIndexCompact]] path, RECOMPUTE the totals from
    * the surviving postings (distinct (doc_id, dl) per doc), so the
    * post-compaction collection statistics are exact again after any
    * deletion history. Swap-atomic; the staged tree carries no
    * tombstones, so compaction clears them. */
  def bm25IndexCompact(s: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    Warehouse.recoverSwap(fs, root)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_segs")
    val (gen, segs) = EmbeddingOps.committedSegs(fs, metaDir)
    require(gen >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — not an index root")
    val (dg, dsegs) = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_dels"))
    val hasDels = dg >= 0 && dsegs.nonEmpty
    if (segs.size <= 1 && !hasDels) 0
    else {
      val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(root, "params"), fs,
        new org.apache.hadoop.fs.Path(tmp, "params"), false, false,
        s.sparkContext.hadoopConfiguration)
      val live = s.read.option("basePath", s"$path/postings")
        .parquet(segs.sorted.map(n => s"$path/postings/seg=$n"): _*)
        .drop("seg")
        .join(EmbeddingOps.tombstones(s, path, "doc_id"),
          Seq("doc_id"), "left_anti")
        .pinned // postings rewrite + totals recompute, one read
      live.repartition(col("tb"))
        .write.partitionBy("tb").mode("overwrite")
        .parquet(s"$tmp/postings/seg=0")
      live.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tok"))
        .write.mode("overwrite").parquet(s"$tmp/totals/seg=0")
      EmbeddingOps.commitGen(fs,
        new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
      Warehouse.swapInto(fs, tmp, root)
      segs.size
    }
  }

  /** Contamination attribution card: [[decontaminate]]'s per-doc
    * overlap rolled up per SOURCE — which ingest feeds carry the
    * benchmark leakage (the question a curation team actually acts
    * on: drop the feed, not just the docs). Exact integer masses, one
    * permille division per source; the rollup is one aggregate over
    * the per-doc frame joined back to its source label. */
  def contaminationBySource(corpus: DataFrame, benchmark: DataFrame,
      num: Int = 8, den: Int = 10): DataFrame =
    decontaminate(corpus, benchmark, num, den)
      .join(corpus.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(col("n_shared")).as("sum_shared"),
        sum(col("n_shingles")).as("sum_shingles"))
      .withColumn("shared_permille",
        expr("sum_shared * 1000 div sum_shingles"))

  /** Exact global rank (1-based, ascending `score` with doc_id
    * tie-break) without a corpus-wide single-partition sort — the
    * [[pplBuckets]] order-aligned shard trick as a reusable step:
    * shard by floor(score*granularity) (monotone, so shard order
    * refines score order), ranks compose from the shard-cardinality
    * offset frame + a per-shard window. */
  private def rankBy(df: DataFrame, score: Column, granularity: Int,
      rankName: String): DataFrame = {
    val sh = df.withColumn("_rs", score)
      .withColumn("_shard", floor(col("_rs") * granularity).cast("long"))
      .pinned
    val counts = sh.groupBy(col("_shard")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = counts.withColumn("_off",
      coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("_shard"), col("_off"))
    val wIn = Window.partitionBy(col("_shard"))
      .orderBy(col("_rs"), col("doc_id"))
    sh.join(broadcast(off), Seq("_shard"))
      .withColumn(rankName,
        row_number().over(wIn).cast("long") + col("_off"))
      .drop("_rs", "_shard", "_off")
  }

  /** Per-source percentile normalization of a quality score — the
    * calibration step before a GLOBAL quality cut over heterogeneous
    * feeds (a raw perplexity threshold keeps easy-language sources
    * wholesale and guts hard ones; the percentile within each source
    * is comparable across them). Input (doc_id, source, score);
    * output adds the exact within-source rank, the source size, and
    * pct_permille = (rank-1)*1000 div max(n-1, 1) in [0, 1000]. The
    * [[rankBy]] shard trick generalized to a composite key: shards
    * are (source, floor(score*granularity)), offsets cumulate per
    * source over the shard-cardinality counts frame, ranks compose
    * per (source, shard) window — no source ever sorts in one
    * task. */
  def scorePercentile(scored: DataFrame,
      granularity: Int = 8): DataFrame = {
    require(granularity >= 1,
      s"granularity must be >= 1, got $granularity")
    val sh = scored.withColumn("_shard",
      floor(col("score") * granularity).cast("long")).pinned
    val counts = sh.groupBy(col("source"), col("_shard"))
      .agg(count(lit(1)).as("cnt")).pinned
    val wOff = Window.partitionBy(col("source")).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = counts.withColumn("_off",
      coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("source"), col("_shard"), col("_off"))
    val nTot = counts.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_src"))
    val wIn = Window.partitionBy(col("source"), col("_shard"))
      .orderBy(col("score"), col("doc_id"))
    sh.join(broadcast(off), Seq("source", "_shard"))
      .join(broadcast(nTot), Seq("source"))
      .withColumn("src_rank",
        row_number().over(wIn).cast("long") + col("_off"))
      .withColumn("pct_permille",
        expr("(src_rank - 1) * 1000 div greatest(n_src - 1, 1)"))
      .select(col("doc_id"), col("source"), col("score"),
        col("src_rank"), col("n_src"), col("pct_permille"))
  }

  /** Borda rank fusion of two independent quality signals — the
    * ensemble selection pattern (QuRating-style raters, CCNet
    * perplexity + DSIR target-similarity here): each doc gets its
    * exact global rank under the LM score (ascending — lower
    * perplexity is better) and under the DSIR importance weight
    * (descending — more target-like is better), and the fused
    * ordering is the rank SUM, surfaced as the top `k` by
    * (borda, doc_id). Rank fusion is scale-robust where score fusion
    * is not: the two signals live on incomparable scales, ranks
    * don't. Both ranks run [[rankBy]]'s shard trick (no global sort);
    * the final cut is a TakeOrderedAndProject. Only docs carrying
    * BOTH signals rank (outside the DSIR target source, >= 2
    * tokens). */
  def rankFusion(docs: DataFrame, targetSource: String,
      nBuckets: Int = DsirDefaultBuckets, granularity: Int = 8,
      k: Int = 100): DataFrame = {
    val lm = lmScore(docs).select(col("doc_id"), col("avg_nll"))
    val dw = dsirWeight(docs, targetSource, nBuckets)
      .select(col("doc_id"), col("avg_weight"))
    val both = lm.join(dw, Seq("doc_id")).pinned
    val r1 = rankBy(both, col("avg_nll"), granularity, "ppl_rank")
    val r2 = rankBy(both.select(col("doc_id"), col("avg_weight")),
      -col("avg_weight"), granularity, "dsir_rank")
      .select(col("doc_id"), col("dsir_rank"))
    r1.join(r2, Seq("doc_id"))
      .withColumn("borda", col("ppl_rank") + col("dsir_rank"))
      .select(col("doc_id"), col("avg_nll"), col("avg_weight"),
        col("ppl_rank"), col("dsir_rank"), col("borda"))
      .orderBy(col("borda").asc, col("doc_id").asc)
      .limit(k)
  }

  /** Inverse-cloze-task pair mining (Lee et al. 2019, "Latent
    * Retrieval for Weakly Supervised Open Domain QA" — the standard
    * retrieval-pretraining objective): a hash-chosen `w`-token window
    * becomes the QUERY, the document with that window excised becomes
    * the positive CONTEXT. Window choice is the [[splitAssign]]
    * discipline — first 4 md5 nibbles of `doc_id:ict` mod the window
    * count, so every engine/run picks the same window (with the
    * documented 1/65536 low-position bias; docs longer than 65536
    * tokens would bias further — chunk first). Pure per-row array
    * expressions, no shuffle; docs without a non-empty context
    * (fewer than w+1 tokens) drop. */
  def ictPairs(docs: DataFrame, w: Int = 8): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= w + 1)
      .withColumn("nw", (size(col("t")) - w + 1).cast("long"))
      .withColumn("start", pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":ict"))), 1, 4), 16, 10).cast("long"), col("nw")))
      .select(col("doc_id"), col("start").cast("int").as("start_pos"),
        expr(s"concat_ws(' ', slice(t, cast(start + 1 as int), $w))")
          .as("query_text"),
        expr("concat_ws(' ', concat(slice(t, 1, cast(start as int)), " +
          s"slice(t, cast(start + $w + 1 as int), size(t))))")
          .as("context_text"))
  }

  /** SFT pair assembly: adjacent doc_id pairs (even = prompt, odd =
    * response) template into one role-marked training sequence —
    * `<|user|> prompt <|assistant|> response <|end|>` — with the
    * assembled token count and a `kept` flag for the fixed-context
    * cut. The instruction-tuning counterpart of [[seqPack]]: packing
    * arranges documents, this ASSEMBLES conversation turns (the
    * role-template step every chat fine-tune runs before
    * tokenization). One keyed equi-join on pair_id; everything else
    * is per-row. */
  def sftPack(docs: DataFrame, maxTokens: Long = 300L): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val p = docs.where(col("doc_id") % 2 === 0)
      .select(expr("doc_id div 2").as("pair_id"),
        col("doc_id").as("prompt_id"), col("text").as("prompt"))
    val r = docs.where(col("doc_id") % 2 === 1)
      .select(expr("doc_id div 2").as("pair_id"),
        col("doc_id").as("response_id"), col("text").as("response"))
    p.join(r, Seq("pair_id"))
      .withColumn("seq", concat(lit("<|user|> "), col("prompt"),
        lit(" <|assistant|> "), col("response"), lit(" <|end|>")))
      .withColumn("n_tokens", size(split(col("seq"), " ")).cast("long"))
      .withColumn("kept", col("n_tokens") <= maxTokens)
      .select(col("pair_id"), col("prompt_id"), col("response_id"),
        col("seq"), col("n_tokens"), col("kept"))
  }

  /** Text normalization — the lexical front door of a curation chain
    * (run before hashing/shingling so trivially-reformatted
    * duplicates collide): lowercase, strip every character outside
    * [a-z0-9 ], collapse whitespace runs, trim. Pure per-row
    * expressions (codegen'd, no shuffle at all); reports raw and
    * normalized token counts alongside the cleaned text. The regex
    * class is deliberately the portable intersection both engines
    * implement identically (no Unicode classes — the oracle replays
    * with the same pattern + DuckDB's 'g' flag). */
  def normalizeText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens_raw"),
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("text_norm"))
      .withColumn("n_tokens_norm",
        size(split(col("text_norm"), " ")).cast("long"))
      .select(col("doc_id"), col("text_norm"), col("n_tokens_raw"),
        col("n_tokens_norm"))

  /** Vocabulary-growth (Heaps-law) card: the corpus splits into
    * `nSlices` doc_id-ORDERED slices standing for ingest order
    * (slice = doc_id*nSlices div n_docs, clamped — exact quantiles
    * for dense ids, a monotone id-ordered partition otherwise); each
    * word counts as NEW in the first slice it appears (min slice per
    * word — one vocabulary-keyed aggregate), and the cumulative
    * vocabulary size per slice is a running sum over the nSlices-row
    * frame. The read that says whether a tokenizer's vocab budget is
    * saturating or the corpus keeps minting types. Only the 1-row
    * count broadcasts. */
  def vocabGrowth(docs: DataFrame, nSlices: Int = 10): DataFrame = {
    require(nSlices >= 1, s"nSlices must be >= 1, got $nSlices")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val firstSlice = tokens(docs)
      .crossJoin(broadcast(n)) // 1-row scalar frame
      .select(least(expr(s"doc_id * $nSlices div n_docs"),
        lit(nSlices - 1L)).as("slice"), col("word"))
      .groupBy(col("word")).agg(min(col("slice")).as("slice"))
      .groupBy(col("slice")).agg(count(lit(1)).as("n_new_words"))
    firstSlice.withColumn("vocab_size",
      sum(col("n_new_words")).over(Window.orderBy(col("slice"))
        .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Dedup-cascade funnel card — the cheap-to-expensive staging every
    * large corpus runs (exact hash first, then order-insensitive
    * bag-of-words, then MinHash near-dup on what remains), reported
    * as survivors-per-stage so the marginal value of each stage is
    * visible before paying for it at full scale. Survivor rules are
    * the operators' own: min doc_id per content/bow hash; the
    * near-dup stage drops every doc_b of a surviving-input pair at
    * `threshold` (single-pass pair-greedy, not the transitive
    * [[dedupSurvivors]] closure — the funnel measures stage yield,
    * not final group structure). Each stage runs ONLY on the previous
    * stage's survivors; the output is four 1-row aggregates plus a
    * 4-row lag window — nothing corpus-sized leaves its stage. */
  def dedupCascadeReport(docs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val d = docs.pinned
    val d1 = d.join(dedupExact(d)
        .select(col("kept_doc_id").as("doc_id")), Seq("doc_id"))
      .pinned
    val d2 = d1.join(dedupBagOfWords(d1)
        .select(col("kept_doc_id").as("doc_id")), Seq("doc_id"))
      .pinned
    val dropped = nearDupMinhash(d2, threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    def cnt(df: DataFrame, idx: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"))
    val u = cnt(d, 0, "raw")
      .unionByName(cnt(d1, 1, "exact"))
      .unionByName(cnt(d2, 2, "bow"))
      .unionByName(cnt(d2.join(dropped, Seq("doc_id"), "left_anti"),
        3, "near_dup"))
    u.withColumn("n_removed",
      coalesce(lag(col("n_docs"), 1).over(Window.orderBy(col("stage_idx")))
        - col("n_docs"), lit(0L)))
  }

  /** [[decontaminate]]'s bloom-pruned scale path: the benchmark
    * shingle set compiles into a fixed-size bloom sketch (~1.2 MB per
    * million shingles at 1% fpp — a literal in the scan, not a
    * broadcast JOIN side), the corpus shingle stream prunes against
    * it BEFORE any shuffle, and the exact set join then runs only
    * over the ~(matching + fpp * rest) survivors to remove the
    * sketch's false positives. No false negatives, exact verify —
    * the output equals [[decontaminate]] row-for-row (the
    * `rel_bloom_prune_join` contract), while the corpus-vs-benchmark
    * shuffle shrinks from every corpus shingle to the overlap mass.
    * Two bounded driver scalars (benchmark cardinality, the sketch
    * bytes) are the only non-distributed state. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      num: Int = 8, den: Int = 10, fpp: Double = 0.01): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"containment threshold must be a fraction in [0,1], got $num/$den")
    val cs = shinglesRaw(corpus)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .distinct()
      .pinned // size branch + pruned-verify branch
    val bset = shinglesRaw(benchmark)
      .select(xxhash64(col("s")).as("h")).distinct()
      .pinned // cardinality, sketch build, and the exact verify join
    val nb = math.max(bset.count(), 1L)
    val filter = BloomJoin.buildFilter(bset, "h", nb, fpp)
    val sz = cs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val shared = BloomJoin.prune(cs, "h", filter)
      .join(bset, Seq("h")) // exact: false positives die here
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    sz.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated",
        col("n_shared") * den >= col("n_shingles") * num)
  }

  /** Multi-phrase blocklist screening — the safety/compliance filter
    * pass (banned phrases, boilerplate markers, license strings):
    * every document reports how many blocklist occurrences it
    * contains and whether it is blocked. Phrases group by token
    * count; for each distinct length L the document's L-gram stream
    * (the [[shinglesRaw]] windowless transform generalized) joins the
    * broadcast phrase list — the phrase set is a construction
    * constant, the only broadcast; per-L streams union and aggregate
    * once per doc. Zero-hit docs surface with n_hits 0 via the
    * corpus left join (a filter must SAY it inspected everything). */
  def blocklistScreen(docs: DataFrame,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.distinct.size == phrases.size,
      "phrases must be non-empty and distinct")
    require(phrases.forall(_.trim.nonEmpty),
      "phrases must be non-blank")
    val s = docs.sparkSession
    import s.implicits._
    val d = docs.pinned
    val byLen = phrases.groupBy(_.split(" ").length)
    val hits = byLen.map { case (l, ps) =>
      val grams = d
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= l)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(w) - $l), " +
            s"i -> concat_ws(' ', slice(w, i + 1, $l)))")).as("g"))
      grams.join(broadcast(ps.toDF("g")), Seq("g"))
        .select(col("doc_id"), col("g").as("phrase"))
    }.reduce(_ unionByName _)
    val agg = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("phrase")).as("n_phrases"))
    d.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"))
      .withColumn("blocked", col("n_hits") > 0)
  }

  /** Distinctive-vocabulary card: per source, the top `k` words most
    * over-represented vs the REST of the corpus — the
    * what-is-this-feed-actually-about read (and the drift alarm when
    * a feed's distinctive terms change release-over-release). The
    * over-representation score is the bit-length-quantized log of the
    * cross-multiplied rate ratio floor(log2((c_s * t_rest) div
    * ((c_r + 1) * t_s))) — add-one on the rest count so
    * source-exclusive words score, products in DECIMAL(38,0) (they
    * reach ~1e26 at corpus scale; the oracle mirrors with HUGEINT).
    * Only over-represented words (ratio >= 1) rank; the per-source
    * rank<=k window pre-trims (WindowGroupLimit). One token
    * aggregate keyed by (source, word), one vocabulary-keyed rollup,
    * 1-row totals broadcast. */
  def distinctiveTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sw = tokens(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c_s"))
      .pinned
    val wTot = sw.groupBy(col("word")).agg(sum(col("c_s")).as("c_w"))
    val sTot = sw.groupBy(col("source")).agg(sum(col("c_s")).as("t_s"))
    val tot = sw.agg(sum(col("c_s")).as("t_all"))
    val scored = sw
      .join(wTot, Seq("word"))
      .join(sTot, Seq("source"))
      .crossJoin(broadcast(tot)) // 1-row scalar frame
      .withColumn("c_r", col("c_w") - col("c_s"))
      .withColumn("t_r", col("t_all") - col("t_s"))
      .where(expr("CAST(c_s AS DECIMAL(38,0)) * t_r" +
        " >= CAST(c_r + 1 AS DECIMAL(38,0)) * t_s"))
      .withColumn("score_q", (length(bin(expr(
        "CAST(CAST(c_s AS DECIMAL(38,0)) * t_r" +
          " div (CAST(c_r + 1 AS DECIMAL(38,0)) * t_s) AS BIGINT)")))
        - 1).cast("long"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_q").desc, col("c_s").desc, col("word").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("source"), col("rk"), col("word"), col("c_s"),
        col("c_r"), col("score_q"))
  }

  /** Per-doc trigram occurrence counts (w1, w2, w3, k) — the
    * [[docBigrams]] shape one order up, built windowlessly per row.
    * (Exposed via [[docTrigramsOf]] for the streaming fold's
    * increment.) */
  private def docTrigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> struct(w[i] as w1, w[i+1] as w2, w[i+2] as w3))"))
        .as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("k"))

  /** [[docTrigrams]] for callers outside the object (the streaming
    * trigram fold's per-batch increment). */
  private[graft] def docTrigramsOf(docs: DataFrame): DataFrame =
    docTrigrams(docs)

  /** The trigram model frame (w1, w2, w3, c_abc) — train once, serve
    * many with [[lmScoreTrigramWith]]. */
  def lmTrigramModel(docs: DataFrame): DataFrame =
    docTrigrams(docs).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("k")).as("c_abc"))

  /** Trigram LM scoring with LADDERED stupid backoff (Brants et al.
    * 2007 one order up from [[lmScoreBackoff]]):
    *
    *   S(w3|w1 w2) = c123/c12                 seen trigram
    *               = 0.4 * c23/c2             else, seen bigram
    *               = 0.4^2 * (c3+1)/N         else (add-one unigram)
    *
    * with each arm's -log2 quantized to an exact integer bit length
    * (1/0.4 = 5/2, 1/0.16 = 25/4 — the products stay far under Long
    * at corpus scale). Reports how much probability mass came from
    * each rung (`n_bo_bigram`, `n_bo_unigram`) — the model-order
    * health read: a corpus scoring mostly through the unigram rung
    * is out-of-domain for the model. All serving tables derive from
    * the two model frames by keyed aggregation; only the 1-row total
    * broadcasts; every join is vocabulary-keyed. */
  def lmScoreTrigramWith(docs: DataFrame, tri: DataFrame,
      bi: DataFrame): DataFrame = {
    val t = tri.pinned // context marginal + the scoring join
    val b = bi.pinned // three marginals + the backoff join
    val ctx12 = t.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c_abc")).as("c_12"))
    val ctx2 = b.groupBy(col("lhs")).agg(sum(col("c_ab")).as("c_2"))
    val uni = b.groupBy(col("rhs")).agg(sum(col("c_ab")).as("c_3"))
    val tot = b.agg(sum(col("c_ab")).as("n_total"))
    docTrigrams(docs)
      .join(t, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(b.select(col("lhs").as("w2"), col("rhs").as("w3"),
        col("c_ab").as("c_23")), Seq("w2", "w3"), "left")
      .join(ctx2.select(col("lhs").as("w2"), col("c_2")), Seq("w2"),
        "left")
      .join(uni.select(col("rhs").as("w3"), col("c_3")), Seq("w3"),
        "left")
      .join(broadcast(tot), lit(true))
      .withColumn("nll_q", when(col("c_abc").isNotNull,
          (length(bin(expr("c_12 div c_abc"))) - 1).cast("long"))
        .otherwise(when(col("c_23").isNotNull,
          (length(bin(expr("(c_2 * 5) div (c_23 * 2)"))) - 1)
            .cast("long"))
        .otherwise((length(bin(expr(
          "(n_total * 25) div ((coalesce(c_3, 0) + 1) * 4)"))) - 1)
          .cast("long"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * col("nll_q")).as("nll_sum"),
        sum(col("k")).as("n_trigrams"),
        sum(when(col("c_abc").isNull && col("c_23").isNotNull, col("k"))
          .otherwise(0L)).as("n_bo_bigram"),
        sum(when(col("c_abc").isNull && col("c_23").isNull, col("k"))
          .otherwise(0L)).as("n_bo_unigram"))
      .select(col("doc_id"), col("nll_sum"), col("n_trigrams"),
        col("n_bo_bigram"), col("n_bo_unigram"),
        (col("nll_sum").cast("double") / col("n_trigrams"))
          .as("avg_nll"))
  }

  /** LM branching-factor card: for each bigram context, how many of
    * its most-frequent continuations cover >= `permille`/1000 of the
    * context's mass, histogrammed over contexts — the
    * concentration-of-continuations read (a corpus whose contexts
    * need few continuations is templated/repetitive; one that needs
    * many is genuinely diverse — the LM-shape complement of the
    * [[repetition]] doc-level signals). n_needed for a context is
    * the smallest k whose top-k cumulative count clears the
    * cross-multiplied threshold (exact integers, no division). Runs
    * over the MODEL table (vocabulary-squared worst case, never
    * corpus-sized); per-context windows order by (count desc, rhs) —
    * a hot context sorts its own continuations only. */
  def branchingCard(docs: DataFrame,
      permille: Int = 900): DataFrame = {
    require(permille >= 1 && permille <= 1000,
      s"permille must be in [1, 1000], got $permille")
    val lm = lmModelOf(docBigrams(docs)).pinned
    val ctx = lm.groupBy(col("lhs")).agg(sum(col("c_ab")).as("c_lhs"))
    val w = Window.partitionBy(col("lhs"))
      .orderBy(col("c_ab").desc, col("rhs").asc)
    val needed = lm.join(ctx, Seq("lhs"))
      .withColumn("cum", sum(col("c_ab")).over(w))
      .withColumn("rk", row_number().over(w)) // BEFORE the clear-filter
      .where(col("cum") * 1000 >= col("c_lhs") * permille)
      .groupBy(col("lhs")).agg(min(col("rk")).as("n_needed"))
    needed.groupBy(col("n_needed"))
      .agg(count(lit(1)).as("n_contexts"))
  }

  /** Cluster-topic labeling — the cross-family composition: k-means
    * cells over the EMBEDDING table ([[graft.operators.EmbeddingOps
    * .cellAssignments]], the same partition SemDeDup bounds its
    * candidates with) joined to the DOCUMENT table by id, then each
    * cell's [[distinctiveTerms]] — the human-readable answer to
    * "what IS cluster 7". Cells relabel as the stratum key; the term
    * machinery is reused verbatim, so the card inherits its exact
    * integer arithmetic and pre-trimmed per-cell top-k. */
  def clusterTopics(docs: DataFrame, emb: DataFrame,
      nCentroids: Int = EmbeddingOps.KmSeeds,
      iters: Int = EmbeddingOps.KmIters, k: Int = 5): DataFrame = {
    val cells = EmbeddingOps.cellAssignments(emb, nCentroids, iters)
    val relabeled = docs.select(col("doc_id"), col("text"))
      .join(cells.select(col("vec_id").as("doc_id"),
        concat(lit("c"), col("cell").cast("string")).as("source")),
        Seq("doc_id"))
    distinctiveTerms(relabeled, k).withColumnRenamed("source", "cell")
  }

  /** Banding-recall card: what fraction of the TRUE near-dup pairs
    * (exact Jaccard >= threshold over every pair sharing at least one
    * shingle — the measurement baseline; zero-overlap pairs are below
    * any positive threshold by construction) does the MinHash banding
    * actually surface as candidates? The honest-measurement row for
    * the dedup route ([[nearDupMinhash]]'s band count/size trades
    * recall for candidate volume — this measures the trade on the
    * real corpus instead of trusting the 1-(1-s^r)^b formula). The
    * baseline's shingle self-join is quadratic in per-shingle
    * df (the brute twin's cost, like nearDupCosineBrute); the banded
    * side is the dedup's own candidate generator. Output is one row:
    * (n_true, n_caught, recall_permille). */
  def minhashBandRecall(docs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val ds = shinglesRaw(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .distinct()
      .pinned
    val sz = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val tp = ds.as("a").join(ds.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("nc"))
    val tj = tp
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .where(col("nc") / (col("na") + col("nb") - col("nc"))
        .cast("double") >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .pinned // counted alone and joined against the banded set
    // the banded side is the dedup's OWN candidate generator — capped,
    // so the recall this card reports is the production route's recall
    val cand = cappedBandPairs(minhashBands(minhashSignature(docs)),
      Seq("band_idx", "band_hash"))
    tj.agg(count(lit(1)).as("n_true"))
      .crossJoin(broadcast(tj.join(cand, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_caught"))))
      .withColumn("recall_permille",
        when(col("n_true") === 0, 0L)
          .otherwise(expr("n_caught * 1000 div n_true")))
  }

  /** Order-insensitive exact dedup: the group key is the md5 of the
    * SORTED token list, so documents that permute each other's words
    * (template reshuffles, list reorderings — duplicates the
    * position-sensitive [[dedupExact]] misses and shingle methods only
    * partially catch) collapse into one group. Same scale shape as
    * [[dedupExact]]: one per-row hash (the sort is per-document,
    * inside the row), one map-side-combined groupBy — nothing else
    * moves. */
  def dedupBagOfWords(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(concat_ws(" ", array_sort(split(col("text"), " "))))
        .as("bow_hash"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))

  private val MinhashK = 16
  private val BandSize = 4 // 4 bands x 4 rows

  /** 16-hash MinHash signature per doc (Broder, "On the resemblance
    * and containment of documents", 1997): min over shingles of
    * md5(shingle||":"||k) — the lexicographic min of hex strings is a
    * valid uniform min-hash and is engine-portable. Hashing happens
    * per (doc, shingle) row straight into a 16-column min aggregate:
    * one map-side-combined shuffle, no joins. (Hashing distinct
    * shingles once and joining back only wins when the shingle
    * vocabulary is tiny relative to the corpus — on natural text it is
    * not, and the extra join costs more than the saved md5s.)
    *
    * Runs on the RAW (non-distinct) shingle stream: min() is invariant
    * under duplicates, so the pre-aggregation distinct shuffle is pure
    * waste — map-side combine already reduces every partition to 16
    * hashes per doc before anything moves. */
  def minhashSignature(docs: DataFrame): DataFrame = {
    val sh = shinglesRaw(docs)
    val aggs = (0 until MinhashK).map(k =>
      min(md5(concat(col("s"), lit(s":$k")))).as(s"m$k"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-doc content hash + MinHash signature in ONE pass — the
    * registry form the streaming fold ([[graft.streaming.Streams]]'s
    * minhashSink) needs: EVERY delivered doc is recorded (null text
    * hashes as the empty string, so any content mutation is
    * detectable), while the signature columns are NULL for docs below
    * the 3-token shingle floor. One scan, one map-side-combined
    * shuffle — no second pass or join to attach the hash. Signature
    * values where present are IDENTICAL to [[minhashSignature]]'s
    * (same per-hash aggregate; min ignores the null shingle the
    * outer explode emits for short docs). */
  def minhashRegistry(docs: DataFrame): DataFrame =
    minhashRegistryAudited(docs)
      .withColumnRenamed("ch_lo", "content_hash").drop("ch_hi")

  /** [[minhashRegistry]] with the per-doc content hash carried as a
    * (min, max) PAIR instead of one value — the shape the streaming
    * fold ([[graft.streaming.Streams]]'s minhashSink) consumes: a doc
    * delivered twice WITHIN one micro-batch with different text
    * collapses under the min aggregate, and a single min hash would
    * hide that — ch_lo != ch_hi is the loud in-batch evidence the
    * refuse-on-mutation contract needs. Same single pass. */
  private[graft] def minhashRegistryAudited(docs: DataFrame): DataFrame = {
    val aggs = min(col("ch")).as("ch_lo") +:
      max(col("ch")).as("ch_hi") +:
      (0 until MinhashK).map(k =>
        min(md5(concat(col("s"), lit(s":$k")))).as(s"m$k"))
    docs
      .select(col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("ch"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("ch"),
        explode_outer(when(size(col("w")) >= 3, expr(
          "transform(sequence(0, size(w) - 3), " +
            "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))).as("s"))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding of the MinHash signature: 4 bands of 4 hashes; docs
    * sharing any (band_idx, band_hash) bucket become candidate pairs.
    * Pair space is per-bucket, never corpus-quadratic. */
  def minhashBands(sig: DataFrame): DataFrame = {
    val bandCols = (0 until MinhashK / BandSize).map { b =>
      val cols = (b * BandSize until (b + 1) * BandSize).map(i => col(s"m$i"))
      md5(concat_ws("|", cols: _*))
    }
    sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Production default for [[cappedBandPairs]]' per-bucket volume
    * bound: far above any bucket the synthetic corpora produce (max
    * band-bucket membership is 4 at sf0.1, 21 for prefix blocking), so
    * oracle-scale results are bit-identical to the uncapped join,
    * while a template-spam mega-bucket at 100 TB is bounded the moment
    * it appears. */
  val BucketCap = 64

  /** Candidate pairs from bucketed blocking keys with a PER-BUCKET
    * VOLUME BOUND — the backstop that keeps LSH/blocking candidate
    * generation linear under template spam. The naive
    * `bucket ⋈ bucket` self-join emits B²/2 pairs for a bucket with B
    * members; one boilerplate page duplicated 10⁶ times (timestamps
    * and session ids defeat the upstream EXACT dedup, which is
    * precisely the near-dup case) puts 10⁶ signatures in the same
    * bucket in every band → 5·10¹¹ candidate pairs. An oversized
    * bucket is not a candidate source, it IS a dup-cluster detection:
    * members of a bucket over `bucketCap` are routed STRAIGHT to the
    * bucket's hub (its minimum doc_id) as (hub, member) star pairs —
    * O(B) pairs that give downstream [[dupGroups]] the same connected
    * component via the hub — while buckets at or under the cap keep
    * exact all-pairs generation. Deterministic (the hub is a min, the
    * arms partition buckets exactly), so oracles mirror it with one
    * windowed count.
    *
    * Recall trade, stated loudly: within an oversized bucket only
    * hub-member pairs reach verification, so a member pair whose
    * similarity to each other survives verification but whose
    * similarity to the hub does not is dropped. For near-dup dedup
    * that is the intended semantics (the bucket is one cluster); the
    * [[bandVolumeReport]] row accounts capped buckets and avoided
    * pair volume so the trade is visible, never silent.
    *
    * Scale shape: one windowed count/min per bucket (a keyed shuffle
    * on the blocking key — the same key the join was about to shuffle
    * on anyway), pinned once for its three consumers; the all-pairs
    * arm joins only rows from bounded buckets (≤ cap·B/2 pairs per
    * bucket); the star arm is a projection. */
  private[graft] def cappedBandPairs(bands: DataFrame,
      keyCols: Seq[String], bucketCap: Int = BucketCap): DataFrame = {
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val bx = bands
      .select(keyCols.map(col) :+ col("doc_id"): _*)
      .withColumn("bn", count(lit(1)).over(w))
      .withColumn("hub", min(col("doc_id")).over(w))
      .pinned
    val small = bx.where(col("bn") <= bucketCap)
    val allPairs = small.as("a").join(small.as("b"), keyCols)
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val star = bx
      .where(col("bn") > bucketCap && col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
    allPairs.unionAll(star).distinct()
  }

  /** Accounting card for [[cappedBandPairs]]' volume bound over the
    * MinHash bands: per band position, the bucket count, the largest
    * bucket, how many buckets exceed `bucketCap`, the member mass
    * inside them, and the exact all-pairs volume the star routing
    * avoided (B(B-1)/2 - (B-1) per capped bucket). All exact
    * integers; the frame is bucket-cardinality, aggregated to 4
    * rows — the loud-overflow half of the capped-candidate
    * contract. */
  def bandVolumeReport(docs: DataFrame,
      bucketCap: Int = BucketCap): DataFrame =
    minhashBands(minhashSignature(docs))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("bn"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bn")).as("max_bucket"),
        sum(when(col("bn") > bucketCap, 1L).otherwise(0L))
          .as("n_capped"),
        sum(when(col("bn") > bucketCap, col("bn")).otherwise(0L))
          .as("overflow_docs"),
        sum(when(col("bn") > bucketCap,
          expr("bn * (bn - 1) div 2 - (bn - 1)")).otherwise(0L))
          .as("pairs_avoided"))

  /** Exact intersection sizes for candidate pairs over per-doc element
    * sets `sets(doc_id, h)`: |A∩B| per (doc_a, doc_b). Shared by every
    * near-dup route so the verification arithmetic cannot drift between
    * them (the SQL oracles share their CTEs for the same reason).
    *
    * Join order is the skew guard: [[cappedBandPairs]]' star arm keys
    * B-1 pairs of a capped mega-bucket on ONE doc_a (the hub), so
    * expanding the doc_a side first would move B x |hub's set| rows
    * through a single join key — one task owns the whole mega-bucket.
    * Expanding doc_b first (each member appears in at most a few
    * pairs) and then joining the doc_a side on the COMPOSITE key
    * (doc_a, h) spreads the hub across its |H| distinct element
    * hashes: per-key volume is the number of candidate partners
    * sharing that one element, never B x |H|. Inner joins commute, so
    * results are bit-identical to the single-key order. */
  private def interFromCandidates(sets: DataFrame,
      cand: DataFrame): DataFrame =
    cand
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .join(sets.as("sa"),
        col("doc_a") === col("sa.doc_id") && col("sb.h") === col("sa.h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))

  /** Exact-Jaccard verification tail over `inter(doc_a, doc_b,
    * n_common)`: join the set sizes, one IEEE division, keep pairs at
    * >= threshold. */
  private def jaccardFromInter(sets: DataFrame, inter: DataFrame,
      threshold: Double): DataFrame = {
    val sz = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val jac = col("n_common") /
      (col("na") + col("nb") - col("n_common")).cast("double")
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .withColumn("jaccard", jac)
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"), col("jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs with exact n-gram-Jaccard
    * verification: candidates from shared LSH buckets, then
    * |A∩B| / |A∪B| over the true shingle sets (exact integers, one
    * division), kept when >= threshold.
    *
    * Candidate generation is VOLUME-CAPPED by default (the
    * [[cappedBandPairs]] bound at [[BucketCap]]): a bucket over the
    * cap routes its members to the bucket's min-doc hub as star
    * pairs instead of all-pairs, so within an oversized bucket only
    * hub-member pairs reach verification — identical results to the
    * uncapped join whenever every bucket fits the cap (true at all
    * oracle scales), a documented recall trade under template spam
    * ([[bandVolumeReport]] accounts it). Pass a larger `bucketCap`
    * to widen the exact regime. */
  def nearDupMinhash(docs: DataFrame, threshold: Double = 0.7,
      bucketCap: Int = BucketCap): DataFrame = {
    // The exact-Jaccard verify works on distinct shingle SETS, but only
    // set sizes and intersection sizes matter — so the set elements are
    // 8-byte xxhash64 surrogates, not the shingle strings: the distinct
    // shuffle and both intersection join sides move longs instead of
    // ~25-byte text. Results equal the string-set answer unless two
    // DIFFERENT shingles of the same doc pair collide in 64 bits
    // (p ~ n_doc_shingles^2 / 2^64 — vanishing; md5-based signatures
    // and the oracle parity are unaffected by the surrogate choice).
    // pinned (localCheckpoint by default) over cache(): same reuse, but
    // blocks free with the frame instead of accumulating in the
    // CacheManager across calls.
    val ds = shinglesRaw(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .distinct()
      .pinned
    val cand = cappedBandPairs(minhashBands(minhashSignature(docs)),
      Seq("band_idx", "band_hash"), bucketCap)
    jaccardFromInter(ds, interFromCandidates(ds, cand), threshold)
  }

  /** Standalone n-gram Jaccard near-dup (the minhash-free member of
    * the dedup family): candidate pairs come from PREFIX BLOCKING —
    * docs sharing any of the `prefixK` lexicographically-smallest
    * md5(shingle) values (the prefix-filtering idea from set-similarity
    * join literature, e.g. Xiao et al., "Efficient similarity joins
    * for near duplicate detection", WWW 2008, with a fixed-length
    * prefix) — then exact Jaccard over the full distinct shingle-hash
    * sets, kept at >= threshold.
    *
    * A fixed prefixK is a deterministic blocking heuristic, not a
    * recall guarantee: a qualifying pair sharing none of its k smallest
    * hashes is missed; k trades candidate volume for recall (the exact
    * prefix length for guaranteed recall depends on each set's size).
    * Hashes are md5 (bit-identical across engines) so the oracle
    * mirrors blocking and verification exactly. Scale shape matches
    * [[nearDupMinhash]]: per-bucket candidates, never corpus-quadratic;
    * one checkpointed shingle-hash set reused by blocking, sizes, and
    * intersection. */
  def nearDupNgramJaccard(docs: DataFrame, threshold: Double = 0.5,
      prefixK: Int = 2): DataFrame = {
    val dh = shinglesRaw(docs)
      .select(col("doc_id"), md5(col("s")).as("h"))
      .distinct()
      .pinned
    val w = Window.partitionBy(col("doc_id")).orderBy(col("h"))
    val pref = dh.withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixK)
      .select(col("doc_id"), col("h"))
    // prefix buckets (docs sharing one of their k smallest hashes)
    // carry the same quadratic hazard as LSH buckets — a globally
    // common shingle with a small md5 becomes the min of every doc
    // containing it; the shared cap bounds it (max 21 at sf0.1)
    val cand = cappedBandPairs(pref, Seq("h"))
    jaccardFromInter(dh, interFromCandidates(dh, cand), threshold)
  }

  /** Estimator-quality report for the MinHash route: every verified
    * near-dup pair next to what the SIGNATURE alone would have
    * estimated — the matching-component fraction (the textbook
    * unbiased Jaccard estimator the banding is built on), as an exact
    * permille of the 16 hash components. The row is the measurement
    * that justifies trusting banded candidate generation at a given
    * signature width: estimate vs exact, per real pair. Signature
    * frame joins by doc key twice; pair volume is the verified-dup
    * mass. */
  def minhashEstimate(docs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val sig = minhashSignature(docs).pinned
    val matches = (0 until MinhashK).map(k =>
      when(col(s"a.m$k") === col(s"b.m$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    nearDupMinhash(docs, threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        matches.as("n_match"))
      .withColumn("est_permille",
        expr(s"n_match * 1000 div $MinhashK"))
  }

  /** Duplicate GROUPS from near-dup pairs: connected components by
    * iterative min-label propagation — each doc's group id converges to
    * the smallest doc_id reachable through the pair graph (the
    * canonical "keep one survivor per duplicate cluster" step that
    * follows any pair-producing dedup).
    *
    * Each iteration is one distributed join + aggregate; the driver
    * only counts changed labels to detect the fixpoint (no row data is
    * ever collected). Converges in O(graph diameter) rounds — dup
    * clusters are shallow in practice, and `maxIters` bounds the
    * pathological chain; hitting the bound without converging THROWS
    * rather than silently returning split clusters. Superseded label
    * checkpoints (<= maxIters small frames) are reclaimed by the
    * ContextCleaner when they become unreachable. Min-label
    * propagation is order-independent, so the result is deterministic
    * and oracle-checkable against a recursive-CTE transitive
    * closure. */
  def dupGroups(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val fwd = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val edges = fwd
      .unionAll(fwd.select(col("b").as("a"), col("a").as("b")))
      .pinned
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("grp"))
      .pinned
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("grp").as("nbr_grp")),
          Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("nbr_grp")).as("nbr_grp"))
      // the convergence flag rides in the checkpointed frame, so the
      // round's one real job is the localCheckpoint; the changed-count
      // below only scans the already-materialized blocks (no join back
      // against the previous labels, no recomputation)
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("grp"), coalesce(col("nbr_grp"), col("grp"))).as("grp"),
          coalesce(col("nbr_grp") < col("grp"), lit(false)).as("changed"))
        .pinned
      changed = next.where(col("changed")).count()
      labels = next.select(col("id"), col("grp"))
      it += 1
    }
    require(changed == 0,
      s"dupGroups did not converge within $maxIters iterations " +
        "(duplicate-chain diameter exceeds the bound); raise maxIters")
    labels.select(col("id").as("doc_id"), col("grp").as("group_id"))
  }

  /** End-to-end dedup: the surviving corpus — every doc except
    * non-minimum members of near-duplicate groups (pairs from
    * [[nearDupMinhash]], groups from [[dupGroups]], survivor = the
    * group's min doc_id). The left_anti keeps docs outside any dup
    * group untouched; only group-member ids shuffle. */
  def dedupSurvivors(docs: DataFrame, threshold: Double = 0.7): DataFrame = {
    val losers = dupGroups(
        nearDupMinhash(docs, threshold).select(col("doc_a"), col("doc_b")))
      .where(col("doc_id") =!= col("group_id"))
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  // ---- persisted MinHash near-dup index (serve + append) ---------------

  /** One index row per indexable doc (>= 3 tokens, like every shingle
    * route): the doc's LSH band hashes (position-ordered, identical to
    * [[minhashBands]]' values) plus its distinct shingle-hash SET as
    * an 8-byte-surrogate array and the set size. Bands and sets ride
    * ONE row so candidate generation column-prunes to (doc_id,
    * band_hashes) while verification reads (doc_id, hs, n_h) — no
    * second dataset, no cross-dataset atomicity problem. The set
    * array's ELEMENT ORDER is nondeterministic (collect_set), but
    * serving consumes it only through size(array_intersect(..)) —
    * order-independent, so results are deterministic. */
  private def minhashIndexRows(docs: DataFrame): DataFrame = {
    val sets = shinglesRaw(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"))
      .select(col("doc_id"), col("hs"),
        size(col("hs")).cast("long").as("n_h"))
    val bands = minhashBands(minhashSignature(docs))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("band_idx"), col("band_hash")))).as("bb"))
      .select(col("doc_id"),
        expr("transform(bb, x -> x.band_hash)").as("band_hashes"))
    sets.join(bands, Seq("doc_id"))
  }

  /** Per-bucket statistics of ONE index segment's rows: (band_idx,
    * band_hash, bn = member count, hub = min doc_id). Written next to
    * each segment as a `_bstats` sidecar (underscore-hidden, so the
    * docs read never discovers it) and merged at serve time — bn sums
    * and hub mins across segments, so the merged values equal a
    * window over all committed rows by construction. */
  private def minhashBandStats(rows: DataFrame): DataFrame =
    rows.select(col("doc_id"),
        posexplode(col("band_hashes")).as(Seq("band_idx", "band_hash")))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("bn"), min(col("doc_id")).as("hub"))

  /** Merged per-bucket statistics of a persisted MinHash index — the
    * serving view of the `_bstats` sidecars (bn sums, hub mins across
    * committed segments), doubling as the index's bucket-balance
    * monitoring card (the [[graft.operators.EmbeddingOps
    * .indexCellStats]] analog: bucket skew is what drives the volume
    * cap). Output (band_idx, band_hash, bn, hub), bucket-cardinality. */
  def minhashIndexStats(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    val (gen, segs) = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_segs"))
    require(gen >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — not an index root")
    s.read.parquet(segs.map(k => s"$path/docs/seg=$k/_bstats"): _*)
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(sum(col("bn")).as("bn"), min(col("hub")).as("hub"))
  }

  /** Stage one segment: the index rows, plus the `_bstats` sidecar
    * computed from the rows AS WRITTEN (read back from the staged
    * files, so the stats can never drift from the data they count).
    * Both land inside the staged segment dir — the segment's publish
    * rename commits them together, keeping appends crash-atomic. */
  private def writeSegWithStats(s: org.apache.spark.sql.SparkSession,
      rows: DataFrame, segDir: String): Unit = {
    rows.write.mode("overwrite").parquet(segDir)
    minhashBandStats(
        s.read.parquet(segDir).select(col("doc_id"), col("band_hashes")))
      .write.mode("overwrite").parquet(s"$segDir/_bstats")
  }

  /** Build a PERSISTED MinHash near-dup index at `path` — the text
    * twin of [[graft.operators.EmbeddingOps.ivfIndexWrite]]'s
    * offline-build/online-serve split, and the missing incremental
    * half of [[nearDupMinhash]]: a 100 TB corpus is deduped ONCE, then
    * every ingest batch asks "is this new doc a near-dup of anything
    * already kept?" without touching the corpus again. Layout:
    * `docs/seg=N` row segments (each carrying a `_bstats` per-bucket
    * stat sidecar — see [[minhashBandStats]]) under a `_segs/gen-K`
    * manifest (the crash-atomic segment protocol; rebuilds stage a
    * hidden sibling and swap). No `_params` sidecar: the signature
    * construction (3-token shingles, 16 hashes, 4 bands) is pure code
    * shared with every other minhash route, not caller configuration —
    * the index is self-describing the way the IVF index's stored
    * centroids are. */
  def minhashIndexWrite(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    Warehouse.recoverSwap(fs, root)
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    writeSegWithStats(s, minhashIndexRows(docs), s"$tmp/docs/seg=0")
    EmbeddingOps.commitGen(fs,
      new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
  }

  /** Append a new batch of docs to a persisted MinHash index: one new
    * segment (rows + its `_bstats` sidecar, O(batch) both), O(batch)
    * IO, CRASH-ATOMIC via the segment protocol (a kill anywhere leaves
    * serving unchanged; the retry completes).
    * Caller contract mirrors ivfIndexAppend: doc_ids must be new
    * (route ingestion through a registry when mutation protection
    * matters), one appender at a time. */
  def minhashIndexAppend(docs: DataFrame, path: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val s = docs.sparkSession
    EmbeddingOps.appendSegment(s, path, "docs",
      staged => writeSegWithStats(s, minhashIndexRows(docs), staged),
      failpoint)
  }

  /** Serve near-dup lookups from a persisted MinHash index: for a NEW
    * batch of docs, every (indexed doc, batch doc) pair whose exact
    * Jaccard (over distinct shingle-hash sets) reaches `threshold`,
    * with candidates bounded by LSH band collisions exactly as in
    * [[nearDupMinhash]]. Output (doc_a = indexed, doc_b = batch,
    * n_common, na, nb, jaccard).
    *
    * Scale shape: the batch side (bands AND sets) is broadcast —
    * bounded by the ingest batch, never the index. The index is read
    * twice with static committed-segment pruning, both passes
    * column-pruned: a SLIM pass (doc_id + band hashes) generates
    * candidates under the stored-bucket volume cap (oversized buckets
    * answer through their hub — see the inline note), and the full
    * pass verifies, filtered by the BROADCAST bounded candidate set.
    * The bucket stats (bn/hub) come from each segment's persisted
    * `_bstats` sidecar — merged for batch-touched buckets only and
    * broadcast — so the stored rows NEVER shuffle: the slim pass is a
    * scan feeding two broadcast joins, and the only exchanges in the
    * whole serve are bounded (touched-bucket sidecar rows into the
    * stat merge, candidate pairs into the dedup). The `hs` arrays
    * never leave their scan partition. Batch doc_ids are assumed
    * disjoint from indexed ones (the append contract). */
  def nearDupServe(s: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, threshold: Double = 0.7,
      bucketCap: Int = BucketCap): DataFrame = {
    val stored = s.read.parquet(s"$path/docs")
      .where(EmbeddingOps.segFilter(s, path)).drop("seg")
    val nb = minhashIndexRows(batch).pinned
    // candidate generation runs over SLIM rows (doc_id + band hashes —
    // the scan column-prunes away the shingle sets), with the
    // [[cappedBandPairs]] volume bound applied to the STORED buckets:
    // an indexed template-spam cluster puts B signatures in one bucket
    // in every band, and an uncapped serve would fan every matching
    // batch doc out to all B of them — the capped serve compares the
    // batch doc against the bucket's min-doc hub instead (the cluster
    // representative answers "is this a near-dup of something kept").
    // Candidates are therefore bounded by |batch| * nBands * bucketCap
    // BY CONSTRUCTION, which is what makes them broadcastable below.
    val bbIds = nb.select(col("doc_id").as("doc_b"),
      posexplode(col("band_hashes")).as(Seq("band_idx", "band_hash")))
    val batchKeys = bbIds.select(col("band_idx"), col("band_hash"))
      .distinct()
    // bn/hub per bucket come from the segments' persisted `_bstats`
    // sidecars (written with each segment, regenerated by compaction),
    // NOT a window over the stored band rows: per-segment stats merge
    // by sum/min, which equals the window over all committed rows by
    // construction. Only batch-touched buckets merge (semi-join
    // against the broadcast batch keys before the aggregate), so the
    // stat exchange is O(touched buckets x segments) — and the stored
    // band rows themselves never ride ANY exchange: the filter below
    // is a broadcast join against the merged stats.
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    val (_, segs) = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_segs"))
    val statDirs = segs.map(k => s"$path/docs/seg=$k/_bstats")
    statDirs.foreach { d =>
      require(fs.exists(new org.apache.hadoop.fs.Path(d)),
        s"no _bstats sidecar at $d — the index predates the stat " +
          "sidecar; rebuild or compact it with this version first")
    }
    val touched = s.read.parquet(statDirs: _*)
      .join(broadcast(batchKeys), Seq("band_idx", "band_hash"),
        "left_semi")
    // single-segment indexes (every index after a compaction — the
    // steady state) skip the merge: the segment's stats ARE the
    // totals, so the serve plans ZERO aggregation exchanges
    val stats =
      if (segs.size == 1) touched
      else touched
        .groupBy(col("band_idx"), col("band_hash"))
        .agg(sum(col("bn")).as("bn"), min(col("hub")).as("hub"))
    val sbCapped = stored.select(col("doc_id").as("doc_a"),
        posexplode(col("band_hashes")).as(Seq("band_idx", "band_hash")))
      .join(broadcast(stats), Seq("band_idx", "band_hash"))
      .where(col("bn") <= bucketCap || col("doc_a") === col("hub"))
    val cand = sbCapped
      .join(broadcast(bbIds), Seq("band_idx", "band_hash"))
      .select(col("doc_a"), col("doc_b")).distinct()
    // verification: one more pass over the index, filtered in a
    // broadcast-hash join by the bounded candidate set — each pair's
    // stats compute exactly once (no per-band duplicate dedup needed)
    val scored = stored.select(col("doc_id").as("doc_a"),
        col("hs").as("hs_a"), col("n_h").as("na"))
      .join(broadcast(cand), Seq("doc_a"))
      .join(broadcast(nb.select(col("doc_id").as("doc_b"),
        col("hs").as("hs_b"), col("n_h").as("nb"))), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long")
          .as("n_common"),
        col("na"), col("nb"))
    scored
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      // tombstones mask at the CANDIDATE stage, not the index scan: an
      // anti-join against the thresholded pair rows shuffles
      // duplication-mass-sized stats, where masking the scan itself
      // would shuffle the whole index (hs arrays and all) through a
      // doc_id-keyed join
      .join(EmbeddingOps.tombstones(s, path, "doc_id")
        .withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"), col("jaccard"))
  }

  /** Delete docs from a persisted MinHash index — the [[graft.operators
    * .EmbeddingOps.indexDelete]] tombstone protocol keyed by doc_id
    * (crash-atomic, O(batch); serving anti-joins the committed
    * tombstone set, [[minhashIndexCompact]] applies it physically).
    * Same caller contract: a tombstoned doc_id must never be
    * re-appended; one maintainer at a time. */
  def minhashIndexDelete(s: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame,
      failpoint: String => Unit = _ => ()): Unit =
    EmbeddingOps.indexDelete(s, path, ids, failpoint, keyCol = "doc_id")

  /** Compact a persisted MinHash index: the segment chain collapses to
    * one, tombstoned docs drop physically, and the tombstone manifest
    * clears — serving is identical before and after. Returns the
    * number of segments consolidated (0 = nothing to do). */
  def minhashIndexCompact(s: org.apache.spark.sql.SparkSession,
      path: String, failpoint: String => Unit = _ => ()): Int =
    EmbeddingOps.compactSegments(s, path, "docs", Seq.empty,
      _.write.mode("overwrite"), keyCol = "doc_id", failpoint,
      // regenerate the per-bucket stat sidecar from the COMPACTED rows
      // (tombstoned docs dropped physically, so their bn/hub mass
      // disappears exactly as the pre-sidecar window would recompute)
      extraSeg = segDir => minhashBandStats(
        s.read.parquet(segDir).select(col("doc_id"), col("band_hashes")))
        .write.mode("overwrite").parquet(s"$segDir/_bstats"))

  // ---- URL canonicalization / domain discipline ------------------------
  // The crawl-side front door BEFORE any text-level dedup (RefinedWeb
  // §3.1 runs URL dedup first; CCNet shards by domain): scrape
  // variants of one page differ only in scheme case, www, default
  // ports, trailing slashes, tracking params, and fragments — exact
  // URL dedup without canonicalization misses most of them.

  /** Canonicalize a URL column (pure regex/array expressions — no
    * UDF, replayable): lowercase scheme+host, strip `www.`, drop
    * default ports (:80/:443), strip the fragment, trim trailing
    * slashes (bare host -> "/"), drop tracking params (`utm_*`,
    * `ref=`) and SORT the survivors. `domain` is the last two host
    * labels (a documented simplification of the public-suffix list —
    * right for the .com/.org bulk of a crawl). Adds `canonical_url`
    * and `domain`; per-row, no shuffle. */
  def canonicalizeUrl(df: DataFrame,
      urlCol: String = "url"): DataFrame =
    df.withColumn("_nf", regexp_replace(col(urlCol), "#.*$", ""))
      .withColumn("_scheme",
        lower(regexp_extract(col("_nf"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("_host",
        regexp_replace(regexp_replace(
          lower(regexp_extract(col("_nf"),
            "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)),
          ":(80|443)$", ""), "^www\\.", ""))
      .withColumn("_path",
        regexp_replace(regexp_extract(col("_nf"),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1), "/+$", ""))
      .withColumn("_q", expr(
        "array_join(array_sort(filter(" +
          "split(regexp_extract(_nf, '\\\\?(.*)$', 1), '&'), " +
          "p -> NOT (substring(p, 1, 4) IN ('utm_', 'ref=') OR p = ''))), " +
          "'&')"))
      .withColumn("canonical_url", concat(
        col("_scheme"), lit("://"), col("_host"),
        when(col("_path") === "", lit("/")).otherwise(col("_path")),
        when(col("_q") === "", lit(""))
          .otherwise(concat(lit("?"), col("_q")))))
      .withColumn("domain",
        regexp_extract(col("_host"), "([^.]+\\.[^.]+)$", 1))
      .drop("_nf", "_scheme", "_host", "_path", "_q")

  /** Exact dedup on the canonical URL: each canonical page keeps its
    * smallest doc_id. One hash-groupBy shuffle on the canonical
    * string — the [[dedupExact]] shape, URL-keyed. Expects
    * [[canonicalizeUrl]] output. */
  def urlDedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
      .orderBy(col("doc_id").asc)
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1).drop("rk")
  }

  /** Per-domain document cap — the anti-over-representation
    * discipline (RefinedWeb-class pipelines cap any single domain's
    * share of the corpus): keep each domain's `maxPerDomain` smallest
    * doc_ids. The window partitions by domain — domain-cardinality,
    * which a crawl keeps far below doc-cardinality; a genuinely
    * pathological mega-domain is exactly the thing this operator
    * exists to truncate. */
  def capPerDomain(df: DataFrame, maxPerDomain: Int): DataFrame = {
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("doc_id").asc)
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= maxPerDomain).drop("rk")
  }

  /** [[dedupSurvivors]] with QUALITY-AWARE survivor choice: instead
    * of the group's min doc_id, keep its LONGEST member (token count;
    * ties -> smallest doc_id) — the policy real curation pipelines
    * prefer (RefinedWeb/Gopher-class dedup keeps the best copy, not
    * the first-seen one, because near-dup clusters typically contain
    * one full document and several truncated scrapes of it).
    *
    * Scale shape: the group frame is dup-mass-sized, the token-count
    * projection joins it BY KEY (corpus never re-shuffled), and the
    * per-group argmax is a window over dup groups only. */
  def dedupSurvivorsBest(docs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val d = docs.pinned
    val groups = dupGroups(
      nearDupMinhash(d, threshold).select(col("doc_a"), col("doc_b")))
    val ntok = d.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("group_id"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    val losers = groups.join(ntok, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") > 1)
      .select(col("doc_id"))
    d.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Cross-document LINE dedup — the CCNet boilerplate stage (Wenzek
    * et al. 2020 §3.1: "we remove duplicated paragraphs/lines across
    * shards", which strips headers, nav chrome, and cookie banners
    * BEFORE document-level dedup ever runs): every line occurring in
    * at least `minDf` DISTINCT documents is removed from ALL of them;
    * surviving lines reassemble in original order. Expects multi-line
    * text (the [[extractHtml]] output shape) in `textCol`.
    *
    * Scale shape: one (line-hash, doc_id) distinct-count shuffle and
    * one hash-keyed excision join — both carry 16-byte md5 surrogates
    * of the line, never the line text (the dedupSpans discipline);
    * reassembly is a per-doc sort-free array_sort over an already
    * doc-local collect. The line-frequency table is corpus-sized and
    * shuffled by key, never broadcast. */
  def dedupLines(docs: DataFrame, minDf: Int = 2,
      textCol: String = "text"): DataFrame = {
    // one line pass feeds BOTH the df-count and the excision
    val lines = docLines(docs, textCol).pinned
    val df = lines.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    exciseByDf(docs, lines, df, minDf, textCol)
  }

  /** (doc_id, line_no, h) per line — every LINE-level frame carries
    * only this shape: the raw line text never enters a line-keyed
    * shuffle (the dedupSpans payload-width discipline). */
  private def docLines(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .select(col("doc_id"), col("line_no"), md5(col("line")).as("h"))

  /** Corpus line-frequency table (h = md5(line), df = #distinct docs
    * containing the line) — the model half of [[dedupLines]], exposed
    * so an incrementally-maintained table
    * (graft.streaming.Streams.lineDfSink) can be compared to, or
    * substituted for, the one-shot batch counting. */
  def lineDf(docs: DataFrame, textCol: String = "text"): DataFrame =
    docLines(docs, textCol)
      .select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))

  /** [[dedupLines]] against an EXPLICIT (h, df) table — the serving
    * half once a maintained table exists: new batches are scrubbed of
    * boilerplate the accumulated corpus has already seen. Lines the
    * table never saw have df 0 and are KEPT (the left join's coalesce
    * is the unseen arm, not a special case). */
  def dedupLinesWith(docs: DataFrame, dfTable: DataFrame,
      minDf: Int = 2, textCol: String = "text"): DataFrame =
    exciseByDf(docs, docLines(docs, textCol), dfTable, minDf, textCol)

  /** Shared excision tail: df-attach (left join, unseen -> 0), keep
    * decision, and the ONE doc-keyed reassembly join where the text
    * rides — surviving line indices select out of the re-split
    * array. */
  private def exciseByDf(docs: DataFrame, lines: DataFrame,
      dfTable: DataFrame, minDf: Int, textCol: String): DataFrame = {
    val kept = lines.join(dfTable, Seq("h"), "left")
      .withColumn("dfv", coalesce(col("df"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("dfv") < minDf, 1L).otherwise(0L))
          .as("n_lines_kept"),
        // collect_list skips the NULLs the when() leaves for dropped
        // lines; the sorted index list restores original order
        sort_array(collect_list(when(col("dfv") < minDf,
          col("line_no")))).as("keep"))
    docs.select(col("doc_id"), split(col(textCol), "\n").as("ls"))
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
        expr("array_join(transform(keep, i -> ls[i]), chr(10))")
          .as("text_deduped"))
  }

  private val SimhashBits = 32

  /** Hex-nibble value (0-15) of md5(word) at position j — the portable
    * per-word bit source for SimHash. */
  private def nibble(c: Column, j: Int): Column =
    conv(substring(c, j + 1, 1), 16, 10).cast("int")

  /** 32-bit SimHash (Charikar, "Similarity estimation techniques from
    * rounding algorithms", STOC 2002) per doc from term-frequency-weighted md5-nibble
    * votes: bit j is set when the sum over words of
    * (+count if nibble_j(md5(word))>=8 else -count) is > 0.
    * All-integer votes — bit-exact across engines. */
  def simhash(docs: DataFrame): DataFrame = {
    val wc = tokens(docs).groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("word")))
    val votes = (0 until SimhashBits).map(j =>
      sum(when(nibble(col("h"), j) >= 8, col("cnt"))
        .otherwise(-col("cnt"))).as(s"v$j"))
    val bits = (0 until SimhashBits).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    wc.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32-bit hash into 4 bytes — by
    * pigeonhole, any pair at Hamming distance <= 3 shares at least one
    * byte band, so banding is lossless for the <=3 cutoff — UNDER the
    * bucket cap. A byte band has only 256 values, so its buckets fill
    * linearly with the corpus (3253 members in the largest sf0.1
    * bucket — 5·10⁶ candidate pairs from ONE bucket already at bench
    * scale); [[cappedBandPairs]] routes oversized buckets to hub
    * stars, trading member-member pairs inside a mega-bucket (whose
    * hub transitively represents the cluster) for linear volume. The
    * lossless-pigeonhole guarantee therefore holds exactly for pairs
    * whose shared band bucket is within the cap. */
  def nearDupSimhash(docs: DataFrame, maxHamming: Int = 3,
      bucketCap: Int = BucketCap): DataFrame = {
    val sh = simhash(docs).pinned
    val bandCols = (0 until 4).map(b =>
      concat(lit(s"$b:"),
        (expr(s"simhash div ${1L << (8 * b)}") % 256).cast("long")))
    val bands = sh.select(col("doc_id"),
      explode(array(bandCols: _*)).as("band"))
    cappedBandPairs(bands, Seq("band"), bucketCap)
      .join(sh.select(col("doc_id").as("doc_a"),
        col("simhash").as("sim_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"),
        col("simhash").as("sim_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
  }

  /** [[bandVolumeReport]]'s SimHash twin — and unlike the minhash
    * card, this one is non-trivially populated on REAL data at the
    * production default cap: a byte band has 256 values, so its
    * buckets fill linearly with the corpus (4 capped buckets at
    * sf0.01, 63 at sf0.1) and the hub-star routing in
    * [[nearDupSimhash]] is actively bounding volume. Per band
    * position: bucket count, largest bucket, capped buckets, member
    * mass inside them, and the exact all-pairs volume the routing
    * avoided. */
  def simhashVolumeReport(docs: DataFrame,
      bucketCap: Int = BucketCap): DataFrame = {
    val sh = simhash(docs)
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band_idx"),
        (expr(s"simhash div ${1L << (8 * b)}") % 256).as("band_val")))
    sh.select(col("doc_id"),
        explode(array(bandCols: _*)).as("b"))
      .groupBy(col("b.band_idx").as("band_idx"),
        col("b.band_val").as("band_val"))
      .agg(count(lit(1)).as("bn"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bn")).as("max_bucket"),
        sum(when(col("bn") > bucketCap, 1L).otherwise(0L))
          .as("n_capped"),
        sum(when(col("bn") > bucketCap, col("bn")).otherwise(0L))
          .as("overflow_docs"),
        sum(when(col("bn") > bucketCap,
          expr("bn * (bn - 1) div 2 - (bn - 1)")).otherwise(0L))
          .as("pairs_avoided"))
  }

  /** Intra-document quality localization: the W-bigram window with
    * the highest quantized LM negative log-likelihood per doc — WHERE
    * a document goes bad, not just that it does (the trim-the-span
    * upgrade over [[lmScore]]'s drop-the-doc gate: boilerplate
    * injections, encoding garbage, and spam inserts sit in localized
    * spans that doc-level averages dilute). Per-position bigram
    * scores come from one lead() window over the token stream joined
    * to the corpus LM (vocabulary-keyed, never broadcast); span sums
    * are a doc-keyed running window of exact integers; the per-doc
    * argmax pre-trims with rank=1. Docs with fewer than `w` scored
    * bigrams have no full window and drop. */
  def worstSpan(docs: DataFrame, w: Int = 10): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    val d = docs.pinned
    val lm = lmModelOf(docBigrams(d)).pinned
    val ctx = lm.groupBy(col("lhs")).agg(sum(col("c_ab")).as("c_lhs"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val big = tokens(d)
      .withColumn("rhs", lead(col("word"), 1).over(wd))
      .where(col("rhs").isNotNull)
      .select(col("doc_id"), col("pos"), col("word").as("lhs"),
        col("rhs"))
    val scored = big.join(lm, Seq("lhs", "rhs")).join(ctx, Seq("lhs"))
      .withColumn("q",
        (length(bin(expr("c_lhs div c_ab"))) - 1).cast("long"))
    val ws = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    val sums = scored
      .withColumn("span_nll", sum(col("q")).over(ws))
      .withColumn("span_len", count(lit(1)).over(ws))
      .where(col("span_len") === w)
    val wr = Window.partitionBy(col("doc_id"))
      .orderBy(col("span_nll").desc, col("pos").asc)
    sums.withColumn("rk", row_number().over(wr))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("pos").as("span_start"),
        col("span_nll"))
  }

  /** Top-k most-similar DOCUMENTS by SimHash hamming distance — the
    * retrieval face of the [[simhash]] fingerprint (given a doc, find
    * its closest stylistic/lexical neighbors without shingle sets or
    * embeddings; 8 bytes per doc is the entire index). Serving shape
    * is the [[graft.operators.EmbeddingOps.annTopK]] one: the bounded
    * query fingerprints broadcast, the fingerprint table scans once,
    * the rank<=k window pre-trims per partition. Total-order
    * tie-break on (hamming, doc_id). */
  def simhashTopK(docs: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val sh = simhash(docs).pinned
    val q = sh.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("simhash").as("qh"))
    val scored = sh.join(broadcast(q), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        bit_count(col("qh").bitwiseXOR(col("simhash"))).as("hamming"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"), col("hamming"))
  }

  /** Corpus-trained language identification: per-(lang, word) frequency
    * profiles from the labeled corpus, then per doc the argmax over
    * langs of dot(doc term counts, lang profile) / lang size. Integer
    * dot products + one division per (doc, lang) keep the argmax
    * deterministic; ties break on lang name.
    *
    * 100 TB shape: the corpus is tokenized ONCE into per-(doc, word)
    * counts (pinned (Stage.pinned) so the profile, lang-size, and scoring
    * branches reuse it instead of re-scanning); the profile is
    * vocab-sized — on a web-scale corpus that is billions of terms, so
    * it is NEVER broadcast: profile-vs-doc scoring is a shuffle hash
    * join on `word`. Only the langs-sized (cardinality ~languages)
    * lang-size frame is broadcast. */
  def langId(docs: DataFrame): DataFrame = {
    // one tokenization pass, lang label carried through (no join back)
    val docWc = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("lang"), col("word"))
      .agg(count(lit(1)).as("c_dw"))
      .pinned
    val profile = docWc.groupBy(col("lang").as("cand_lang"), col("word"))
      .agg(sum(col("c_dw")).as("n_lw"))
    val langSize = docWc.groupBy(col("lang").as("cand_lang"))
      .agg(sum(col("c_dw")).as("n_l"))
    val scored = docWc
      .join(profile, Seq("word")) // vocab-sized: shuffle join, no hint
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(sum(col("c_dw") * col("n_lw")).as("dot"))
      .join(broadcast(langSize), Seq("cand_lang"))
      .withColumn("score", col("dot").cast("double") / col("n_l"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand_lang").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang"),
        col("cand_lang").as("pred_lang"),
        (col("cand_lang") === col("lang")).as("correct"))
  }

  /** Character-n-gram language ID — the classic n-gram-profile
    * heuristic (Cavnar & Trenkle, "N-gram-based text categorization",
    * 1994), trained on the labeled corpus like [[langId]] but over
    * character trigrams instead of words, so it works with no
    * tokenizer (CJK, agglutinative scripts). Same deterministic
    * scoring: integer profile dot / lang size, argmax with lang
    * tie-break. */
  def langIdNgram(docs: DataFrame, n: Int = 3): DataFrame = {
    // one n-gram pass, lang carried through; per-(doc, gram) counts
    // reused by the profile, lang-size, and scoring branches. The
    // trigram vocabulary is corpus-bounded, not charset-bounded (a CJK
    // corpus draws trigrams from a ~20k-ideograph alphabet — 10^8+
    // distinct grams), so the profile is shuffle-joined on `g` exactly
    // like langId's word profile; only the languages-cardinality
    // langSize frame is broadcast.
    val docGc = docs
      .select(col("doc_id"), col("lang"), split(col("text"), "").as("cs"))
      .where(size(col("cs")) >= n)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"transform(sequence(1, size(cs) - ${n - 1}), " +
          s"i -> concat_ws('', slice(cs, i, $n)))")).as("g"))
      .groupBy(col("doc_id"), col("lang"), col("g"))
      .agg(count(lit(1)).as("c_dg"))
      .pinned
    val profile = docGc.groupBy(col("lang").as("cand_lang"), col("g"))
      .agg(sum(col("c_dg")).as("n_lg"))
    val langSize = docGc.groupBy(col("lang").as("cand_lang"))
      .agg(sum(col("c_dg")).as("n_l"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand_lang").asc)
    docGc
      .join(profile, Seq("g"))
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(sum(col("c_dg") * col("n_lg")).as("dot"))
      .join(broadcast(langSize), Seq("cand_lang"))
      .withColumn("score", col("dot").cast("double") / col("n_l"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang"),
        col("cand_lang").as("pred_lang"),
        (col("cand_lang") === col("lang")).as("correct"))
  }

  /** `docs` plus the derived quality columns (counts, exact-integer
    * ratios surfaced with one division, and the P3-style
    * first-match-wins tier) — the single definition [[quality]] and
    * [[qualityFilter]] both project from, so the tier rules cannot
    * drift between the score view and the filter. Keeps every input
    * column (notably `text`), all per-row. */
  private def qualityDerived(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, w => w.isin("the", "a"))).cast("long"))
      .withColumn("avg_token_len",
        (col("n_chars") - col("n_tokens") + 1).cast("double") /
          col("n_tokens"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens"))
      .withColumn("type_token_ratio",
        col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("quality_tier",
        when(col("n_tokens") < 20, "too_short")
          .when(col("n_stopwords") * 4 > col("n_tokens"), "boilerplate")
          .when(col("n_distinct") * 5 < col("n_tokens"), "repetitive")
          .otherwise("ok"))
  }

  /** Text quality scoring: length, avg token length, stopword ratio,
    * type-token ratio — each an exact-integer ratio surfaced with one
    * division — plus a CASE quality tier (P3-style first-match-wins). */
  def quality(docs: DataFrame): DataFrame =
    qualityDerived(docs).select(
      col("doc_id"), col("lang"), col("n_chars"), col("n_tokens"),
      col("n_distinct"), col("n_stopwords"), col("avg_token_len"),
      col("stopword_ratio"), col("type_token_ratio"),
      col("quality_tier"))

  /** Most distinctive term per document: argmax over the doc's terms
    * of tf/df (term frequency over corpus document frequency — the
    * rational core of tf-idf without the log, so the score is a single
    * exact division and cross-engine argmax order is deterministic;
    * tf*log(N/df) would hinge on last-ulp libm differences). */
  /** (doc_id, word, tf, df) — the shared scaffolding of the per-doc
    * term argmaxes ([[topTerm]], [[tfidfTopTerm]]). tf is
    * pinned (Stage.pinned) so the document-frequency branch and the
    * scoring join reuse one tokenization+shuffle. df_ is the FULL
    * corpus vocabulary — never broadcast (billions of terms at 100 TB);
    * tf JOIN df_ is a shuffle hash join on `word`, and tf is already
    * keyed by (doc_id, word) so only df_ redistributes. */
  private def tfDf(docs: DataFrame): DataFrame = {
    val tf = tokens(docs).groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .pinned
    val df_ = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(df_, Seq("word"))
  }

  /** The per-doc argmax over a scored [[tfDf]] frame: top-1 by
    * (score desc, word asc) — the total order both engines replay. */
  private def argmaxTerm(scored: DataFrame,
      out: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(out: _*)
  }

  def topTerm(docs: DataFrame): DataFrame =
    argmaxTerm(
      tfDf(docs).withColumn("score",
        col("tf").cast("double") / col("df")),
      Seq(col("doc_id"), col("word").as("top_term"), col("tf"),
        col("df"), col("score")))

  /** Composed keep/drop quality gate — the Gopher-style rule stack a
    * curation pipeline actually applies: the [[quality]] tier, the
    * [[piiScan]] patterns, and a length cap, folded into one keep
    * boolean plus a comma-joined `reasons` audit column (concat_ws
    * skips the NULL branches identically in Spark and DuckDB, so the
    * reasons string is engine-portable without array comparators).
    * One per-row projection over the corpus — no shuffle, no joins —
    * and the tier/PII definitions are the shared ones, so the filter
    * can never disagree with the standalone score views. */
  def qualityFilter(docs: DataFrame, maxChars: Long = 100000L)
      : DataFrame = {
    val q = qualityDerived(docs)
      .withColumn("n_pii",
        (size(regexp_extract_all(col("text"), lit(emailRe), lit(0))) +
          size(regexp_extract_all(col("text"), lit(digitRe), lit(0))))
          .cast("long"))
      .withColumn("reasons", concat_ws(",",
        when(col("quality_tier") =!= "ok", col("quality_tier")),
        when(col("n_pii") > 0, lit("pii")),
        when(col("n_chars") > maxChars, lit("too_long"))))
    q.select(col("doc_id"), col("lang"), col("quality_tier"),
      col("n_pii"), col("n_chars"),
      (col("reasons") === "").as("keep"), col("reasons"))
  }

  /** The eight-word function-word list [[gopherRules]] checks for —
    * Gopher's "stop word" heuristic (Rae et al. 2021, A1.1: a page
    * must contain >= 2 of a small English function-word list; pages
    * without them are overwhelmingly menus, tag soup, or non-prose). */
  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021, appendix
    * A1.1), the rule-based filter battery nearly every LLM corpus
    * (MassiveText, RefinedWeb, Dolma) runs alongside model-based
    * scoring — distinct from [[qualityFilter]]'s tier/PII gate: these
    * are the published word-statistics rules, each surfaced as its own
    * flag so downstream can ablate rules individually (the data-card
    * use case) rather than get one opaque boolean.
    *
    * Rules (all exact integer arithmetic — the mean-word-length bound
    * is the cross-multiplied `lo*n_words <= n_wchars <= hi*n_words`,
    * never a float division): word count in [minWords, maxWords];
    * mean word length in [meanWlenLo, meanWlenHi]; >= minStops hits
    * from the [[GopherStops]] list. Defaults are tuned so every rule
    * is non-vacuous on the synthetic corpus (Gopher's own 50/100k/3-10
    * bounds would pass or fail ALL synthetic docs); the line-level
    * rules (bullet-start, ellipsis-end fractions) live with the
    * line-aware operators ([[extractHtml]]'s density filter,
    * [[dedupLines]]) because `documents.text` is single-line.
    *
    * Scale shape: pure per-row projection — no shuffle, no state;
    * fuses into whatever consumes it. */
  def gopherRules(docs: DataFrame, minWords: Long = 20L,
      maxWords: Long = 90L, meanWlenLo: Long = 4L, meanWlenHi: Long = 10L,
      minStops: Long = 2L): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"word bounds must satisfy 1 <= min <= max, got [$minWords, $maxWords]")
    require(meanWlenLo >= 1 && meanWlenHi >= meanWlenLo,
      "mean-word-length bounds must satisfy 1 <= lo <= hi, " +
        s"got [$meanWlenLo, $meanWlenHi]")
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_wchars",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_stops",
        size(filter(col("w"), x => x.isin(GopherStops: _*))).cast("long"))
      .withColumn("r_min_words", col("n_words") >= minWords)
      .withColumn("r_max_words", col("n_words") <= maxWords)
      .withColumn("r_mean_wlen",
        col("n_wchars") >= lit(meanWlenLo) * col("n_words") &&
          col("n_wchars") <= lit(meanWlenHi) * col("n_words"))
      .withColumn("r_stops", col("n_stops") >= minStops)
      .select(col("doc_id"), col("n_words"), col("n_wchars"),
        col("n_stops"), col("r_min_words"), col("r_max_words"),
        col("r_mean_wlen"), col("r_stops"),
        (col("r_min_words") && col("r_max_words") &&
          col("r_mean_wlen") && col("r_stops")).as("keep"))
  }

  /** Benchmark decontamination — the overlap gate run before any
    * training corpus ships: flag corpus documents whose shingle set is
    * mostly CONTAINED in a held-out benchmark's shingle set (Brown et
    * al.'s n-gram decontamination, GPT-3 appendix C, in set-containment
    * form). The benchmark collapses to its DISTINCT shingle set first —
    * per-benchmark-doc identity is irrelevant and the collapse keeps
    * the join fan-out-free — then each corpus doc counts how many of
    * its distinct shingles hit that set; containment >= num/den (exact
    * integer cross-multiplication, no float ratio) marks contamination.
    *
    * Scale shape: distinct-shingle shuffles on each side, then ONE
    * shuffle join on the 8-byte xxhash64 shingle surrogate (the
    * [[nearDupMinhash]] precedent — the benchmark side is NOT
    * broadcast: "benchmark" can be another corpus). Docs under 3
    * tokens have no shingles and are not assessable — excluded, as in
    * every shingle route. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      num: Int = 8, den: Int = 10): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"containment threshold must be a fraction in [0,1], got $num/$den")
    // distinct AFTER hashing: a raw-shingle distinct would shuffle
    // 3-token strings where the 8-byte surrogate carries the same set
    // (the nearDupMinhash discipline, same vanishing-collision note)
    val cs = shinglesRaw(corpus)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .distinct()
      .pinned // reused by the size and the overlap branch
    val bset = shinglesRaw(benchmark)
      .select(xxhash64(col("s")).as("h")).distinct()
    val sz = cs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val shared = cs.join(bset, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    sz.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated",
        col("n_shared") * den >= col("n_shingles") * num)
  }

  /** word2vec negative-sampling table (Mikolov et al. 2013 §2.2: draw
    * negatives ∝ count^(3/4) — flattening the unigram distribution so
    * frequent words don't monopolize the negatives): per word the
    * EXACT integer floor(c^(3/4)) via the [[mixTemperature]]
    * seed-and-correct trick (float POWER seeds g, the true root is
    * the largest t in g±2 with t^4 <= c^3 — both sides exact
    * DECIMAL(38,0) products, so a few-ulp libm difference between
    * engines cannot flip the value), and the word's draw probability
    * as exact parts-per-million of the whole vocabulary's mass. Top
    * `topV` rows by (count desc, word) via TakeOrderedAndProject.
    * Boundary: c^3 must fit DECIMAL(38,0) — per-word counts to
    * ~2.1e12, beyond any single word's share of a 100 TB corpus. */
  def negSamplingTable(docs: DataFrame, topV: Int = 50): DataFrame = {
    require(topV >= 1, s"topV must be >= 1, got $topV")
    val wc = tokens(docs).groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
      .withColumn("g",
        expr("CAST(POWER(CAST(c AS DOUBLE), 0.75D) AS BIGINT)"))
      .withColumn("w34", expr(
        "array_max(filter(array(g - 2, g - 1, g, g + 1, g + 2), " +
          "t -> t >= 1 AND CAST(t AS DECIMAL(38,0)) * t * t * t" +
          " <= CAST(c AS DECIMAL(38,0)) * c * c))"))
      .pinned // total mass + the ranked output, one vocab pass
    val tot = wc.agg(sum(col("w34")).as("tot"))
    wc.crossJoin(broadcast(tot)) // 1-row scalar frame
      .select(col("word"), col("c"), col("w34"),
        expr("w34 * 1000000 div tot").as("ppm"))
      .orderBy(col("c").desc, col("word").asc)
      .limit(topV)
  }

  /** Token counting: whitespace tokens, regex word-ish tokens, and a
    * BPE-style length/4 estimate (integer ceil). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
        .cast("long").as("word_tokens"),
      expr("(length(text) + 3) div 4").cast("long").as("bpe_est_tokens"))

  /** Polynomial rolling hash (Rabin-Karp) over the document's
    * characters: h = fold(h*B + code(c)) mod P with B=131, P=2^31-1 —
    * pure integer arithmetic, identical in any engine with a list fold.
    * The per-prefix form of this hash is what a winnowing fingerprinter
    * slides over; the full-document value is a compact content id that,
    * unlike md5, can be updated incrementally when documents are
    * chunked.
    *
    * Portability boundary: the fold is defined over BMP code points.
    * Spark's ascii() returns 0 for supplementary-plane characters
    * (emoji etc.) where DuckDB returns the code point, so cross-engine
    * parity for this hash requires normalizing or stripping astral
    * characters upstream. ([[winnowing]] now hashes true code points
    * via the custom kgram_hashes expression, so it has no such
    * boundary beyond malformed lone surrogates.) */
  def rollingHash(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr("aggregate(split(text, ''), 0L, " +
        "(acc, c) -> (acc * 131 + ascii(c)) % 2147483647)")
        .as("rolling_hash"),
      length(col("text")).cast("long").as("n_chars"))

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing:
    * local algorithms for document fingerprinting", SIGMOD 2003): hash every k-gram of characters
    * with the rolling polynomial, then keep the minimum hash of each
    * sliding window of w consecutive k-gram hashes; the distinct kept
    * hashes are the document's fingerprint set. Guarantees every match
    * of length >= w+k-1 shares a fingerprint.
    *
    * Shape note: the k-gram hashes come from the custom
    * [[graft.plans.KgramRollingHashes]] expression — ONE O(n) sliding
    * pass per document in compiled code. The all-arrays built-in form
    * (`transform(sequence(...), i -> aggregate(slice(cs,i,k), ...))`)
    * is O(n*k) interpreted lambda evaluation, and worse, Catalyst's
    * CollapseProject can inline the hash array into every window
    * lambda, degrading to O(n^2*k). Exploding the hashes to rows and
    * taking a sliding window min streams the winnow. */
  def winnowing(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    // Pre-filter on length(text) (= code-point count — cheap, no
    // hashing): filtering on size(khs) instead would let Catalyst push
    // the filter below the projection and evaluate the O(n) hash
    // expression twice per doc. The generator input is the
    // call_function itself, so the hash array is computed exactly once
    // per row inside Generate; m derives from length, not from the
    // array.
    val kgrams = docs
      .where(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        (length(col("text")) - lit(k - 1)).as("m"),
        posexplode(call_function("kgram_hashes", col("text"), lit(k)))
          .as(Seq("j0", "kh")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("j0"))
      .rowsBetween(0, w - 1)
    kgrams
      .withColumn("wmin", min(col("kh")).over(win))
      // valid window starts: 0-based j0 in [0, m - w]
      .where(col("j0") <= col("m") - lit(w))
      .select(col("doc_id"), col("wmin").as("fingerprint"))
      .distinct()
  }

  /** Winnowing-based near-duplicate pairs — the third independent
    * near-dup route (after MinHash+LSH and SimHash banding), built on
    * the [[winnowing]] fingerprint sets: candidate pairs share at
    * least `minShared` fingerprints, then exact Jaccard over the
    * fingerprint sets keeps pairs at >= `threshold`. By the winnowing
    * guarantee, any shared substring of length >= w+k-1 yields a
    * shared fingerprint, so candidates surface on local overlap even
    * when global shingle-Jaccard is low — the property MinHash cannot
    * give.
    *
    * Scale design: fingerprints appearing in more than `maxDf` docs
    * are dropped BEFORE pairing (the set-similarity analog of
    * stop-word removal) — a boilerplate fingerprint shared by 10^6
    * docs would otherwise make its bucket's pair space quadratic.
    * The df cap is part of the operator's semantics (sizes and
    * intersections are over the capped sets) so the oracle mirrors it
    * exactly; like prefix blocking in [[nearDupNgramJaccard]], it is
    * a documented precision/recall trade, not silent loss. */
  def nearDupWinnowing(docs: DataFrame, k: Int = 8, w: Int = 4,
      minShared: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 50): DataFrame = {
    val fp = winnowing(docs, k, w).pinned
    val dfc = fp.groupBy(col("fingerprint")).agg(count(lit(1)).as("df"))
    val fpk = fp.join(dfc.where(col("df") <= maxDf), Seq("fingerprint"))
      .select(col("doc_id"), col("fingerprint").as("h"))
      .pinned
    // candidate generation and intersection are ONE fused self-join
    // here (a shared fingerprint IS the candidate signal), so the
    // shared tail starts at the Jaccard verification
    val inter = fpk.as("a")
      .join(fpk.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minShared)
    jaccardFromInter(fpk, inter, threshold)
  }

  /** PII scan + redaction — the scrubbing pass a training-data
    * pipeline runs before anything else: count email-like and
    * long-digit-run (phone/id-like) matches per doc and produce the
    * redacted text (surfaced as its md5 so the gate row stays
    * compact). Patterns are deliberately conservative regex that
    * evaluates identically under Java regex and RE2 (no backrefs, no
    * lookaround), so the oracle matches byte-for-byte. Per-row
    * expressions — no shuffle, no state. */
  /** Conservative PII patterns shared by [[piiScan]] and
    * [[qualityFilter]]: identical under Java regex and RE2 (no
    * backrefs, no lookaround), so oracles match byte-for-byte. */
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val digitRe = "[0-9][0-9 -]{6,}[0-9]"

  def piiScan(docs: DataFrame): DataFrame = {
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(digitRe), lit(0)))
        .cast("long").as("n_digit_runs"),
      md5(regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        digitRe, "<NUMBER>")).as("redacted_hash"))
  }

  /** The shared content-independent assignment primitive of the
    * split/sampling family ([[trainValTestSplit]],
    * [[sampleStratified]], [[mixRebalance]]): first 4 hex nibbles of
    * md5(prefix || doc_id), mod `mod`. Distinct prefixes keep the
    * family's decisions mutually independent. Documented bias (once,
    * here): 65536 % mod != 0 for mod 10/1000, so low buckets are
    * over-represented by 1/65536 each — negligible for curation, and
    * kept because the 4-nibble prefix is cheap and engine-portable. */
  private def saltBucket(prefix: String, mod: Long): Column =
    saltBucketOf(prefix, col("doc_id"), mod)

  /** [[saltBucket]] generalized to an arbitrary key column — the
    * group-keyed split ([[groupSplit]]) hashes the dedup GROUP id, not
    * the doc id, so all members of a near-dup group draw the same
    * bucket. Same arithmetic, same documented 1/65536 bias. */
  private def saltBucketOf(prefix: String, key: Column, mod: Long): Column =
    conv(substring(md5(concat(lit(prefix),
      key.cast("string"))), 1, 4), 16, 10).cast("long") % mod

  /** 8/1/1 bucket → split-name mapping shared by [[trainValTestSplit]]
    * and [[groupSplit]] so the two splits differ ONLY in what keys the
    * hash. */
  private def splitOf(bucket: Column): Column =
    when(bucket <= 7, "train")
      .when(bucket === 8, "val")
      .otherwise("test")

  /** Per-source corpus "data card" — the release artifact a training
    * pipeline publishes before a run (what went in, how much, how
    * diverse, how degenerate): document and token mass, language
    * diversity, length extremes, the short-document fraction. All
    * counts are exact integers; the mean is the single final IEEE
    * division and the short fraction is exact permille. One aggregate
    * pass keyed by source — output is sources-cardinality. */
  def corpusReport(docs: DataFrame, shortTokens: Int = 5): DataFrame =
    docs.select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(when(col("n_tokens") < shortTokens, 1L).otherwise(0L))
          .as("n_short"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("total_tokens"), col("total_chars"), col("min_tokens"),
        col("max_tokens"),
        (col("total_tokens").cast("double") / col("n_docs"))
          .as("avg_tokens"),
        expr("n_short * 1000 div n_docs").as("short_permille"))

  /** Deterministic train/val/test split (8/1/1 by default): every doc
    * is assigned by a content-independent hash of its id — the split is
    * reproducible across runs, machines, and engines (md5 is
    * bit-identical everywhere), requires no shuffle or state, and a
    * re-run over a grown corpus never reassigns an existing doc. This
    * is how a training pipeline splits at 100 TB: a per-row expression,
    * not a global sample(). [[saltBucket]]'s documented 1/65536 bias
    * makes the split ~8.0002/1/0.9999, not exactly 8/1/1. */
  def trainValTestSplit(docs: DataFrame): DataFrame = {
    val bucket = saltBucket("", 10)
    docs.select(
      col("doc_id"),
      bucket.as("bucket"),
      splitOf(bucket).as("split"))
  }

  /** Leakage-safe train/val/test split: the assignment hash is keyed
    * by the NEAR-DUP GROUP, not the doc id, so every member of a
    * duplicate cluster lands in the same split — a doc-id-keyed split
    * puts near-copies of one page on both sides of the train/eval
    * fence and the eval set silently measures memorization (the
    * failure Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better" §6 quantifies: dup-driven eval overlap).
    * Docs outside any dup group key by their own id under the SAME
    * prefix, so growing the corpus never reassigns them.
    *
    * Scale shape: [[nearDupMinhash]] + [[dupGroups]] touch only the
    * banded-candidate subgraph (duplication-mass-sized, never the
    * corpus); the one corpus-sized operation is a left join on doc_id
    * against that small group table, then a per-row hash. */
  def groupSplit(docs: DataFrame, threshold: Double = 0.7): DataFrame = {
    val groups = dupGroups(
      nearDupMinhash(docs, threshold).select(col("doc_a"), col("doc_b")))
    val bucket = saltBucketOf("gsp:", col("group_id"), 10)
    docs.join(groups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
      .select(col("doc_id"), col("group_id"), bucket.as("bucket"),
        splitOf(bucket).as("split"))
  }

  /** Split-leakage audit — the one-row report that justifies
    * [[groupSplit]]: over the near-dup groups, how many straddle a
    * doc-id-keyed split (leaky: a near-copy of a training doc sits in
    * val/test) vs the group-keyed split (structurally zero, but
    * COMPUTED here, not assumed — the report is the regression test).
    * Only group members are touched ([[dupGroups]] output, never the
    * corpus); two aggregates end at one row. */
  def splitLeakage(docs: DataFrame, threshold: Double = 0.7): DataFrame = {
    val groups = dupGroups(
      nearDupMinhash(docs, threshold).select(col("doc_a"), col("doc_b")))
    val perGroup = groups
      .select(col("doc_id"), col("group_id"),
        splitOf(saltBucketOf("", col("doc_id"), 10)).as("naive_split"),
        splitOf(saltBucketOf("gsp:", col("group_id"), 10))
          .as("group_split"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("naive_split")).as("n_naive_splits"),
        countDistinct(col("group_split")).as("n_group_splits"))
    perGroup.agg(
      count(lit(1)).as("n_groups"),
      sum(col("n_docs")).as("n_docs_in_groups"),
      sum(when(col("n_naive_splits") > 1, 1L).otherwise(0L))
        .as("n_leaky_naive"),
      sum(when(col("n_group_splits") > 1, 1L).otherwise(0L))
        .as("n_leaky_grouped"))
  }

  /** Exact per-language length quantiles (p50/p90/p99 of n_chars) via
    * rank selection: rank every doc within its language (total-order
    * tie-break on doc_id), pick the value at the integer quantile index
    * ceil(q*n) computed in EXACT integer arithmetic ((q_num*n + q_den-1
    * adjusted) div q_den) so both engines select the identical row —
    * a float ceil(0.9*n) could straddle an ulp. The distribution shape
    * of a training corpus (length percentiles per language) is a
    * routine curation query.
    *
    * Scale note: rank selection sorts within each language partition —
    * exact but shuffle-heavy at 100 TB; the production default is the
    * approx_percentile sketch (engine-specific estimates, hence no
    * oracle), with this exact form as the verification special case —
    * the same exact/sketch pairing as an_distinct_by_type vs
    * an_approx_distinct. */
  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val ranked = docs.select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    ranked.join(counts, Seq("lang"))
      .groupBy(col("lang"), col("n_docs"))
      .agg(
        max(when(col("rn") === expr("(n_docs + 1) div 2"),
          col("n_chars"))).as("p50_chars"),
        max(when(col("rn") === expr("(9 * n_docs + 9) div 10"),
          col("n_chars"))).as("p90_chars"),
        max(when(col("rn") === expr("(99 * n_docs + 99) div 100"),
          col("n_chars"))).as("p99_chars"))
  }

  /** Vocabulary heavy hitters via the Misra-Gries / space-saving
    * frequent-items sketch (Spark's stat.freqItems) — the third
    * classic sketch next to approx-distinct (an_approx_distinct) and
    * approx-quantiles ([[lengthQuantilesApprox]]), and the scale
    * route to "which tokens dominate the corpus" without a full
    * vocabulary shuffle: one pass, per-partition counter maps of
    * bounded size 1/support merged associatively.
    *
    * The sketch's membership list over-approximates (false positives
    * allowed) but GUARANTEES every item with frequency > support*n is
    * present, so the driver-checked contract is that deterministic
    * half: every exact heavy hitter must appear in the sketch set.
    * Emits one row (n_tokens, n_true_hh, all_found); the oracle
    * recomputes the exact side and pins all_found = true. */
  def heavyHitters(docs: DataFrame, support: Double = 0.01): DataFrame = {
    val tok = docs.select(
      explode(split(col("text"), " ")).as("word"))
    val sketch = tok.stat.freqItems(Array("word"), support)
      .select(col("word_freqItems").as("sketch_set"))
    val tot = tok.agg(count(lit(1)).as("n_tokens"))
    val hh = tok.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(tot)) // 1-row scalar frame
      .where(col("c") > lit(support) * col("n_tokens"))
    hh.crossJoin(broadcast(sketch)) // 1-row sketch frame
      .agg(count(lit(1)).as("n_true_hh"),
        coalesce(min(array_contains(col("sketch_set"), col("word"))),
          lit(true)).as("all_found"))
      .crossJoin(broadcast(tot)) // re-attach the scalar total
      .select(col("n_tokens"), col("n_true_hh"), col("all_found"))
  }

  /** Sketch-based per-language length quantiles — the production
    * default that [[lengthQuantiles]]'s scale note points to: one
    * percentile_approx (Greenwald-Khanna) pass over the corpus, no
    * per-language sort. The sketch's estimate is engine-specific, so
    * the driver-checked contract is the ERROR BOUND (the
    * an_approx_distinct pattern): percentile_approx guarantees the
    * returned value is a corpus element whose rank is near the target
    * rank (single-summary error eps = 1/accuracy), and the emitted
    * boolean verifies that — the returned value's rank interval
    * [r_lt+1, r_le] must intersect
    * [floor((p-slack)*n), ceil((p+slack)*n)] with slack = 2*eps: the
    * 2x absorbs merge-time error accumulation (Greenwald-Khanna
    * summaries merged across partitions bound looser than one
    * summary). The oracle recomputes (lang, pct, n_docs) and pins
    * within_bound = true.
    *
    * Scale shape: one sketch aggregation shuffle keyed lang, then the
    * languages-cardinality estimate frame is broadcast back for the
    * one-pass rank count — no sort, no per-language window. */
  def lengthQuantilesApprox(docs: DataFrame,
      accuracy: Int = 10000): DataFrame = {
    val pcts = Seq(0.5, 0.9, 0.99)
    val pctArr = array(pcts.map(lit): _*)
    val eps = 2.0 / accuracy // 2x single-summary error: merge slack
    val approx = docs.groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"), pctArr, lit(accuracy))
          .as("vs"),
        count(lit(1)).as("n_docs"))
      .select(col("lang"), col("n_docs"),
        posexplode(col("vs")).as(Seq("pi", "v")))
      .select(col("lang"), col("n_docs"),
        element_at(pctArr, col("pi") + 1).as("pct"), col("v"))
    docs.select(col("lang"), col("n_chars"))
      .join(broadcast(approx), Seq("lang"))
      .groupBy(col("lang"), col("n_docs"), col("pct"), col("v"))
      .agg(
        sum(when(col("n_chars") < col("v"), 1L).otherwise(0L)).as("r_lt"),
        sum(when(col("n_chars") <= col("v"), 1L).otherwise(0L)).as("r_le"))
      .select(col("lang"), col("pct"), col("n_docs"),
        ((col("r_lt") + 1 <=
            ceil((col("pct") + lit(eps)) * col("n_docs"))) &&
          (col("r_le") >=
            floor((col("pct") - lit(eps)) * col("n_docs"))))
          .as("within_bound"))
  }

  /** Deterministic stratified (per-language) downsampling — the
    * corpus-balancing pass of a training pipeline: cap the dominant
    * strata, keep the rest. Every doc is kept iff its
    * content-independent hash bucket falls below its stratum's
    * keep-rate in permille: md5 over a salted doc_id (the "strat:"
    * salt keeps the decision independent of [[trainValTestSplit]]'s
    * buckets), first 4 hex nibbles mod 1000 ([[saltBucket]], with its
    * documented 1/65536 low-bucket bias). Like the split this is a
    * pure per-row predicate — reproducible across runs/machines/
    * engines, no shuffle, no global sample(), and a re-run over a
    * grown corpus never flips an existing doc's decision.
    *
    * `rates` is strata-cardinality (languages), joined as a broadcast
    * literal frame — the policy-sanctioned constant broadcast. */
  def sampleStratified(docs: DataFrame, rates: Seq[(String, Long)],
      defaultPermille: Long = 1000L): DataFrame = {
    require((defaultPermille +: rates.map(_._2))
        .forall(p => p >= 0 && p <= 1000),
      "keep rates are permille values in [0, 1000]")
    // a duplicated stratum would FAN OUT the left join and silently
    // duplicate that stratum's kept documents — refuse instead
    require(rates.map(_._1).distinct.size == rates.size,
      s"duplicate stratum in rates: ${rates.map(_._1).diff(
        rates.map(_._1).distinct).distinct.mkString(", ")}")
    val s = docs.sparkSession
    import s.implicits._
    val r = broadcast(rates.toDF("lang", "keep_permille"))
    val bucket = saltBucket("strat:", 1000)
    docs.join(r, Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), bucket.as("bucket"),
        coalesce(col("keep_permille"), lit(defaultPermille))
          .as("keep_permille"))
      .where(col("bucket") < col("keep_permille"))
  }

  /** Per-document top tf-idf term. [[topTerm]] ranks by the pure
    * rational tf/df; this is the log-damped classic, made
    * cross-engine-deterministic by QUANTIZING the idf to
    * floor(log2(N div df)) — an exact integer in any engine
    * (the bit length of an integer division, no libm log whose last
    * ulp could flip an argmax). Score = tf * idf_q stays in exact
    * BIGINT arithmetic end to end; ties (score, then term) break by
    * total order.
    *
    * Scale shape is [[topTerm]]'s (the shared [[tfDf]]/[[argmaxTerm]]
    * scaffolding): ONE tokenization shuffle reused by both branches,
    * df shuffle-joined on `word` (the full vocabulary is never
    * broadcast), N as a 1-row broadcast scalar. */
  def tfidfTopTerm(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    argmaxTerm(
      tfDf(docs)
        .crossJoin(broadcast(n)) // 1-row scalar frame
        .withColumn("idf_q",
          (length(bin(expr("n_docs div df"))) - 1).cast("long"))
        .withColumn("score", col("tf") * col("idf_q")),
      Seq(col("doc_id"), col("word").as("top_term"), col("tf"),
        col("df"), col("idf_q"), col("score")))
  }

  /** The unified curation pipeline — the whole front-to-back chain a
    * web corpus runs before training, composed from the engine's own
    * operators with NOTHING recomputed from the raw input between
    * stages: each stage's survivor frame is pinned (Stage.pinned)
    * once and feeds both its own filter and the next stage, so the
    * corpus is read once and every later stage touches only
    * survivors. Input is the raw MARKUP frame (doc_id, source, lang,
    * html); the stages are
    *
    *  1. [[extractHtml]] — markup -> text (kept lines re-join with
    *     spaces, keeping the token stream whitespace-clean);
    *  2. [[dedupExact]] — smallest doc_id per content hash survives;
    *  3. [[langId]] — keep docs whose corpus-profile prediction
    *     matches their recorded language (mislabel drop);
    *  4. [[qualityFilter]] — keep only `keep` docs (tier/PII/length);
    *  5. [[dedupSpans]] — cross-doc duplicated runs of `spanK` tokens
    *     excise; fully-duplicated docs drop;
    *  6. [[lmScore]] — keep docs whose quantized bigram NLL stays at
    *     or below `lmKeepMilli` per mille per bigram (the CCNet
    *     perplexity gate), compared in exact integers;
    *  7. [[mixTemperature]] — the mT5/XLM-R source-mixing subsample;
    *  8. [[seqPack]] — survivors pack into fixed-budget sequences.
    *
    * Returns [[seqPack]]'s frame (doc_id, lang, shard, n_tokens,
    * pack_id, pack_fill) over the curated corpus. Every stage is the
    * operator already oracle-checked in isolation; the e2e oracle
    * replays the full chain, pinning the COMPOSITION (column
    * contracts between stages, filter arms, survivor joins). */
  def curate(raw: DataFrame, spanK: Int = 8, lmKeepMilli: Long = 3950L,
      maxChars: Long = 100000L, packBudget: Long = 512L,
      packShard: Long = 200L,
      ledgerPath: Option[String] = None): DataFrame =
    seqPack(
      curateChain(raw, spanK, lmKeepMilli, maxChars,
        ledgerPath = ledgerPath).last._2,
      packBudget, packShard)

  /** The per-stage curation funnel — the observability artifact a
    * production curation run publishes next to its output (the
    * [[corpusReport]] discipline applied to the pipeline itself):
    * surviving document count and exact token mass after every stage
    * of [[curate]]. One bounded row per stage; each count is one
    * aggregate over that stage's pinned survivor frame, so the report
    * costs the chain nothing it had not already computed. */
  def curateReport(raw: DataFrame, spanK: Int = 8,
      lmKeepMilli: Long = 3950L, maxChars: Long = 100000L,
      ledgerPath: Option[String] = None): DataFrame =
    curateChain(raw, spanK, lmKeepMilli, maxChars,
      ledgerPath = ledgerPath).zipWithIndex
      .map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(size(split(col("text"), " ")).cast("long")),
            lit(0L)).as("n_tokens"))
          .select(lit(i + 1L).as("stage_id"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      }
      .reduce(_ unionByName _)

  /** The shared stage chain behind [[curate]]/[[curateReport]]: each
    * stage's survivor frame pinned once, feeding both its own filter
    * and the next stage. `pin` is the stage-boundary materialization
    * (checkpoint by default); the composed-chain scale probe passes
    * identity so the six inter-stage doc_id joins stay in ONE
    * walkable plan instead of disappearing behind checkpoint scans. */
  private[graft] def curateChain(rawIn: DataFrame, spanK: Int,
      lmKeepMilli: Long, maxChars: Long,
      pin: DataFrame => DataFrame = _.pinned,
      ledgerPath: Option[String] = None): Seq[(String, DataFrame)] = {
    // the forget-ledger front door composes FIRST when a ledger is
    // supplied: a forgotten doc must be dropped before any stage (or
    // any downstream index/state fed from the survivors) sees it —
    // without this hook the guard was left to the caller, which is
    // exactly how re-admission bugs happen
    val raw = ledgerPath.fold(rawIn)(Forget.forgottenFilter(rawIn, _))
    val meta = raw.select(col("doc_id"), col("source"), col("lang"))
    val d1 = extractHtml(raw)
      .select(col("doc_id"),
        regexp_replace(col("text_extracted"), "\n", " ").as("text"))
      .join(meta, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val d1p = pin(d1)
    val d2 = pin(d1p.join(dedupExact(d1p)
      .select(col("kept_doc_id").as("doc_id")), Seq("doc_id")))
    val d3 = pin(d2.join(langId(d2).where(col("correct"))
      .select(col("doc_id")), Seq("doc_id")))
    val d4 = pin(d3.join(qualityFilter(d3, maxChars).where(col("keep"))
      .select(col("doc_id")), Seq("doc_id")))
    val d5 = pin(d4.drop("text")
      .join(dedupSpans(d4, spanK).where(col("text_clean") =!= "")
        .select(col("doc_id"), col("text_clean").as("text")),
        Seq("doc_id")))
    val d6 = pin(d5.join(lmScore(d5)
      .where(col("nll_sum") * 1000 <= col("n_bigrams") * lmKeepMilli)
      .select(col("doc_id")), Seq("doc_id")))
    val d7 = pin(d6.join(mixTemperature(d6).select(col("doc_id")),
      Seq("doc_id")))
    Seq("extract" -> d1p, "dedup_exact" -> d2, "langid" -> d3,
      "quality" -> d4, "span_excise" -> d5, "lm_gate" -> d6,
      "mix" -> d7)
  }

  case class PackIn(doc_id: Long, lang: String, shard: Long,
      n_tokens: Long)
  case class PackOut(doc_id: Long, lang: String, shard: Long,
      n_tokens: Long, pack_id: Long, pack_fill: Long)

  /** Greedy contiguous sequence packing — the step that turns a
    * curated corpus into fixed-budget training sequences: walk each
    * stratum's documents in doc_id order and open a new pack whenever
    * adding the next document would exceed `maxTokens` (a document
    * longer than the budget gets a pack of its own). The recurrence is
    * inherently sequential, so it runs per GROUP over a sorted
    * spill-able iterator (flatMapSortedGroups) with O(1) state — and
    * the group key is (lang, doc_id div shardDocs), not just lang:
    * sharding bounds every sequential walk to `shardDocs` documents,
    * which is what keeps the operator parallel at 100 TB (the cost is
    * at most one underfull pack per shard boundary — a documented
    * packing-efficiency trade, not silent loss). Pack ids are scoped
    * per (lang, shard), and `pack_fill` is the running token count
    * within the pack after placing the row's document. */
  def seqPack(docs: DataFrame, maxTokens: Long = 512,
      shardDocs: Long = 200): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(shardDocs > 0, s"shardDocs must be positive, got $shardDocs")
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select(col("doc_id"), col("lang"),
        expr(s"doc_id div $shardDocs").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[PackIn]
    toks.groupByKey(d => (d.lang, d.shard))
      .flatMapSortedGroups(col("doc_id").asc) { (_, it) =>
        var pack = 0L
        var fill = 0L
        it.map { d =>
          if (fill > 0 && fill + d.n_tokens > maxTokens) {
            pack += 1
            fill = d.n_tokens
          } else fill += d.n_tokens
          PackOut(d.doc_id, d.lang, d.shard, d.n_tokens, pack, fill)
        }
      }.toDF()
  }

  /** Packing-efficiency data card over [[seqPack]] — the artifact that
    * says what a chosen token budget COSTS: per language, how many
    * packed sequences the corpus yields, how full they are (exact
    * permille of capacity), and how many documents exceed the budget
    * outright (an oversized doc occupies its own pack with
    * fill > budget, so fill_permille can exceed 1000 where they
    * dominate — surfaced rather than clamped). Two aggregates over
    * the pack assignment; output is language-cardinality. */
  def packReport(docs: DataFrame, maxTokens: Long = 512,
      shardDocs: Long = 200): DataFrame = {
    val perShard = seqPack(docs, maxTokens, shardDocs)
      .groupBy(col("lang"), col("shard"))
      .agg((max(col("pack_id")) + 1L).as("n_packs"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("n_tokens") > maxTokens, 1L).otherwise(0L))
          .as("n_oversize"))
    perShard.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_packs")).as("n_packs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_oversize")).as("n_oversize"))
      .select(col("lang"), col("n_docs"), col("n_packs"),
        col("total_tokens"), col("n_oversize"),
        (col("n_packs") * maxTokens).as("capacity"),
        expr(s"total_tokens * 1000 div (n_packs * $maxTokens)")
          .as("fill_permille"))
  }

  /** Duplicate-cluster size histogram — the dedup data card: how many
    * near-dup clusters exist at each size (size 2 pairs vs the
    * long-tail scrape families that dominate removal mass). Group
    * membership from [[dupGroups]] (duplication-mass-sized, never the
    * corpus); two aggregates end at histogram cardinality. */
  def dupClusterStats(docs: DataFrame,
      threshold: Double = 0.7): DataFrame =
    dupGroups(
        nearDupMinhash(docs, threshold).select(col("doc_a"), col("doc_b")))
      .groupBy(col("group_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Gopher-style repetition signals (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021,
    * §A.1.1): the repetition family of quality filters — a document
    * dominated by one repeated n-gram, or whose n-gram stream is mostly
    * repeats, is boilerplate/spam. Token-level because this corpus has
    * no line structure (the reference signals also include per-line
    * duplicates; lines here would be vacuous — every doc is one line).
    * Emitted per doc (>= 3 tokens, the shingle domain):
    *  - `top_bigram_frac`  = occurrences of the most frequent bigram /
    *    total bigrams (Gopher's "fraction in most common n-gram");
    *  - `dup_trigram_frac` = (total - distinct) trigrams / total
    *    (Gopher's "fraction in duplicate n-grams").
    * All counts are exact integers; each fraction is ONE final IEEE
    * division, so both engines emit bit-identical doubles.
    *
    * Scale shape: bigrams and trigrams are tagged and exploded in ONE
    * per-row pass, so the whole operator is a single (doc_id, tag,
    * gram) count shuffle (map-side combined) re-aggregated per doc
    * with conditional aggregates — half the shuffle volume of running
    * the two gram sizes as separate passes. Nothing is broadcast,
    * nothing is corpus-quadratic. */
  def repetition(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "concat(" +
          "transform(sequence(0, size(w) - 2), " +
          "  i -> struct(1 AS tag, concat_ws(' ', w[i], w[i+1]) AS g)), " +
          "transform(sequence(0, size(w) - 3), " +
          "  i -> struct(2 AS tag, concat_ws(' ', w[i], w[i+1], w[i+2]) AS g))" +
          ")")).as("tg"))
      .select(col("doc_id"), col("tg.tag").as("tag"), col("tg.g").as("g"))
    grams.groupBy(col("doc_id"), col("tag"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("tag") === 1, col("c"))).as("n_bigrams"),
        max(when(col("tag") === 1, col("c"))).as("top_bigram_c"),
        sum(when(col("tag") === 2, col("c"))).as("n_trigrams"),
        count(when(col("tag") === 2, lit(1))).as("n_distinct_trigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_c"),
        (col("top_bigram_c").cast("double") / col("n_bigrams"))
          .as("top_bigram_frac"),
        col("n_trigrams"), col("n_distinct_trigrams"),
        ((col("n_trigrams") - col("n_distinct_trigrams")).cast("double")
          / col("n_trigrams")).as("dup_trigram_frac"))
  }

  /** Cross-document duplicated-span fraction — the substring-level
    * dedup signal (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", 2022: the motivation for ExactSubstr
    * dedup is that much duplication is partial, not whole-document).
    * The suffix-array machinery of ExactSubstr is replaced by its
    * distributed proxy: a trigram occurrence is "duplicated" iff its
    * shingle appears in >= 2 distinct documents, and each doc reports
    * the fraction of its trigram occurrences that are duplicated.
    * High-`dup_frac` docs are the ones whose content is largely copied
    * from elsewhere in the corpus — candidates for span-level removal
    * where whole-doc dedup ([[nearDupMinhash]]) would miss them.
    *
    * Scale shape: the per-(doc, shingle-hash) counts are aggregated
    * once and pinned (Stage.pinned) for their three consumers;
    * document frequency is a second aggregate of that
    * (already-distinct) frame, shuffle-joined back on the 8-byte
    * surrogate — the vocabulary-sized frame is never broadcast (the
    * [[langId]] rule) and no exchange carries raw shingle text.
    * Counts are exact longs; `dup_frac` is one final IEEE division. */
  def dupNgramSpans(docs: DataFrame): DataFrame = {
    // one (doc_id, h) count shuffle, reused by total / df / dup
    // branches. The key is the 8-byte xxhash64 SURROGATE of the
    // shingle, not the raw trigram string (the dedupSpans payload
    // discipline; collisions merge counts with probability
    // ~n_shingles^2/2^64 — vanishing, and the oracle's exact counts
    // would catch one loudly)
    val occ = shinglesRaw(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("c"))
      .pinned
    val dfq = occ.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val tot = occ.groupBy(col("doc_id")).agg(sum(col("c")).as("n_grams"))
    val dup = occ.join(dfq.where(col("nd") >= 2), Seq("h"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n_dup_grams"))
    tot.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        (coalesce(col("n_dup_grams"), lit(0L)).cast("double")
          / col("n_grams")).as("dup_frac"))
  }

  /** Exact duplicated-SUBSTRING removal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * ExactSubstr): where [[dupNgramSpans]] only MEASURES cross-doc
    * span duplication, this operator excises it, emitting each doc
    * with every token covered by a cross-document duplicated run of
    * `minTokens` tokens removed (the remaining tokens re-join in
    * order; a mid-doc excision splits the doc into segments, counted
    * in `n_segments`). The reference paper's suffix-array formulation
    * is a single-machine construction; the distributed rendering is
    * shingle-based: a k-token window occurrence (k = minTokens) is
    * duplicated iff its shingle occurs in >= 2 documents, and — the
    * paper's keep-one-copy rule made deterministic — the smallest
    * doc_id containing a shingle keeps ALL its occurrences of it,
    * every other doc excises them. A doc below k tokens has no
    * windows and passes through unchanged; a fully-duplicated doc
    * collapses to the empty string with n_segments = 0.
    *
    * Scale shape: one per-row window projection (no shuffle) → one
    * (shingle) aggregate for {document frequency, canonical doc} →
    * one keyed join back on the shingle — the shingle-stats frame is
    * corpus-vocabulary-sized and is NEVER broadcast (the [[langId]]
    * rule). The shuffle KEY is a 128-bit digest of the k-token
    * window, not the window text itself: a raw k-token string (k
    * defaults to 50) would be an O(k) write amplification on a
    * token-cardinality frame — petabytes of shuffle at 100 TB input —
    * while md5 carries 16 bytes per occurrence and its collision
    * probability over even 10^15 distinct shingles is < 10^-8, far
    * below any data-corruption floor. The raw string is dropped in
    * the same projection that computes the digest and never reaches
    * an exchange. Covered positions explode k rows per EXCISED occurrence
    * only (duplication-mass-sized, not corpus-sized), distinct on
    * (doc_id, pos), anti-join against the token table. The rebuild
    * groups per doc_id — collect_list is bounded by a single
    * document's length, the per-doc batch shape (the
    * [[seqPack]]/[[chunk]] discipline), never corpus-scale. Counts
    * are exact longs; `removed_frac` is one final IEEE division. */
  def dedupSpans(docs: DataFrame, minTokens: Int = 50): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val k = minTokens
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    // every k-token window with its 0-based start position; the
    // sequence is CASE-guarded like every sequence(0, size-k) here
    // (it DESCENDS when stop < start, and ANSI mode throws on the
    // out-of-bounds slice)
    val occ = w.where(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $k), i -> " +
          s"struct(i AS pos, " +
          s"md5(concat_ws(' ', slice(w, i + 1, $k))) AS sh))"))
        .as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.sh").as("sh"))
    val stats = occ.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(col("doc_id")).as("min_doc"))
    // excised occurrences -> the distinct token positions they cover
    val covered = occ.join(stats, Seq("sh"))
      .where(col("df") >= 2 && col("doc_id") =!= col("min_doc"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val rebuilt = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
        .as("kt"))
      .select(col("doc_id"), size(col("kt")).cast("long").as("n_kept"),
        expr("concat_ws(' ', transform(kt, x -> x.tok))")
          .as("text_clean"),
        // contiguous kept runs: 1 + number of position gaps > 1 (the
        // i >= 1 indices are always in bounds, so no ANSI guard needed
        // beyond the size >= 2 CASE)
        expr("CASE WHEN size(kt) >= 2 THEN CAST(1 + size(filter(" +
          "transform(sequence(1, size(kt) - 1), " +
          "i -> kt[i].pos - kt[i-1].pos), d -> d > 1)) AS BIGINT) " +
          "ELSE CAST(size(kt) AS BIGINT) END").as("n_segments"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        ((col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("double") / col("n_tokens")).as("removed_frac"))
  }

  /** WITHIN-document repeated-span removal — the excision counterpart
    * of the Gopher repetition SIGNALS ([[repetition]] measures; this
    * cleans): where [[dedupSpans]] excises runs duplicated ACROSS
    * documents, this excises runs a document repeats internally
    * (boilerplate stutter, templated spam, decoding loops). A k-token
    * window occurrence is redundant iff the same shingle occurs
    * earlier in the SAME document — the first occurrence keeps, every
    * later one excises (deterministic: min start position per
    * (doc, shingle) is the canonical copy). Output contract matches
    * [[dedupSpans]] (n_tokens, n_removed, n_segments, text_clean,
    * removed_frac), so the two excisions compose interchangeably.
    *
    * Scale shape: the window projection and the (doc, shingle) stats
    * aggregate are keyed by doc_id — rows never leave their
    * document's shard family, so unlike the cross-doc operator there
    * is no corpus-vocabulary frame at all. The shuffle key is the
    * 16-byte window digest plus doc_id ([[dedupSpans]]' payload
    * discipline); the rebuild groups per doc_id with a
    * document-bounded collect. */
  def cleanRepetition(docs: DataFrame, minTokens: Int = 3): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val k = minTokens
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val occ = w.where(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $k), i -> " +
          s"struct(i AS pos, " +
          s"md5(concat_ws(' ', slice(w, i + 1, $k))) AS sh))"))
        .as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.sh").as("sh"))
    val stats = occ.groupBy(col("doc_id"), col("sh"))
      .agg(count(lit(1)).as("c"), min(col("pos")).as("min_pos"))
    val covered = occ.join(stats, Seq("doc_id", "sh"))
      .where(col("c") >= 2 && col("pos") =!= col("min_pos"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val rebuilt = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
        .as("kt"))
      .select(col("doc_id"), size(col("kt")).cast("long").as("n_kept"),
        expr("concat_ws(' ', transform(kt, x -> x.tok))")
          .as("text_clean"),
        expr("CASE WHEN size(kt) >= 2 THEN CAST(1 + size(filter(" +
          "transform(sequence(1, size(kt) - 1), " +
          "i -> kt[i].pos - kt[i-1].pos), d -> d > 1)) AS BIGINT) " +
          "ELSE CAST(size(kt) AS BIGINT) END").as("n_segments"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        ((col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("double") / col("n_tokens")).as("removed_frac"))
  }

  /** Deterministic sharded corpus shuffle — the pre-training
    * randomization pass: training order must be a reproducible
    * pseudo-random permutation of the curated corpus. A single global
    * rank (row_number over the whole corpus) would funnel 100 TB
    * through one partition, so the permutation is factored the way
    * production loaders shard it: a content-independent salted hash
    * assigns each doc to one of `nShards` shards (md5("shuf:"||id) —
    * the salt keeps the order independent of [[trainValTestSplit]] /
    * [[sampleStratified]] buckets), and the position WITHIN the shard
    * orders by the remaining hash entropy (salt, then doc_id as the
    * total-order tie-break). Global order = (shard, pos_in_shard);
    * every shard sorts only |corpus|/nShards rows in parallel, and a
    * training job reads shards in index order. Per-row hashing plus one
    * bounded per-shard window — no global sort, no state. */
  def globalShuffle(docs: DataFrame, nShards: Int = 64): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val salt = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
    val shard = conv(substring(col("salt"), 1, 4), 16, 10)
      .cast("long") % nShards
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("salt").asc, col("doc_id").asc)
    docs.select(col("doc_id"), salt.as("salt"))
      .withColumn("shard", shard)
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
  }

  /** Data-driven source-mixture rebalancing — the domain-reweighting
    * pass of a training-data pipeline: given target TOKEN shares per
    * source (permille of the corpus total), compute each source's
    * keep-rate from its measured token mass and downsample it to its
    * target. Unlike [[sampleStratified]] (rates given), the rates here
    * are DERIVED: keep_permille(src) = min(1000,
    * (total*share/1000)*1000 div source_tokens), all exact integer
    * arithmetic, then the same content-independent salted-md5 per-doc
    * predicate ("mix:" salt — independent of the split and strat
    * buckets). Rates cap at 1000 — this operator only downsamples
    * (upsampling duplicates training data; express epochs in the
    * loader instead). Sources ABSENT from `shares` are dropped — a
    * mixture definition is exhaustive by design, and silently keeping
    * an unlisted source at full weight is the bug. Doc-level sampling
    * approximates the token target in expectation (exact per-token
    * trimming would split documents).
    *
    * Scale shape: one tokens-per-source aggregate (sources-cardinality,
    * broadcast back as an aggregated frame per the broadcast policy),
    * a 1-row total, and a per-row keep predicate — no corpus shuffle
    * at all. */
  def mixRebalance(docs: DataFrame,
      shares: Seq[(String, Long)]): DataFrame = {
    require(shares.nonEmpty, "shares must list at least one source")
    require(shares.map(_._1).distinct.size == shares.size,
      s"duplicate source in shares: ${shares.map(_._1).diff(
        shares.map(_._1).distinct).distinct.mkString(", ")}")
    require(shares.forall(_._2 >= 0) && shares.map(_._2).sum <= 1000,
      "shares are permille values >= 0 summing to <= 1000")
    val s = docs.sparkSession
    import s.implicits._
    val sh = shares.toDF("source", "share_permille")
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bySource = toks.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("source_tokens"))
    val total = toks.agg(sum(col("n_tokens")).as("total_tokens"))
    // DECIMAL(38,0) intermediates: in BIGINT the total_tokens*1000
    // product overflows near ~9e15 corpus tokens (ANSI mode throws;
    // non-ANSI silently wraps to wrong keep rates) — decimal keeps the
    // products exact to 38 digits, and `div` surfaces BIGINT quotients
    // (keep_permille <= 1000 by construction). The DuckDB oracle
    // mirrors with HUGEINT (int128) — its `//` on DECIMAL degrades to
    // DOUBLE true-division, so decimal is NOT the exact mirror there.
    val rates = bySource
      .join(broadcast(sh), Seq("source")) // inner: unlisted -> dropped
      .crossJoin(broadcast(total)) // 1-row scalar frame
      .select(col("source"),
        least(lit(1000L),
          expr("CAST(CAST(total_tokens AS DECIMAL(38,0))" +
            " * share_permille div 1000 AS DECIMAL(38,0))" +
            " * 1000 div source_tokens")).as("keep_permille"))
    val bucket = saltBucket("mix:", 1000)
    toks
      .join(broadcast(rates), Seq("source")) // sources-cardinality agg
      .select(col("doc_id"), col("source"), col("n_tokens"),
        bucket.as("bucket"), col("keep_permille"))
      .where(col("bucket") < col("keep_permille"))
  }

  /** Temperature-based source rebalancing — the multilingual-LM
    * mixing rule (mT5 / XLM-R: sample source s with probability
    * proportional to n_s^alpha, alpha = 1/tau < 1 flattening the
    * source distribution) rendered as deterministic per-doc keep
    * rates, for alpha = 1/q with integer q (q = 2, tau = 2, is the
    * classic setting; q = 1 is proportional passthrough). Where
    * [[mixRebalance]] takes EXPLICIT target shares, this derives them
    * from the corpus itself: t_s = floor(n_s^(1/q)) exactly (integer
    * q-th root), target share p_s = t_s / sum(t), and the token
    * budget is the largest B with B * p_s <= n_s for every source —
    * the biggest corpus that achieves the temperature distribution by
    * pure subsampling (a keep-rate operator cannot upsample; the
    * scarcest-after-flattening source caps the budget at keep rate
    * ~1). Keep decisions ride [[saltBucket]] (prefix `mixt:`), so
    * membership is reproducible and independent of the family's other
    * splits.
    *
    * The root is EXACT despite the IEEE seed: POWER's result can land
    * either side of the true root and engines disagree on
    * double->bigint rounding, so the largest candidate in [g-2, g+2]
    * whose exact integer q-th power fits is taken — both engines
    * compute the same t_s bit-for-bit. Scale shape: one per-source
    * aggregate (sources-cardinality), two 1-row scalar frames, all
    * broadcast; the corpus is touched by exactly one aggregate and
    * one broadcast-joined filter pass. All products run in
    * DECIMAL(38,0) (mirrored as HUGEINT in the oracle): in BIGINT
    * the budget*t_s*1000 numerator overflows near ~4e10 corpus
    * tokens for q=2 (and ~1e8 for q=1) — far BELOW the 100 TB
    * design point, where ANSI mode throws and non-ANSI silently
    * wraps. Widened, the numerator stays exact to 10^38: the q=1
    * worst case N^2*1000 holds to ~3e17 corpus tokens and q>=2 to
    * ~2e23 — both orders of magnitude past ~1e13 (100 TB). The
    * per-source budget candidate `b` surfaces as a BIGINT quotient,
    * exact while min(b) < 2^63 (~9e18 tokens). */
  def mixTemperature(docs: DataFrame, q: Int = 2): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    mixTemperatureToks(toks,
      toks.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("source_tokens")), q)
  }

  /** [[mixTemperature]] against EXPLICIT per-source token totals
    * `bySource(source, source_tokens)` — the serving half once a
    * maintained totals table exists (graft.streaming.Streams'
    * corpusSink state): new batches mix under the ACCUMULATED
    * corpus's temperature rates instead of their own batch-local
    * distribution. Identical arithmetic to the self-derived form —
    * mixTemperature(d) == mixTemperatureWith(d, totals-of-d) by
    * construction. */
  def mixTemperatureWith(docs: DataFrame, bySource: DataFrame,
      q: Int = 2): DataFrame =
    mixTemperatureToks(docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens")),
      bySource, q)

  private def mixTemperatureToks(toks: DataFrame, bySource: DataFrame,
      q: Int): DataFrame = {
    require(q >= 1 && q <= 6,
      s"temperature exponent q must be in [1, 6], got $q")
    // candidate powers in DECIMAL(38,0): (g+2)^q brushes Long.Max
    // when source_tokens itself nears 2^63
    val powT =
      ("CAST(t AS DECIMAL(38,0))" +: Seq.fill(q - 1)("t")).mkString(" * ")
    val alpha = 1.0 / q
    // sources-cardinality; feeds three consumers (sum, min, join)
    val roots = bySource
      .withColumn("g", expr("CAST(POWER(CAST(source_tokens AS " +
        s"DOUBLE), ${alpha}D) AS BIGINT)"))
      .withColumn("t_s", expr(
        "array_max(filter(array(g - 2, g - 1, g, g + 1, g + 2), " +
          s"t -> t >= 1 AND $powT <= source_tokens))"))
      .select(col("source"), col("source_tokens"), col("t_s"))
      .pinned
    val totT = roots.agg(sum(col("t_s")).as("tot_t")) // 1-row scalar
    val budget = roots.crossJoin(broadcast(totT))
      .select(expr("CAST(source_tokens AS DECIMAL(38,0))" +
        " * tot_t div t_s").as("b"))
      .agg(min(col("b")).as("budget")) // 1-row scalar
    val rates = roots.crossJoin(broadcast(totT))
      .crossJoin(broadcast(budget))
      .select(col("source"),
        least(lit(1000L),
          expr("CAST(budget AS DECIMAL(38,0)) * t_s * 1000" +
            " div (CAST(tot_t AS DECIMAL(38,0)) * source_tokens)"))
          .as("keep_permille"))
    val bucket = saltBucket("mixt:", 1000)
    toks
      // rates is DATA-derived (one row per distinct source): at
      // curated-mixture cardinality the optimizer auto-broadcasts it;
      // at domain-level mixing (unbounded sources) it must shuffle —
      // unlike mixRebalance, whose rates frame is bounded by the
      // caller's explicit share list, no hint is safe here
      .join(rates, Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        bucket.as("bucket"), col("keep_permille"))
      .where(col("bucket") < col("keep_permille"))
  }

  /** Tokenizer-vocabulary build with document-frequency pruning — the
    * first step of training any tokenizer/featurizer on a curated
    * corpus: global term and document frequencies, pruned by min-df
    * (hapax/noise floor) and max-df (corpus-stopword ceiling, as the
    * exact integer cross-multiplication df*den <= n_docs*num — no
    * float threshold), ranked by (tf desc, word asc) and cut to the
    * top `topK`.
    *
    * Scale shape: ONE tokenization shuffle into the (word -> tf, df)
    * aggregate — df is max one count per (doc, word), folded in the
    * same pass via count(distinct)-free two-level aggregation; the
    * top-K cut is orderBy+limit (TakeOrdered: per-partition heaps, K
    * rows to the driver — no global sort); the final dense rank is a
    * window over the ALREADY-CUT K rows, bounded by the constant topK,
    * not the corpus. */
  def vocabBuild(docs: DataFrame, minDf: Long = 2,
      maxDfNum: Long = 1, maxDfDen: Long = 2,
      topK: Int = 1000): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxDfNum >= 0 && maxDfDen > 0,
      s"max-df fraction must be a valid ratio, got $maxDfNum/$maxDfDen")
    require(topK > 0, s"topK must be positive, got $topK")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val wordStats = tokens(docs)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c_dw"))
      .groupBy(col("word"))
      .agg(sum(col("c_dw")).as("tf"), count(lit(1)).as("df"))
    val pruned = wordStats
      .crossJoin(broadcast(n)) // 1-row scalar frame
      .where(col("df") >= minDf &&
        col("df") * maxDfDen <= col("n_docs") * maxDfNum)
    val top = pruned.orderBy(col("tf").desc, col("word").asc).limit(topK)
    // K rows by construction — the unpartitioned window is bounded
    val w = Window.orderBy(col("tf").desc, col("word").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("word"), col("tf"), col("df"))
  }

  /** Vocabulary id-encoding — the terminal EXPORT step of a curation
    * run: every token maps to its [[vocabBuild]] rank (the id a
    * training loader consumes), out-of-vocabulary tokens to 0, and
    * each document emits its exact id SEQUENCE pinned by an md5 of
    * the comma-joined ids (the [[chunk]] discipline — content pinned
    * without shipping the arrays twice) plus token/OOV counts.
    *
    * Scale shape: the id map is AT MOST `topK` rows BY CONSTRUCTION
    * (the [[vocabBuild]] cut), so it broadcasts legitimately — the
    * codebook rule, not the vocabulary rule; the corpus is touched by
    * one token projection and one per-doc fold whose collect is
    * bounded by a single document's length. */
  def vocabEncode(docs: DataFrame, minDf: Long = 2,
      maxDfNum: Long = 1, maxDfDen: Long = 2,
      topK: Int = 1000): DataFrame = {
    val ids = vocabBuild(docs, minDf, maxDfNum, maxDfDen, topK)
      .select(col("word"), col("rank").as("id"))
    tokens(docs)
      .join(broadcast(ids), Seq("word"), "left") // <= topK rows
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(0L)).as("id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_oov"),
        md5(concat_ws(",", expr(
          "transform(sort_array(collect_list(struct(pos, id))), " +
            "x -> CAST(x.id AS STRING))")))
          .as("ids_hash"))
  }

  /** Per-source dedup funnel — the data-card companion of
    * [[dedupSurvivors]] (release notes report what dedup REMOVED per
    * source, not just what survived): docs and token mass kept vs
    * dropped for every source, with the drop rate as one final
    * division. The loser set is dup-mass-sized; everything else is
    * one count aggregate per side. */
  def dedupReport(docs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val d = docs.pinned
    val losers = dupGroups(
        nearDupMinhash(d, threshold).select(col("doc_a"), col("doc_b")))
      .where(col("doc_id") =!= col("group_id"))
      .select(col("doc_id"), lit(1L).as("dropped"))
    d.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(losers, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dropped"), lit(0L))).as("n_dropped"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("dropped").isNotNull, col("n_tok"))
          .otherwise(0L)).as("tokens_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        col("n_tokens"), col("tokens_dropped"),
        (col("n_dropped").cast("double") / col("n_docs"))
          .as("drop_rate"))
  }

  /** Collocation (phrase) detection by quantized PMI — the word2vec
    * phrase-merging step (Mikolov et al. 2013 §4: adjacent word pairs
    * whose joint count outruns their unigram product merge into
    * phrase tokens before training): score = floor(log2(c_ab * N /
    * (c_a * c_b))), the PMI with log2 quantized to a bit length so
    * the whole ranking is exact-integer. The c_ab*N product reaches
    * ~1e26 at corpus scale, far past Long — it runs in DECIMAL(38,0)
    * with `div` surfacing a BIGINT quotient (the mixTemperature
    * widening rule; the oracle mirrors with HUGEINT). Sub-1 ratios
    * (negative PMI) collapse to -1 — phrase picking only orders the
    * positive side. Top-K by (pmi_q desc, c_ab desc, pair) — a total
    * order.
    *
    * Scale shape: one bigram count shuffle + one unigram count
    * shuffle; the unigram table joins BY KEY twice (vocabulary-sized,
    * never broadcast); N is the one 1-row broadcast; top-K is
    * orderBy+limit (TakeOrdered), rank windows over K rows. */
  def phrasePmi(docs: DataFrame, minCount: Long = 3,
      topK: Int = 50): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val ab = docBigrams(docs)
      .groupBy(col("lhs"), col("rhs")).agg(sum(col("k")).as("c_ab"))
    val uni = tokens(docs)
      .groupBy(col("word")).agg(count(lit(1)).as("c_u"))
      .pinned // one count pass joins as BOTH the lhs and rhs side
    val n = uni.agg(sum(col("c_u")).as("n_tokens"))
    val top = ab.where(col("c_ab") >= minCount)
      .join(uni.select(col("word").as("lhs"), col("c_u").as("c_a")),
        Seq("lhs"))
      .join(uni.select(col("word").as("rhs"), col("c_u").as("c_b")),
        Seq("rhs"))
      .join(broadcast(n), lit(true))
      .withColumn("ratio", expr(
        "CAST(c_ab AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0))" +
          " div (CAST(c_a AS DECIMAL(38,0)) * CAST(c_b AS DECIMAL(38,0)))"))
      .withColumn("pmi_q",
        when(col("ratio") >= 1, length(bin(col("ratio"))) - 1)
          .otherwise(lit(-1)).cast("long"))
      .orderBy(col("pmi_q").desc, col("c_ab").desc,
        col("lhs").asc, col("rhs").asc)
      .limit(topK)
    val w = Window.orderBy(col("pmi_q").desc, col("c_ab").desc,
      col("lhs").asc, col("rhs").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("lhs"), col("rhs"), col("c_ab"),
        col("pmi_q"))
  }

  /** Detokenization round trip — the export sanity check every
    * tokenizer deployment ships (encode -> decode must reproduce the
    * text wherever the vocabulary covers it): re-encode each doc
    * against the built vocabulary, then decode the ID SEQUENCE ALONE
    * back to words (the original word never rides along — id 0, the
    * OOV lane, decodes to '<unk>'), reassembling in position order.
    * Both vocabulary joins are against the <= topK-row id table —
    * bounded BY CONSTRUCTION, broadcast-safe at any corpus size. */
  def vocabDecode(docs: DataFrame, minDf: Long = 2,
      maxDfNum: Long = 1, maxDfDen: Long = 2,
      topK: Int = 1000): DataFrame = {
    val ids = vocabBuild(docs, minDf, maxDfNum, maxDfDen, topK)
      .select(col("word"), col("rank").as("id"))
    val enc = tokens(docs)
      .join(broadcast(ids), Seq("word"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(0L)).as("id"))
    enc.join(broadcast(ids.select(col("id"), col("word").as("w"))),
        Seq("id"), "left")
      .select(col("doc_id"), col("pos"), col("id"),
        coalesce(col("w"), lit("<unk>")).as("out_word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(pos, out_word))), " +
            "x -> x.out_word)")).as("text_decoded"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        col("text_decoded"), (col("n_oov") === 0L).as("lossless"))
  }

  /** BPE-style pair statistics — one counting round of byte-pair
    * encoding (Sennrich, Haddow & Birch, "Neural Machine Translation
    * of Rare Words with Subword Units", 2016): count adjacent
    * character pairs WITHIN word occurrences across the corpus; the
    * most frequent pair is the round's merge candidate, and the top-K
    * frame is the merge table a tokenizer trainer would consume.
    * Exact integer counts with a (count desc, pair asc) total order.
    *
    * Scale shape: per-row explode to (pair) then one map-side-combined
    * count shuffle over the pair vocabulary (charset², bounded but
    * treated as corpus-sized: shuffled, never broadcast); top-K by
    * orderBy+limit (TakeOrdered), rank over the cut K rows only. */
  def bpePairStats(docs: DataFrame, topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val pairs = tokens(docs)
      .select(split(col("word"), "").as("cs"))
      .where(size(col("cs")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(cs) - 1), " +
          "i -> concat_ws('', slice(cs, i, 2)))")).as("pair"))
    val top = pairs.groupBy(col("pair"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("pair").asc).limit(topK)
    val w = Window.orderBy(col("n_pairs").desc, col("pair").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("pair"), col("n_pairs"))
  }

  /** ITERATED BPE merge trainer — the closed training loop
    * [[bpePairStats]] is one round of (Sennrich, Haddow & Birch 2016:
    * count pairs -> take the most frequent -> merge it everywhere ->
    * recount). Returns the learned merge table: one row per round
    * (merge_round, lhs, rhs, merged, n_pairs), the artifact a
    * tokenizer consumes, with the canonical (count desc, lhs asc,
    * rhs asc) total order deciding each round's winner.
    *
    * Representation: the trainer works the DISTINCT word-frequency
    * table, not word occurrences (Heaps' law: the vocabulary is
    * orders of magnitude smaller than a 100 TB corpus — the classic
    * trainer efficiency), each word held as its symbol sequence with
    * every symbol wrapped `SEP sym SEP`. Adjacent-pair patterns
    * (`SEP l SEP SEP r SEP`) then share no characters, so plain
    * non-overlapping left-to-right string replace applies a merge
    * exactly like canonical BPE does on the symbol list — including
    * runs: [a,a,a,a] -> [aa,aa], not [aa,a,a]. (With a single shared
    * separator the first replacement would consume the boundary and
    * skip the second pair.)
    *
    * Scale shape: per round, ONE map-side-combined pair-count shuffle
    * over the vocabulary, a TakeOrdered top-1, and a per-row codegen'd
    * replace; only the single winning pair crosses to the driver each
    * round (the same driver-sees-one-row loop discipline as the
    * k-means trainer in EmbeddingOps). The working table is
    * pinned (Stage.pinned) every round so lineage stays bounded across
    * iterations.
    *
    * CONVERGENCE: training stops before `rounds` when no pair remains
    * OR the best remaining pair's count falls below `minCount` — the
    * frequency floor real tokenizer trainers use (Sennrich 2016 §3
    * trains "until the vocabulary reaches a target size OR no pair
    * occurs more than the threshold"); `rounds` IS the target-vocab
    * form of the same stop (vocab = base charset + one symbol per
    * merge). The floor is a valid STOP (not just a filter) because
    * round winners are monotone non-increasing: merging the max-count
    * pair can only create pairs whose occurrences each contain an
    * occurrence of the merged symbol, so no later round can beat the
    * count that stopped this one. That monotone law is spec-pinned,
    * and the `text_bpe_converged` oracle leans on it (replay all
    * rounds, keep those at or above the floor). */
  def bpeMerges(docs: DataFrame, rounds: Int = 5,
      minCount: Long = 1L): DataFrame = {
    require(rounds >= 1 && rounds <= 100,
      s"rounds must be in [1, 100], got $rounds")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val records = bpeTrain(docs, rounds, minCount)._2
    val s = docs.sparkSession
    import s.implicits._
    records.toDF("merge_round", "lhs", "rhs", "merged", "n_pairs")
  }

  /** Tokenize the corpus WITH the trained merges — the consumer side
    * of [[bpeMerges]]: every word collapses to its final subword
    * segmentation after `rounds` merges, and each document reports its
    * resulting token count (the number a training pipeline budgets
    * sequence packing and cost by). 1-char words (below the trainer's
    * pair floor) count as one token each.
    *
    * Scale shape: the per-word segmentation is vocabulary-sized; the
    * corpus joins to it once on the word key (a keyed shuffle join —
    * at 100 TB the vocabulary is NOT broadcast-safe), then one
    * per-doc count shuffle. */
  def bpeEncode(docs: DataFrame, rounds: Int = 5,
      minCount: Long = 1L): DataFrame = {
    require(rounds >= 1 && rounds <= 100,
      s"rounds must be in [1, 100], got $rounds")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val seqs = bpeTrain(docs, rounds, minCount)._1
    // m symbols -> split produces 2m+1 elements; (2m+1-1)/2.0 = m is
    // exact in double for any real vocabulary
    val perWord = seqs.select(col("word"),
      ((size(split(col("seq"), BpeSep)) - lit(1)) / lit(2))
        .cast("long").as("n_tok"))
    tokens(docs)
      .join(perWord, Seq("word"), "left")
      .select(col("doc_id"),
        when(length(col("word")) >= 2 && !col("word").contains(BpeSep),
          col("n_tok"))
          .when(length(col("word")) === 1, lit(1L))
          .otherwise(lit(0L)).as("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tok")).as("n_bpe_tokens"))
  }

  /** Tokenizer-fertility data card — the measurement that chooses
    * between tokenizers (and their merge budgets): per source, words
    * vs the BPE tokens they encode to ([[bpeEncode]]), as exact
    * permilles — fertility (tokens per 1000 words: lower = the
    * vocabulary compresses this source better) and chars per 1000
    * tokens (the compute cost of a character of this source). A
    * multilingual mix is priced per source exactly this way before
    * fixing sampling temperatures. One doc-keyed join of the encode
    * output, one per-source aggregate. */
  def tokenizerFertility(docs: DataFrame, rounds: Int = 5): DataFrame =
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("n_wchars"))
      .join(bpeEncode(docs, rounds), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("total_words"),
        sum(col("n_wchars")).as("total_wchars"),
        sum(col("n_bpe_tokens")).as("total_tokens"))
      .select(col("source"), col("total_words"), col("total_wchars"),
        col("total_tokens"),
        expr("total_tokens * 1000 div total_words")
          .as("fertility_permille"),
        expr("total_wchars * 1000 div total_tokens")
          .as("chars_per_token_permille"))

  /** Unit separator framing the BPE symbol sequences — never present
    * in whitespace-tokenized text. */
  private val BpeSep = "\u001F"

  /** The shared trainer loop behind [[bpeMerges]] (wants the merge
    * records) and [[bpeEncode]] (wants the final per-word
    * segmentations): returns the final (word, seq, n) frame and the
    * per-round merge records. */
  private def bpeTrain(docs: DataFrame, rounds: Int,
      minCount: Long = 1L)
      : (DataFrame, Seq[(Long, String, String, String, Long)]) = {
    val sep = BpeSep
    // 1-char words can never pair and never change: drop them up
    // front. Words containing the separator would corrupt the framing
    // (none exist in whitespace-tokenized text, but stay defensive).
    val wf = tokens(docs)
      .where(length(col("word")) >= 2 && !col("word").contains(sep))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    var seqs = wf.select(col("word"),
        concat_ws("", transform(split(col("word"), ""),
          c => concat(lit(sep), c, lit(sep)))).as("seq"),
        col("n"))
      .pinned
    val records = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // split on SEP yields ["", s1, "", "", s2, "", ..., sm, ""] —
      // symbols sit at 1-based even indices 2i, so pair i is
      // (cs[2i], cs[2i+2]) for i in 1..m-1
      val top = seqs
        .select(split(col("seq"), sep).as("cs"), col("n"))
        .where(size(col("cs")) >= 5) // at least 2 symbols
        .select(explode(expr(
          "transform(sequence(1, (size(cs) - 1) div 2 - 1), " +
            "i -> struct(element_at(cs, cast(2*i AS int)) AS lhs, " +
            "element_at(cs, cast(2*i + 2 AS int)) AS rhs))")).as("p"),
          col("n"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("n")).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      // stop on a dry vocabulary OR a winner below the frequency
      // floor — by the monotone law no later round could clear it
      if (top.isEmpty || top(0).getLong(2) < minCount) exhausted = true
      else {
        val (l, rr, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        records += ((r.toLong, l, rr, l + rr, n))
        val pat = sep + l + sep + sep + rr + sep
        val rep = sep + l + rr + sep
        seqs = seqs.select(col("word"),
            call_function("replace", col("seq"), lit(pat), lit(rep))
              .as("seq"), col("n"))
          .pinned
        r += 1
      }
    }
    (seqs, records.result())
  }

  /** Max subword-piece length for the unigram-LM trainer (SentencePiece
    * `max_sentencepiece_length` analog, kept small so the candidate
    * edge set per word is O(len * L)). */
  val UnigramMaxPieceLen = 4

  /** Words longer than this fall back to single-char segmentation
    * instead of entering the DP (bounds the oracle's unrolled replay
    * AND the per-row DP arrays; SentencePiece similarly caps sentence
    * length). Shared with the SuiteML oracle generator. */
  val UnigramMaxWordLen = 16

  /** Unigram-LM (SentencePiece-style) tokenizer trainer — the
    * tokenizer the mT5/XLM-R recipes ([[mixTemperature]]) actually
    * pair with (Kudo 2018, "Subword Regularization"): a vocabulary of
    * variable-length pieces with per-piece costs, fit by EM over the
    * word-frequency table and served by min-cost (Viterbi)
    * segmentation. This rendering is the DETERMINISTIC hard-EM
    * (Viterbi-EM) variant in exact integer arithmetic, so the whole
    * training loop replays bit-identically in DuckDB:
    *
    *  - piece costs quantize to `floor(log2(tot div c))` — the
    *    bit-length of an integer division (the [[lmScore]] trick), so
    *    segmentation scores are exact BIGINT sums;
    *  - the E-step segments each DISTINCT word (Heaps' law — the
    *    [[bpeMerges]] representation) by DP over its candidate piece
    *    edges, tie-broken canonically (smallest last-piece length),
    *    and counts piece usage weighted by word frequency;
    *  - the M-step keeps ALL single chars (coverage guarantee) plus
    *    the top `vocabSize` multi-char pieces by (usage desc, piece
    *    asc), re-deriving costs with add-one smoothing;
    *  - seed counts are frequency-weighted substring occurrences
    *    (length <= `maxPieceLen`), the standard seed-vocab heuristic.
    *
    * Scale shape per round: one per-row edge projection over the
    * VOCABULARY (not the corpus), one keyed-shuffle join piece->cost
    * (the [[bpeEncode]] rule — a vocabulary-sized frame is never
    * broadcast), one per-word bounded-array DP (pure projection: the
    * edge array is <= len*L entries), one piece-count shuffle, one
    * TakeOrdered prune. The driver only steers the round loop — no
    * row ever crosses to it (tighter than BPE, whose winner does). */
  def unigramVocab(docs: DataFrame,
      maxPieceLen: Int = UnigramMaxPieceLen, vocabSize: Int = 32,
      rounds: Int = 2): DataFrame = {
    val vocab = unigramTrain(docs, maxPieceLen, vocabSize, rounds)
    // bounded window: |vocab| <= vocabSize + |charset| by construction
    val w = Window.orderBy(col("c").desc, col("piece").asc)
    vocab.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("piece"), col("c"), col("cost_q"))
  }

  /** Tokenize the corpus WITH the trained unigram vocabulary — the
    * consumer side of [[unigramVocab]]: every distinct word segments
    * once by min-cost DP (its total cost is the word's quantized NLL
    * under the piece LM — `best[len]`, no re-summation), long words
    * fall back to chars, and each document reports its piece count
    * and exact NLL sum with ONE final IEEE division for the average.
    * Scale shape: the per-word segmentation table is vocabulary-sized
    * and joins the corpus token stream by keyed shuffle on the word
    * ([[bpeEncode]]'s rule), then one per-doc sum shuffle. */
  def unigramEncode(docs: DataFrame,
      maxPieceLen: Int = UnigramMaxPieceLen, vocabSize: Int = 32,
      rounds: Int = 2): DataFrame = {
    val vocab = unigramTrain(docs, maxPieceLen, vocabSize, rounds)
    val wf = unigramWordFreq(docs).pinned
    val shortSeg = unigramSegments(
      wf.where(length(col("word")) <= UnigramMaxWordLen), vocab,
      maxPieceLen)
      .select(col("word"), size(col("pieces")).cast("long").as("np"),
        element_at(col("best"), length(col("word")) + 1).as("nll"))
    val longSeg = wf.where(length(col("word")) > UnigramMaxWordLen)
      .select(col("word"), explode(split(col("word"), "")).as("piece"))
      .join(vocab.select(col("piece"), col("cost_q")), Seq("piece"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("np"), sum(col("cost_q")).as("nll"))
    val perWord = shortSeg.unionByName(longSeg)
    tokens(docs)
      .join(perWord, Seq("word")) // keyed shuffle; every token matches
      .groupBy(col("doc_id"))
      .agg(sum(col("np")).as("n_pieces"), sum(col("nll")).as("nll_sum"))
      .select(col("doc_id"), col("n_pieces"), col("nll_sum"),
        (col("nll_sum").cast("double") / col("n_pieces")).as("avg_nll"))
  }

  /** (word, n) frequency table over whitespace tokens — the shared
    * working set of the unigram trainer (every word, long or short,
    * contributes seed substrings and char usage). */
  private def unigramWordFreq(docs: DataFrame): DataFrame =
    tokens(docs).groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Min-cost segmentation of each word against a (piece, cost_q)
    * vocabulary: candidate edges (ending position i, length l) inner-
    * join the vocabulary (single-char coverage guarantees a path),
    * collect into a bounded per-word array, then one per-row fold
    * computes the DP costs, the canonical choices (smallest l among
    * cost-optimal edges at each position), and the backtraced pieces.
    * Returns (word, n, edges, best, pieces) — pure projection after
    * the one keyed vocab join. */
  private def unigramSegments(wfs: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val edges = wfs.select(col("word"))
      .select(col("word"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
          s"transform(sequence(1, least($maxPieceLen, i)), l -> " +
          "struct(i AS i, l AS l, " +
          "substring(word, i - l + 1, l) AS piece))))")).as("e"))
      .select(col("word"), col("e.i").as("i"), col("e.l").as("l"),
        col("e.piece").as("piece"))
      .join(vocab.select(col("piece"), col("cost_q")), Seq("piece"))
      .groupBy(col("word"))
      .agg(sort_array(collect_list(
        struct(col("i"), col("l"), col("cost_q")))).as("edges"))
    wfs.join(edges, Seq("word"))
      // best[i] (1-based slot i+1) = min cost to segment word[1..i]
      .withColumn("best", expr(
        "aggregate(sequence(1, length(word)), array(0L), (acc, i) -> " +
          "concat(acc, array(array_min(transform(" +
          "filter(edges, e -> e.i = i), " +
          "e -> element_at(acc, e.i - e.l + 1) + e.cost_q)))))"))
      // canonical tie-break: smallest piece length among optimal edges
      .withColumn("choice", expr(
        "transform(sequence(1, length(word)), i -> " +
          "array_min(transform(filter(edges, e -> e.i = i AND " +
          "element_at(best, e.i - e.l + 1) + e.cost_q = " +
          "element_at(best, e.i + 1)), e -> e.l)))"))
      // backtrace: at most len steps; emitted back-to-front (order is
      // irrelevant to usage counting and piece totals)
      .withColumn("pieces", expr(
        "aggregate(sequence(1, length(word)), " +
          "named_struct('pos', length(word), " +
          "'ps', CAST(array() AS array<string>)), " +
          "(st, x) -> IF(st.pos > 0, named_struct(" +
          "'pos', st.pos - element_at(choice, st.pos), " +
          "'ps', concat(st.ps, array(substring(word, " +
          "st.pos - element_at(choice, st.pos) + 1, " +
          "element_at(choice, st.pos))))), st), st -> st.ps)"))
  }

  /** The shared trainer loop behind [[unigramVocab]]/[[unigramEncode]]:
    * returns the final (piece, c, cost_q) vocabulary, pinned. */
  private def unigramTrain(docs: DataFrame, maxPieceLen: Int,
      vocabSize: Int, rounds: Int): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 8,
      s"maxPieceLen must be in [2, 8], got $maxPieceLen")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(rounds >= 1 && rounds <= 10,
      s"rounds must be in [1, 10], got $rounds")
    val wf = unigramWordFreq(docs).pinned
    val wfs = wf.where(length(col("word")) <= UnigramMaxWordLen)
    val wfl = wf.where(length(col("word")) > UnigramMaxWordLen)
    // seed: frequency-weighted substring occurrence counts (all words)
    val sub = wf.select(col("word"), col("n"))
      .select(explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
          s"transform(sequence(1, least($maxPieceLen, i)), l -> " +
          "substring(word, i - l + 1, l))))")).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
      .pinned
    val singlesSet = sub.where(length(col("piece")) === 1)
      .select(col("piece")).pinned
    def withCosts(v: DataFrame): DataFrame = {
      val tot = v.agg(sum(col("c")).as("tot")) // 1-row scalar
      v.crossJoin(broadcast(tot))
        .select(col("piece"), col("c"),
          (length(bin(expr("tot div c"))) - 1).cast("long").as("cost_q"))
        .pinned
    }
    var vocab = withCosts(
      sub.where(length(col("piece")) === 1)
        .unionByName(sub.where(length(col("piece")) >= 2)
          .orderBy(col("c").desc, col("piece").asc).limit(vocabSize)))
    for (_ <- 1 to rounds) {
      val usageShort =
        unigramSegments(wfs, vocab, maxPieceLen)
          .select(explode(col("pieces")).as("piece"), col("n"))
      val usageLong = wfl
        .select(explode(split(col("word"), "")).as("piece"), col("n"))
      val usage = usageShort.unionByName(usageLong)
        .groupBy(col("piece")).agg(sum(col("n")).as("u"))
        .pinned
      val newSingles = singlesSet
        .join(usage, Seq("piece"), "left")
        .select(col("piece"),
          (coalesce(col("u"), lit(0L)) + 1L).as("c"))
      val newMultis = usage
        .where(length(col("piece")) >= 2 && col("u") >= 1L)
        .orderBy(col("u").desc, col("piece").asc).limit(vocabSize)
        .select(col("piece"), (col("u") + 1L).as("c"))
      vocab = withCosts(newSingles.unionByName(newMultis))
    }
    vocab
  }

  /** Long-document chunking with overlap — the step that turns a
    * curated corpus into model-window-sized pieces (embedding
    * pipelines, RAG indexing, long-doc training): fixed `maxTokens`
    * windows starting every `stride` tokens (overlap = maxTokens -
    * stride preserves context across boundaries), the last window
    * shortened to the document end. Emits (doc_id, chunk_id,
    * start_tok, n_chunk_tokens, chunk_hash) — the hash pins each
    * chunk's exact content for the oracle without shipping the text
    * twice. Pure per-row arithmetic + explode: no shuffle at all, the
    * embarrassingly-parallel shape chunking should have at 100 TB. */
  def chunk(docs: DataFrame, maxTokens: Int = 512,
      stride: Int = 256): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens], got $stride")
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n"))
      .withColumn("n_chunks",
        lit(1L) + when(col("n") > maxTokens,
          expr(s"(n - $maxTokens + $stride - 1) div $stride"))
          .otherwise(lit(0L)))
      .select(col("doc_id"), col("w"), col("n"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(maxTokens.toLong), col("n") - col("chunk_id") * stride)
          .as("n_chunk_tokens"),
        md5(concat_ws(" ", expr(
          s"slice(w, cast(chunk_id * $stride + 1 as int), " +
            s"cast(least($maxTokens, n - chunk_id * $stride) as int))")))
          .as("chunk_hash"))
  }

  /** Document fingerprints: full-content md5, head/tail block hashes,
    * and the min-shingle hash (a 1-hash MinHash — the winnowing-style
    * content anchor). */
  def fingerprint(docs: DataFrame): DataFrame = {
    // raw shingles: min() is duplicate-invariant, no distinct shuffle
    val minShingle = shinglesRaw(docs).groupBy(col("doc_id"))
      .agg(min(md5(col("s"))).as("min_shingle_hash"))
    docs.select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        md5(substring(col("text"), 1, 64)).as("head_hash"),
        md5(reverse(substring(reverse(col("text")), 1, 64))).as("tail_hash"))
      .join(minShingle, Seq("doc_id"), "left")
  }

  /** (doc_id, lhs, rhs, k) — each document's adjacent-bigram stream
    * with within-doc multiplicity, built per-row from the token array
    * (the [[repetition]] pattern: no window, no self-join; rows never
    * leave their document's partition before the count shuffle).
    * Shared scaffolding of the bigram-LM scorer and the DSIR featureizer.
    * Documents with < 2 tokens have no bigrams and drop out — the same
    * not-assessable rule as every shingle route. */
  private[graft] def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS lhs, w[i+1] AS rhs))")).as("b"))
      .select(col("doc_id"), col("b.lhs").as("lhs"), col("b.rhs").as("rhs"))
      .groupBy(col("doc_id"), col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("k"))

  /** Bigram-LM cross-entropy quality score — the perplexity filter of
    * CCNet (Wenzek et al. 2020) / Gopher, with the external KenLM
    * replaced by a self-trained corpus bigram model: documents whose
    * token stream is improbable under the corpus' own bigram statistics
    * (rare continuations, unnatural word order) score high and are
    * curation drop candidates. The negative log-likelihood of each
    * bigram occurrence, -log2 P(rhs|lhs) = log2(c(lhs)/c(lhs,rhs)), is
    * QUANTIZED to floor(log2(c_lhs div c_ab)) — the [[tfidfTopTerm]]
    * trick: an exact integer (the bit length of an integer division) in
    * any engine, so per-doc sums are order-independent exact BIGINTs
    * and the average is ONE final IEEE division. The context count
    * c(lhs) is derived from the bigram table itself (occurrences of
    * `lhs` in non-final position), so P(·|lhs) is a true conditional —
    * sums to 1 over the observed continuations — with no separate
    * unigram pass.
    *
    * Scale shape: one per-row bigram projection → ONE (doc_id, lhs,
    * rhs) count shuffle, pinned (Stage.pinned) for its two consumers; the
    * LM is two further aggregates of that frame; scoring joins shuffle
    * on the bigram key and then on `lhs` — model tables are vocabulary-
    * (and vocabulary²-)sized and are NEVER broadcast. Nothing is
    * corpus-quadratic; no driver-side state. */
  def lmScore(docs: DataFrame): DataFrame = {
    val db = docBigrams(docs).pinned
    lmScored(db, lmModelOf(db))
  }

  /** The corpus bigram LM as an explicit (lhs, rhs, c_ab) frame — the
    * model half of [[lmScore]], exposed so an incrementally-maintained
    * model (graft.streaming.Streams.lmSink state) can be compared to,
    * or substituted for, the one-shot batch training. */
  def lmModel(docs: DataFrame): DataFrame = lmModelOf(docBigrams(docs))

  private def lmModelOf(db: DataFrame): DataFrame =
    db.groupBy(col("lhs"), col("rhs")).agg(sum(col("k")).as("c_ab"))

  /** [[lmScore]] against an EXPLICIT (lhs, rhs, c_ab) model frame —
    * the serving half once a trained/maintained model exists. Scoring
    * is inner-joined on the bigram key: a document bigram the model
    * never observed has no probability under it and contributes
    * nothing (n_bigrams counts SCORED occurrences); when the model was
    * trained on the scored corpus itself ([[lmScore]]) every bigram is
    * observed and the two halves coincide. */
  def lmScoreWith(docs: DataFrame, lm: DataFrame): DataFrame =
    lmScored(docBigrams(docs), lm)

  /** Stupid-backoff bigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" §4: S(rhs|lhs) =
    * c_ab/c_lhs when the bigram was observed, else alpha * S(rhs)
    * with alpha = 0.4 — the non-normalized backoff web-scale LMs use
    * because proper discounting buys little at corpus size): the
    * serving upgrade over [[lmScoreWith]]'s inner-join semantics —
    * EVERY bigram occurrence scores, unseen transitions pay the
    * backed-off unigram cost instead of silently dropping out, so
    * cross-corpus serving covers every >= 2-token doc and reports how
    * much of each doc's mass backed off (`n_backoff`).
    *
    * Quantization: the seen arm keeps [[lmScore]]'s floor-log2 bit
    * length; the unseen arm is floor(log2((5*N) div (2*cb))) with
    * cb = c_rhs + 1 (add-one over the backoff distribution, so an
    * UNKNOWN rhs still scores) — 5/2 is exactly 1/alpha, and 5*N at
    * a 1e13-bigram corpus is 5e13, far under Long. All serving
    * tables derive from the model frame alone (context sums, unigram
    * sums, the 1-row total — the scalar-frame exception); the model
    * tables join by key, never broadcast. */
  def lmScoreBackoff(docs: DataFrame, lm: DataFrame): DataFrame = {
    val ctx = lm.groupBy(col("lhs")).agg(sum(col("c_ab")).as("c_lhs"))
    val uni = lm.groupBy(col("rhs")).agg(sum(col("c_ab")).as("c_rhs"))
    val tot = lm.agg(sum(col("c_ab")).as("n_total"))
    docBigrams(docs)
      .join(lm, Seq("lhs", "rhs"), "left")
      .join(ctx, Seq("lhs"), "left")
      .join(uni, Seq("rhs"), "left")
      .join(broadcast(tot), lit(true))
      .withColumn("nll_q", when(col("c_ab").isNotNull,
          (length(bin(expr("c_lhs div c_ab"))) - 1).cast("long"))
        .otherwise((length(bin(expr(
          "(n_total * 5) div ((coalesce(c_rhs, 0) + 1) * 2)"))) - 1)
          .cast("long")))
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * col("nll_q")).as("nll_sum"),
        sum(col("k")).as("n_bigrams"),
        sum(when(col("c_ab").isNull, col("k")).otherwise(0L))
          .as("n_backoff"))
      .select(col("doc_id"), col("nll_sum"), col("n_bigrams"),
        col("n_backoff"),
        (col("nll_sum").cast("double") / col("n_bigrams"))
          .as("avg_nll"))
  }

  private def lmScored(db: DataFrame, lm: DataFrame): DataFrame = {
    val ctx = lm.groupBy(col("lhs")).agg(sum(col("c_ab")).as("c_lhs"))
    db.join(lm, Seq("lhs", "rhs"))
      .join(ctx, Seq("lhs"))
      .withColumn("nll_q",
        (length(bin(expr("c_lhs div c_ab"))) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * col("nll_q")).as("nll_sum"),
        sum(col("k")).as("n_bigrams"))
      .select(col("doc_id"), col("nll_sum"), col("n_bigrams"),
        (col("nll_sum").cast("double") / col("n_bigrams"))
          .as("avg_nll"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4: rank
    * the corpus by LM perplexity and split into head/middle/tail —
    * the head is what their pipeline keeps for training): every
    * scored doc gets its EXACT global perplexity rank and an
    * as-even-as-possible bucket 1..nBuckets.
    *
    * The global rank is computed WITHOUT a single-partition window:
    * docs shard by the order-aligned quantization floor(avg_nll * 8)
    * (monotone in the score, so shard boundaries respect the global
    * (avg_nll, doc_id) order — and unlike repartitionByRange's
    * sampled boundaries, deterministic); in-shard ranks are a
    * shard-partitioned window, and each shard's global offset comes
    * from one tiny per-shard count frame (score-range-bounded
    * cardinality — its cumulative window and the 1-row total are the
    * scalar-frame exception, like every global aggregate here). The
    * bucket is floor((rank-1)*nBuckets/N)+1 — an explicit integer
    * formula instead of NTILE, so both engines replay it exactly.
    *
    * Skew knob: a corpus whose scores concentrate inside one
    * 1/granularity-unit cell serializes that cell's in-shard window —
    * raise `granularity` to split the hot range (shard cardinality
    * stays score-range-bounded, ~64*granularity cells). Exact ties
    * (identical avg_nll) are inherently one cell's work: their order
    * is (avg_nll, doc_id), which no score-aligned split can cut. */
  def pplBuckets(docs: DataFrame, nBuckets: Int = 3,
      granularity: Int = 8): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(granularity >= 1,
      s"granularity must be >= 1, got $granularity")
    val scored = lmScore(docs)
      .select(col("doc_id"), col("avg_nll")).pinned
    val sh = scored.withColumn("shard",
      floor(col("avg_nll") * granularity).cast("long"))
    val counts = sh.groupBy(col("shard"))
      .agg(count(lit(1)).as("cnt")).pinned
    val wOff = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = counts.withColumn("offset",
      coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("shard"), col("offset"))
    val nTotal = counts.agg(sum(col("cnt")).as("n_total"))
    val wIn = Window.partitionBy(col("shard"))
      .orderBy(col("avg_nll"), col("doc_id"))
    sh.join(broadcast(off), Seq("shard"))
      .withColumn("ppl_rank",
        row_number().over(wIn).cast("long") + col("offset"))
      .join(broadcast(nTotal), lit(true))
      .select(col("doc_id"), col("avg_nll"), col("ppl_rank"),
        (expr(s"(ppl_rank - 1) * $nBuckets div n_total") + 1)
          .cast("int").as("bucket"))
  }

  /** The one hashed-feature bucket-count default, shared by every
    * dsir entry point (batch model, serving, and the streaming sink)
    * — model and serving hashing MUST agree, so the default has one
    * definition. A divisor of 65536 (see [[dsirPerDoc]]). */
  val DsirDefaultBuckets = 1024

  /** DSIR-style hashed-n-gram importance weight (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how target-like its hashed n-gram
    * feature distribution is, as log p_target(f) - log p_raw(f) summed
    * over the doc's features — the importance-resampling weight that
    * selects in-domain training data from a 100 TB crawl given a small
    * trusted corpus. Features are unigrams and adjacent bigrams hashed
    * into `nBuckets` by the portable md5-hex-prefix bucket (the
    * [[trainValTestSplit]] idiom — bit-identical in any engine);
    * the target here is the corpus slice `source = targetSource`
    * (DSIR's trusted corpus), the raw side is everything else.
    * Each side's per-bucket counts get add-one smoothing (every bucket
    * observable, no log of zero), and both logs quantize to
    * floor(log2(count+1)) — exact integers, so the per-doc weight
    * sum is order-independent BIGINT arithmetic. The per-side
    * normalizers log2(N_t), log2(N_r) shift every feature's score by
    * the same constant, so they are folded in per occurrence (weights
    * stay comparable across docs of different lengths after the final
    * per-feature-occurrence division — ONE IEEE division, like every
    * score here).
    *
    * Scale shape: one per-row feature projection over the corpus → ONE
    * (doc_id, bucket, side) count shuffle pinned (Stage.pinned) for its
    * consumers; the two distributions are ONE further aggregate of the
    * bucket frame each; scoring joins shuffle on the bucket id. The
    * bucket tables are nBuckets rows — broadcastable at ANY corpus
    * size (the whole point of feature hashing: model size is fixed by
    * construction, not vocabulary-sized), so both sides broadcast-join
    * onto the per-doc bucket counts. */
  def dsirWeight(docs: DataFrame, targetSource: String,
      nBuckets: Int = DsirDefaultBuckets): DataFrame = {
    val pd = dsirPerDoc(docs, nBuckets).pinned
    dsirScored(pd, dsirDistOf(pd, targetSource), targetSource)
  }

  /** The two-sided hashed-feature distribution as an explicit
    * (bucket, c_t, c_r) RAW-count frame — the model half of
    * [[dsirWeight]], exposed so an incrementally-maintained
    * distribution (graft.streaming.Streams.dsirSink state) can be
    * compared to, or substituted for, the one-shot batch counting.
    * Counts are raw (smoothing happens at scoring) because addition
    * is the merge the streaming fold needs — the quantized logs are
    * not additive. */
  def dsirDist(docs: DataFrame, targetSource: String,
      nBuckets: Int = DsirDefaultBuckets): DataFrame =
    dsirDistOf(dsirPerDoc(docs, nBuckets), targetSource)

  /** [[dsirWeight]] against an EXPLICIT (bucket, c_t, c_r)
    * distribution — the serving half once a trained/maintained
    * distribution exists. Every non-target document scores; feature
    * hashing makes unseen features a non-issue (they land in SOME
    * bucket, smoothed by the +1). CALLER CONTRACT: `nBuckets` must be
    * the bucket count the distribution was BUILT with — bucket ids
    * alone cannot reveal their modulus, so a mismatch cannot be
    * detected here and would score under incompatible hashing. All
    * four dsir entry points share [[DsirDefaultBuckets]] so the
    * defaults cannot drift apart. */
  def dsirWeightWith(docs: DataFrame, dist: DataFrame,
      targetSource: String, nBuckets: Int = DsirDefaultBuckets): DataFrame =
    dsirScored(dsirPerDoc(docs, nBuckets), dist, targetSource)

  /** (doc_id, source, bucket, k) — per-document hashed-feature bucket
    * counts, the shared entry of the DSIR model and serving halves
    * (and the per-batch increment of the streaming fold). */
  private[graft] def dsirPerDoc(docs: DataFrame,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && 65536 % nBuckets == 0,
      s"nBuckets must be a positive divisor of 65536 (the 16-bit md5 " +
        s"prefix is reduced mod nBuckets; a divisor keeps every bucket " +
        s"exactly equiprobable), got $nBuckets")
    // unigrams + bigrams in one per-row pass (the repetition pattern),
    // hashed to a bucket id per occurrence
    docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), explode(expr(
        // the bigram branch is CASE-guarded: a 1-token doc's
        // sequence(0, -1) is DESCENDING in Spark ([0, -1]) and the
        // out-of-bounds w[i+1] lookup THROWS under ANSI mode —
        // slice(w, 1, 0) is the typed empty array for that arm
        "concat(" +
          "transform(w, t -> concat('u:', t)), " +
          "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), " +
          "  i -> concat('b:', w[i], ' ', w[i+1])) ELSE slice(w, 1, 0) END" +
          ")")).as("f"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("f")), 1, 4), 16, 10).cast("long")
          % nBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("k"))
  }

  private def dsirDistOf(pd: DataFrame,
      targetSource: String): DataFrame = {
    val isTarget = col("source") === targetSource
    pd.groupBy(col("bucket"))
      .agg(sum(when(isTarget, col("k")).otherwise(lit(0L))).as("c_t"),
        sum(when(!isTarget, col("k")).otherwise(lit(0L))).as("c_r"))
  }

  private def dsirScored(pd: DataFrame, dist: DataFrame,
      targetSource: String): DataFrame = {
    // nBuckets-row frame: add-one smoothing + bit-length log here, so
    // the stored model stays in the additive raw-count domain
    val qdist = dist.select(col("bucket"),
      (length(bin(col("c_t") + 1)) - 1).cast("long").as("qlog_t"),
      (length(bin(col("c_r") + 1)) - 1).cast("long").as("qlog_r"))
    // LEFT join: under a FOREIGN distribution ([[dsirWeightWith]]) a
    // scored doc can hit a bucket the model never observed — both
    // sides then smooth to count 1 and the occurrence scores 0, it
    // does not silently drop (self-trained scoring never takes the
    // null branch: every scored bucket is in its own distribution)
    pd.where(col("source") =!= targetSource)
      .join(broadcast(qdist), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * (coalesce(col("qlog_t"), lit(0L))
          - coalesce(col("qlog_r"), lit(0L)))).as("w_sum"),
        sum(col("k")).as("n_feats"))
      .select(col("doc_id"), col("w_sum"), col("n_feats"),
        (col("w_sum").cast("double") / col("n_feats"))
          .as("avg_weight"))
  }

  // ---- supervised quality classifier (multinomial Naive Bayes) ---------
  // The classifier-based arm of web-corpus curation (the GPT-3 /
  // LLaMA recipe: a linear classifier scores crawl pages against a
  // trusted positive corpus; Brown et al. 2020 §A, Touvron et al.
  // 2023 §2.1 — "classify Wikipedia-referenced vs random pages").
  // Next to the generative selectors already here (bigram-LM
  // perplexity, DSIR importance weights) this is the DISCRIMINATIVE
  // selector: labeled positive AND negative slices, class priors, and
  // an argmax keep/drop decision. Multinomial NB over raw token
  // counts is the fastText-class linear model whose training is pure
  // counting — one aggregate pass, exactly replayable — and whose
  // model is vocabulary-sized: keyed shuffle joins, NEVER broadcast
  // (the LM-table discipline).

  /** Train the NB model: per-word occurrence counts in the positive
    * and negative training slices — (word, c_p, c_n), one count
    * aggregate over the training corpus. */
  def nbModel(docs: DataFrame, posSource: String,
      negSource: String): DataFrame =
    docs.where(col("source").isin(posSource, negSource))
      .select(col("source"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(sum(when(col("source") === posSource, 1L).otherwise(0L))
          .as("c_p"),
        sum(when(col("source") === negSource, 1L).otherwise(0L))
          .as("c_n"))

  /** Class priors as a 1-row (d_p, d_n) document-count frame — kept a
    * FRAME (not driver literals) so the whole classifier stays one
    * declarative plan; it cross-joins broadcast like every scalar CTE
    * here. */
  def nbPriors(docs: DataFrame, posSource: String,
      negSource: String): DataFrame =
    docs.where(col("source").isin(posSource, negSource))
      .agg(sum(when(col("source") === posSource, 1L).otherwise(0L))
          .as("d_p"),
        sum(when(col("source") === negSource, 1L).otherwise(0L))
          .as("d_n"))

  /** Score documents under an EXPLICIT NB model + priors — the
    * serving half ([[nbClassify]] composes the three). Laplace
    * add-one smoothing and bit-length-quantized logs keep every
    * per-class score an exact BIGINT:
    *
    *   score_c = qlog2(d_c+1) - qlog2(d_p+d_n+2)          (prior)
    *           + sum_w k_w * qlog2(c_wc + 1)              (likelihood)
    *           - n_tokens * qlog2(N_c + V)                (normalizer)
    *
    * with qlog2(x) = floor(log2 x) = bit_length(x) - 1. A word the
    * model never saw smooths to count 1 → qlog2(1) = 0, which is
    * exactly what the LEFT join's coalesce-to-0 contributes — unseen
    * vocabulary is handled by the same arithmetic, not a special
    * case. Ties keep (score_p = score_n → 'keep'), margin is ONE
    * final IEEE division.
    *
    * Scale shape: one token-count shuffle over the scored corpus, one
    * vocabulary-keyed model join (model frames are corpus-vocabulary
    * sized — shuffled, never broadcast), and two 1-row broadcast
    * scalar frames (model totals, priors). */
  def nbScoreWith(docs: DataFrame, model: DataFrame,
      priors: DataFrame): DataFrame = {
    val qmodel = model.select(col("word"),
      (length(bin(col("c_p") + 1)) - 1).cast("long").as("ql_p"),
      (length(bin(col("c_n") + 1)) - 1).cast("long").as("ql_n"))
    // model totals: ONE aggregate of the vocab-sized frame → 1 row
    val qstats = model.agg(sum(col("c_p")).as("n_p"),
        sum(col("c_n")).as("n_n"), count(lit(1)).as("v"))
      .select(
        (length(bin(col("n_p") + col("v"))) - 1).cast("long").as("qd_p"),
        (length(bin(col("n_n") + col("v"))) - 1).cast("long").as("qd_n"))
    val qpriors = priors.select(
      ((length(bin(col("d_p") + 1)) - 1)
        - (length(bin(col("d_p") + col("d_n") + 2)) - 1))
        .cast("long").as("qp_p"),
      ((length(bin(col("d_n") + 1)) - 1)
        - (length(bin(col("d_p") + col("d_n") + 2)) - 1))
        .cast("long").as("qp_n"))
    docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("k"))
      .join(qmodel, Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * coalesce(col("ql_p"), lit(0L))).as("s_p"),
        sum(col("k") * coalesce(col("ql_n"), lit(0L))).as("s_n"),
        sum(col("k")).as("n_tokens"))
      .join(broadcast(qstats), lit(true))
      .join(broadcast(qpriors), lit(true))
      .select(col("doc_id"), col("n_tokens"),
        (col("qp_p") + col("s_p") - col("n_tokens") * col("qd_p"))
          .as("score_p"),
        (col("qp_n") + col("s_n") - col("n_tokens") * col("qd_n"))
          .as("score_n"))
      .withColumn("pred",
        when(col("score_p") >= col("score_n"), lit("keep"))
          .otherwise(lit("drop")))
      .withColumn("margin",
        (col("score_p") - col("score_n")).cast("double")
          / col("n_tokens"))
  }

  /** The deployed composition: train on the labeled slices, score
    * every OTHER source's documents — the classifier-filter pass a
    * crawl-scale pipeline runs after generative filtering. */
  def nbClassify(docs: DataFrame, posSource: String,
      negSource: String): DataFrame = {
    val d = docs.pinned
    nbScoreWith(d.where(!col("source").isin(posSource, negSource)),
      nbModel(d, posSource, negSource),
      nbPriors(d, posSource, negSource))
  }

  /** Calibration card for the NB classifier — the margin-concentration
    * histogram read before choosing a keep threshold: per predicted
    * class, documents bucketed by the sign-split bit length of the
    * INTEGER score difference (qband 0 = exact tie, +-b = difference
    * in [2^b, 2^(b+1))) — a classifier whose mass piles at small
    * bands is barely deciding; one with long positive tails separates
    * cleanly. Exact integers end to end (the float margin never enters
    * the bucketing); one aggregate over the scored frame. */
  def nbCalibration(docs: DataFrame, posSource: String,
      negSource: String): DataFrame =
    nbClassify(docs, posSource, negSource)
      .withColumn("d", col("score_p") - col("score_n"))
      .withColumn("qband", when(col("d") === 0, lit(0L))
        .otherwise(when(col("d") > 0, lit(1L)).otherwise(lit(-1L)) *
          (length(bin(abs(col("d")))) - 1).cast("long")))
      .groupBy(col("pred"), col("qband"))
      .agg(count(lit(1)).as("n_docs"))

  /** BM25 top-k document retrieval for a literal term set — the
    * ranking function behind retrieval-based curation passes
    * (kNN-LM-style example selection, contamination triage against a
    * query suite, targeted corpus audits). Robertson/Spärck Jones
    * BM25 (k1, b as permille constants) made cross-engine exact by
    * clearing every fraction: with N docs, T total tokens (avgdl =
    * T/N), doc length dl and permille constants K, B,
    *
    *   tf_factor = tf*(K+1000)*1000*T
    *             / (tf*1e6*T + K*(1000-B)*T + K*B*dl*N)
    *
    * is the textbook tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) with both
    * sides multiplied by 1e6*T — exact integers, quantized to
    * permille by one integral division, then weighted by the
    * [[tfidfTopTerm]] bit-length idf floor(log2(N div df)). Products
    * reach tf*2.2e9*T ~ 1e25 at corpus scale, so the arithmetic runs
    * in DECIMAL(38,0) (the [[mixTemperature]] discipline; the oracle
    * mirrors with HUGEINT).
    *
    * Scale shape: the token stream filters to QUERY TERMS before the
    * tf aggregate (only matching tokens shuffle); df comes off that
    * tf frame and is bounded by |terms|, broadcast back; N and T are
    * a 1-row broadcast scalar; the final top-k is a global
    * TakeOrderedAndProject with a total-order tie-break — no global
    * window, no corpus-sized broadcast. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1Permille: Long = 1200L, bPermille: Long = 750L): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "query terms must be non-empty and distinct")
    require(bPermille >= 0 && bPermille <= 1000,
      "b is a permille value in [0, 1000]")
    val s = docs.sparkSession
    import s.implicits._
    val dl = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
      .pinned
    val tot = dl.agg(sum(col("dl")).as("t_tok"),
      count(lit(1)).as("n_docs"))
    val tq = broadcast(terms.toDF("word"))
    val tf = tokens(docs).join(tq, Seq("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .pinned
    val df_ = broadcast(tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))) // bounded by |terms|
    bm25Rank(tf.join(df_, Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(tot)), // 1-row scalar frame
      k, k1Permille, bPermille)
  }

  /** Sentinel stats key for the corpus totals row — contains spaces,
    * so it can never collide with a space-split token (the nbSink
    * prior-row discipline). */
  val Bm25Sentinel = " corpus "

  /** The BM25 sufficient statistic of a corpus, as ONE additive
    * frame: (word, df, tok) rows — df = #docs containing the word,
    * tok = 0 — plus the [[Bm25Sentinel]] totals row carrying
    * (n_docs, total_tokens) in the same two columns. Everything is a
    * SUM over per-doc contributions, so the frame folds
    * incrementally (graft.streaming.Streams.bm25Sink maintains it
    * under the registry-guarded additive protocol) and two corpora's
    * stats merge by adding. Vocabulary-sized, shuffle-keyed on word —
    * never broadcast; serving filters it to the query's terms first. */
  def bm25Stats(docs: DataFrame): DataFrame = {
    val d = docs.pinned // word rows + totals row read the corpus once
    val perWord = tokens(d).select(col("doc_id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .withColumn("tok", lit(0L))
    val sent = d.agg(count(lit(1)).as("df"),
        sum(size(split(col("text"), " "))).cast("long").as("tok"))
      .select(lit(Bm25Sentinel).as("word"), col("df"), col("tok"))
    perWord.unionByName(sent)
  }

  /** [[bm25TopK]] served from PRE-BUILT stats ([[bm25Stats]] or a
    * maintained graft.streaming.Streams.bm25StatsState): ranks the
    * BATCH documents with document frequencies and length
    * normalization taken from the stats corpus — the offline-build /
    * online-serve split of a retrieval pass (score fresh documents
    * against the collection's statistics without rescanning the
    * collection). Query terms unseen in the stats corpus drop via the
    * inner df join (no defined idf — the text_lm_cross inner-join
    * convention). Only term-bounded slices of the stats frame and the
    * 1-row totals broadcast; batch-side tf filters to query terms
    * before its aggregate, dl joins by a keyed doc_id shuffle. */
  def bm25TopKWith(batch: DataFrame, stats: DataFrame,
      terms: Seq[String], k: Int = 10, k1Permille: Long = 1200L,
      bPermille: Long = 750L): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "query terms must be non-empty and distinct")
    val s = batch.sparkSession
    import s.implicits._
    val st = stats.pinned // terms slice + totals row, one build
    val tq = broadcast(terms.toDF("word"))
    val dfT = broadcast(st.join(tq, Seq("word"))
      .select(col("word"), col("df"))) // bounded by |terms|
    val tot = broadcast(st.where(col("word") === Bm25Sentinel)
      .select(col("df").as("n_docs"), col("tok").as("t_tok")))
    val dl = batch
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
      .pinned
    val tf = tokens(batch).join(tq, Seq("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    bm25Rank(tf.join(dfT, Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(tot), k, k1Permille, bPermille)
  }

  /** Shared BM25 arithmetic over a joined (doc_id, word, tf, df, dl,
    * t_tok, n_docs) frame — the exact-integer saturation/idf/top-k
    * back half of [[bm25TopK]] and [[bm25TopKWith]]. */
  private def bm25Rank(scored0: DataFrame, k: Int, K: Long,
      B: Long): DataFrame = {
    require(B >= 0 && B <= 1000, "b is a permille value in [0, 1000]")
    scored0
      .withColumn("idf_q",
        (length(bin(expr("n_docs div df"))) - 1).cast("long"))
      .withColumn("sat_permille", expr(
        s"CAST(CAST(tf AS DECIMAL(38,0)) * ${K + 1000L} * 1000 * t_tok" +
          s" * 1000 div (CAST(tf AS DECIMAL(38,0)) * 1000000 * t_tok" +
          s" + CAST(${K * (1000L - B)} AS DECIMAL(38,0)) * t_tok" +
          s" + CAST(${K * B} AS DECIMAL(38,0)) * dl * n_docs) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        sum(col("idf_q") * col("sat_permille")).as("score_q"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Deterministic fixed-size per-stratum carve — n docs per source,
    * chosen uniformly-without-replacement by md5 order (the eval-set /
    * audit-sample primitive: every engine, every run, every machine
    * carves the SAME n docs, and a grown corpus only changes a
    * stratum's picks where new hashes land inside its top-n).
    * [[sampleStratified]] keeps a RATE per stratum; this keeps a
    * COUNT. The rank<=n window compiles to Spark 4's WindowGroupLimit
    * per-partition pre-trim, so a mega-stratum never funnels through
    * one partition before trimming. */
  def sampleTopN(docs: DataFrame, n: Int = 5): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs
      .select(col("source"), col("doc_id"), col("lang"),
        md5(concat(col("doc_id").cast("string"), lit(":topn"))).as("h"))
      .withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= n)
      .drop("h")
  }
}
