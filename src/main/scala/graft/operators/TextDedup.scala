package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication and decontamination operators (exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, winnowing, line/span excision, URL
  * canonicalization) — the near-dup family of [[TextOps]]. Split
  * from the single object purely mechanically. */
private[graft] trait TextDedupOps { this: TextOps.type =>

  /** Exact dedup by content hash (hash-groupBy): one row per distinct
    * text, keeping the lowest doc_id. At 100 TB this is a single
    * shuffle on a 32-char key instead of the full text. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))

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
    // ONE shingle scan for BOTH halves (guide §2.4 — the candidate
    // banding and the exact-Jaccard verify used to re-derive the
    // shingle stream independently): the distinct hash set
    // (collect_set dedups — min/Jaccard are duplicate-invariant) and
    // the 16 min-md5 signature lanes aggregate together per doc, in
    // one map-side-combined doc-keyed shuffle, and the pinned frame
    // is doc-cardinality (8-byte surrogates + 16 digests — never
    // shingle text). ds/sz/bands all project from it.
    val sigAggs = (0 until MinhashK).map(k =>
      min(md5(concat(col("s"), lit(s":$k")))).as(s"m$k"))
    val perDoc = shinglesRaw(docs)
      .select(col("doc_id"), col("s"), xxhash64(col("s")).as("h"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"), sigAggs: _*)
      .pinnedLazy
    val ds = perDoc.select(col("doc_id"), explode(col("hs")).as("h"))
    val cand = cappedBandPairs(minhashBands(perDoc),
      Seq("band_idx", "band_hash"))
    val sz = perDoc.select(col("doc_id"),
      size(col("hs")).cast("long").as("n"))
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
    val d = docs.pinnedLazy
    val d1 = d.join(dedupExact(d)
        .select(col("kept_doc_id").as("doc_id")), Seq("doc_id"))
      .pinnedLazy
    val d2 = d1.join(dedupBagOfWords(d1)
        .select(col("kept_doc_id").as("doc_id")), Seq("doc_id"))
      .pinnedLazy
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
      .pinnedLazy // size branch + pruned-verify branch
    val bset = shinglesRaw(benchmark)
      .select(xxhash64(col("s")).as("h")).distinct()
      .pinnedLazy // cardinality, sketch build, and the exact verify join
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
      .pinnedLazy
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
      .pinnedLazy // counted alone and joined against the banded set
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
      .pinnedLazy
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
      threshold: Double): DataFrame =
    jaccardFromSizes(
      sets.groupBy(col("doc_id")).agg(count(lit(1)).as("n")),
      inter, threshold)

  /** [[jaccardFromInter]] with the per-doc set sizes `(doc_id, n)`
    * supplied directly — for callers that already hold the sets as
    * per-doc arrays, where `size(hs)` is free and re-counting the
    * exploded rows would add a shuffle. */
  private def jaccardFromSizes(sz: DataFrame, inter: DataFrame,
      threshold: Double): DataFrame = {
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
    // 8-byte xxhash64 surrogates, not the shingle strings: the set
    // shuffle and both intersection join sides move longs instead of
    // ~25-byte text. Results equal the string-set answer unless two
    // DIFFERENT shingles of the same doc pair collide in 64 bits
    // (p ~ n_doc_shingles^2 / 2^64 — vanishing; md5-based signatures
    // and the oracle parity are unaffected by the surrogate choice).
    //
    // ONE shingle scan for BOTH halves (guide §2.4, same merge as
    // [[minhashBandSweep]]): the distinct hash set (collect_set
    // dedups; min/Jaccard are duplicate-invariant) and the 16 min-md5
    // signature lanes aggregate together per doc in one
    // map-side-combined doc-keyed shuffle — the standalone distinct
    // exchange and the second tokenize pass fold away. The pinned
    // frame is doc-cardinality (8-byte surrogates + 16 digests, never
    // shingle text); ds, sizes, and bands all project from it.
    val sigAggs = (0 until MinhashK).map(k =>
      min(md5(concat(col("s"), lit(s":$k")))).as(s"m$k"))
    val perDoc = shinglesRaw(docs)
      .select(col("doc_id"), col("s"), xxhash64(col("s")).as("h"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"), sigAggs: _*)
      .pinnedLazy
    val ds = perDoc.select(col("doc_id"), explode(col("hs")).as("h"))
    val sz = perDoc.select(col("doc_id"),
      size(col("hs")).cast("long").as("n"))
    val cand = cappedBandPairs(minhashBands(perDoc),
      Seq("band_idx", "band_hash"), bucketCap)
    jaccardFromSizes(sz, interFromCandidates(ds, cand), threshold)
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
      .pinnedLazy
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

  /** EXACT all-pairs similarity self-join with GUARANTEED recall —
    * the member [[nearDupNgramJaccard]]'s own docstring concedes it
    * is not ("the exact prefix length for guaranteed recall depends
    * on each set's size"). Here the prefix length IS that exact
    * length: p = n - ceil(t·n) + 1 over ONE global rarest-first
    * shingle order (Bayardo et al., "Scaling Up All Pairs Similarity
    * Search", WWW 2007; Xiao et al., WWW 2008) — a pair at
    * Jaccard >= t has overlap >= t·max(na, nb), so skipping the p-1
    * highest-ordered shingles of each doc still leaves a shared one
    * (pigeonhole): the candidate join is COMPLETE, and every
    * candidate verifies against the full distinct shingle sets. The
    * oracle replays BRUTE FORCE (every shingle-sharing pair, no
    * prefix anywhere), so row equality is a machine proof of the
    * filter's completeness each round, not just its precision.
    *
    * Scale shape: prefix entries are each doc's ~(1-t) RAREST
    * shingles (the frequency-ascending order concentrates join keys
    * on low-frequency tokens), the size filter
    * (min·1000 >= t‰·max) prunes cross-size pairs before the
    * verification join, and every stage is a keyed shuffle. No
    * exchange carries raw shingle text (the dedupSpans payload-width
    * discipline): the set key is the 16-byte `unhex(md5(s))` digest —
    * bounded per row where a shingle is unbounded, and 128-bit where
    * the capped routes' 64-bit xxhash64 would hand this EXACT family
    * a birthday bound at corpus scale. The digest ranks the prefix
    * tie-break and keys every join; the brute-force oracle replays
    * raw shingles, so the row equality also machine-checks the digest
    * for collisions each round. The threshold rounds DOWN to permille
    * for the integer prefix/size arithmetic (a floor can only
    * lengthen the prefix — more candidates, never a miss); the final
    * keep is the same IEEE `jaccard >= threshold` as every sibling.
    * Worst case (a template corpus whose docs share their rarest
    * shingles) is quadratic IN THE ANSWER — an exact join cannot cap
    * without losing exactness; the capped routes ([[nearDupMinhash]],
    * [[nearDupNgramJaccard]]) are the fallback when the answer itself
    * is quadratic. */
  def allPairsExact(docs: DataFrame, threshold: Double = 0.7)
      : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val t = math.floor(threshold * 1000).toLong.max(1L)
    val ds = digestSets(docs)
      .pinnedLazy // prefix ranking, frequency, sizes, and verify — one set
    val cand = prefixCandidates(ds, ds, t, selfJoin = true)
    jaccardFromInter(ds, interFromCandidates(ds, cand), threshold)
  }

  /** Distinct (doc_id, h) shingle sets keyed by the 16-byte md5
    * digest — the exact family's shared front end. The digest is
    * computed BEFORE the first exchange, so no shuffle in any
    * downstream stage carries raw shingle text. */
  private[graft] def digestSets(docs: DataFrame): DataFrame =
    shinglesRaw(docs)
      .select(col("doc_id"), unhex(md5(col("s"))).as("h"))
      .distinct()

  /** The COMPLETE Bayardo/Xiao prefix-filter candidate pairs behind
    * [[allPairsExact]]/[[allPairsJoin]]: both sides' prefixes rank
    * under ONE shared rarest-first order (frequencies over the union
    * of both sides — a pair at Jaccard >= t‰ keeps a shared token
    * inside both prefixes by pigeonhole only when the order is
    * common), joined on the digest key with the permille size filter.
    * `selfJoin = true` adds the `doc_a < doc_b` dedup of the
    * self-join shape. Exposed `private[graft]` for the scale probe:
    * candidate volume vs the brute-force pair count is the filter's
    * measured selectivity. */
  private[graft] def prefixCandidates(dsa: DataFrame, dsb: DataFrame,
      t: Long, selfJoin: Boolean): DataFrame = {
    val freq =
      (if (selfJoin) dsa.select(col("h"))
       else dsa.select(col("h")).unionAll(dsb.select(col("h"))))
        .groupBy(col("h")).agg(count(lit(1)).as("f"))
    def pref(ds: DataFrame): DataFrame = {
      val sz = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      ds.join(freq, Seq("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("f"), col("h"))))
        .join(sz, Seq("doc_id"))
        .where(col("rn") <= expr(s"n - ((n * $t + 999) div 1000) + 1"))
        .select(col("h"), col("doc_id"), col("n"))
    }
    val pa = pref(dsa)
    val pb = if (selfJoin) pa else pref(dsb)
    pa.as("a").join(pb.as("b"),
        col("a.h") === col("b.h") &&
          (if (selfJoin) col("a.doc_id") < col("b.doc_id") else lit(true)) &&
          col("a.n") * lit(1000L) >= col("b.n") * lit(t) &&
          col("b.n") * lit(1000L) >= col("a.n") * lit(t))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** The CONTAINED-side prefix behind [[containmentPairs]]/
    * [[containmentJoin]]: each doc keeps its na - ceil(t‰·na) + 1
    * rarest-under-`freq` digests (unseen digests rank first at
    * f = 0 — the subset-size pigeonhole holds under ANY order, the
    * ranking is purely a candidate-volume lever). Output (h, doc_id,
    * na_). */
  private def containedPrefix(dsa: DataFrame, freq: DataFrame,
      t: Long): DataFrame = {
    val sza = dsa.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    dsa.join(freq, Seq("h"), "left")
      .withColumn("f", coalesce(col("f"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("f"), col("h"))))
      .join(sza, Seq("doc_id"))
      .where(col("rn") <= expr(s"n - ((n * $t + 999) div 1000) + 1"))
      .select(col("h"), col("doc_id"), col("n").as("na_"))
  }

  /** The containment candidate join: prefix(contained) x full
    * posting lists, with the one-directional size filter (a
    * container smaller than t‰·na cannot qualify — n_common <= nb;
    * flooring only admits) and the self-join identity guard. */
  private def containedCandidates(pref: DataFrame, dsb: DataFrame,
      t: Long, selfJoin: Boolean): DataFrame = {
    val szb = dsb.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    pref.as("a").join(dsb.join(szb, Seq("doc_id")).as("b"),
        col("a.h") === col("b.h") &&
          (if (selfJoin) col("a.doc_id") =!= col("b.doc_id")
           else lit(true)) &&
          col("b.n") * lit(1000L) >= col("a.na_") * lit(t))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact intersection counts of candidate pairs across TWO set
    * frames — [[interFromCandidates]]' cross-corpus form. */
  private def crossInter(dsa: DataFrame, dsb: DataFrame,
      cand: DataFrame): DataFrame =
    cand
      .join(dsb.as("sb"), col("doc_b") === col("sb.doc_id"))
      .join(dsa.as("sa"),
        col("doc_a") === col("sa.doc_id") && col("sb.h") === col("sa.h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))

  /** Attach both sides' set sizes to intersection counts. */
  private def sizedPairs(inter: DataFrame, dsa: DataFrame,
      dsb: DataFrame): DataFrame =
    inter
      .join(dsa.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(dsb.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))

  /** The IEEE containment keep over sized pairs. */
  private def containmentKeep(sized: DataFrame,
      threshold: Double): DataFrame =
    sized
      .withColumn("containment",
        col("n_common") / col("na").cast("double"))
      .where(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"), col("containment"))

  /** EXACT containment self-join — [[allPairsExact]]'s asymmetric
    * sibling: every ordered pair where doc_a's distinct shingle set
    * is at least `threshold`-contained in doc_b's
    * (|A∩B| / |A| >= t) — the "mostly-quoted / boilerplate superset"
    * detector a curation pass runs to drop documents subsumed by
    * others, which symmetric Jaccard misses when the container is
    * much larger (a doc fully quoted inside one 10x its size has
    * Jaccard <= 0.1 but containment 1.0).
    *
    * Same prefix principle, contained-side only: overlap >= t·na
    * means skipping doc_a's p-1 = na - ceil(t·na) highest-ordered
    * shingles still leaves a shared one, so candidates are
    * prefix(A) x full(B) on the shingle key — complete by pigeonhole;
    * the container side cannot be prefix-trimmed (its size gives no
    * overlap bound), which is the algorithm's honest asymmetric cost:
    * the candidate join keys on each prefix shingle's FULL posting
    * list. Every exchange carries the 16-byte md5 digest, never raw
    * shingle text (the [[allPairsExact]] payload discipline; the
    * brute-force oracle replays raw shingles, so row equality also
    * machine-checks the digest for collisions). Verification is exact
    * over the full sets; the threshold floors to permille for the
    * prefix arithmetic and the final keep is IEEE
    * `containment >= threshold`. The oracle replays brute force (all
    * intersecting ordered pairs), machine-proving completeness each
    * round. */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.9)
      : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val t = math.floor(threshold * 1000).toLong.max(1L)
    val ds = digestSets(docs).pinnedLazy
    val freq = ds.groupBy(col("h")).agg(count(lit(1)).as("f"))
    val cand = containedCandidates(containedPrefix(ds, freq, t), ds,
      t, selfJoin = true)
    containmentKeep(
      sizedPairs(interFromCandidates(ds, cand), ds, ds), threshold)
  }

  /** EXACT cross-corpus similarity join — [[allPairsExact]] between
    * TWO corpora (a fresh batch vs a held-out benchmark, this crawl
    * vs the last one): every (left, right) pair at Jaccard >=
    * `threshold`, recall-guaranteed. The prefix applies on BOTH
    * sides under one SHARED order (frequencies from the union — the
    * order must be common or the pigeonhole argument breaks), so a
    * qualifying pair shares a token inside both prefixes
    * (overlap >= t·max(na, nb) survives removing p-1 tokens from
    * EACH side when both prefixes derive from the same global
    * order — [[prefixCandidates]] computes the union frequency).
    * Output (doc_a = left, doc_b = right, n_common, na, nb,
    * jaccard); id domains may overlap (they key different corpora).
    * Same integer-floor prefix arithmetic, 16-byte digest keys, and
    * IEEE keep as the self-join; the oracle replays brute force. */
  def allPairsJoin(left: DataFrame, right: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val t = math.floor(threshold * 1000).toLong.max(1L)
    val dsa = digestSets(left).pinnedLazy
    val dsb = digestSets(right).pinnedLazy
    val cand = prefixCandidates(dsa, dsb, t, selfJoin = false)
    sizedPairs(crossInter(dsa, dsb, cand), dsa, dsb)
      .withColumn("jaccard", col("n_common") /
        (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"), col("jaccard"))
  }

  /** EXACT cross-corpus containment join — [[containmentPairs]]
    * between TWO corpora: every ordered pair (doc_a in `contained`,
    * doc_b in `containers`) with |A∩B| / |A| >= `threshold`. THE
    * decontamination shape, recall-GUARANTEED where
    * [[decontaminate]]'s thresholding is over exact containment but
    * [[nearDupNgramJaccard]]-style blocking heuristics are not: drop
    * training docs mostly quoted from a benchmark corpus, or audit a
    * crawl against a licensed-content list, with a machine-checkable
    * completeness story.
    *
    * The prefix trims the CONTAINED side only, and the subset-SIZE
    * pigeonhole needs no shared order at all: a qualifying pair has
    * |A∩B| >= ceil(t·na), and A keeps na - ceil(t·na) + 1 of its
    * shingles, leaving only ceil(t·na) - 1 outside — any such subset
    * intersects every qualifying overlap. The ranking order is
    * therefore free, and it ranks by CONTAINER-side document
    * frequency (unseen shingles first at f = 0) purely to shrink the
    * candidate join's posting lists. The size filter prunes
    * containers smaller than t‰·na (n_common <= nb — they cannot
    * qualify; flooring only admits, never drops). Digest keys,
    * brute-force oracle, IEEE keep — the [[allPairsJoin]]
    * discipline; id domains may overlap (they key different
    * corpora). */
  def containmentJoin(contained: DataFrame, containers: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val t = math.floor(threshold * 1000).toLong.max(1L)
    val dsa = digestSets(contained).pinnedLazy
    val dsb = digestSets(containers).pinnedLazy
    val freq = dsb.groupBy(col("h")).agg(count(lit(1)).as("f"))
    val cand = containedCandidates(containedPrefix(dsa, freq, t), dsb,
      t, selfJoin = false)
    containmentKeep(
      sizedPairs(crossInter(dsa, dsb, cand), dsa, dsb), threshold)
  }

  /** The curation ACTION on [[containmentPairs]]: drop every document
    * `threshold`-contained in a (size, id)-GREATER container, keep
    * the rest. The strict order makes the rule well-defined in one
    * pass: mutual containment (near-set-equality) drops exactly the
    * (size, id)-smaller doc, a containment chain keeps at least its
    * maximal element (acyclicity — no iteration, no fixpoint), and a
    * doc contained only in docs that themselves drop still drops
    * (the greedy one-pass semantics, stated rather than hidden: its
    * container's container holds ~the same content). Output is the
    * surviving documents verbatim. */
  def dropContained(docs: DataFrame, threshold: Double = 0.9)
      : DataFrame = {
    val dropped = containmentPairs(docs, threshold)
      .where(col("nb") > col("na") ||
        (col("nb") === col("na") && col("doc_b") < col("doc_a")))
      .select(col("doc_a").as("doc_id")).distinct()
    docs.join(dropped, Seq("doc_id"), "left_anti")
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
    val sig = minhashSignature(docs).pinnedLazy
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
      .pinnedLazy
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("grp"))
      .pinnedLazy
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
        .pinnedLazy
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
    val d = docs.pinnedLazy
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
    val lines = docLines(docs, textCol).pinnedLazy
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
    val sh = simhash(docs).pinnedLazy
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
    val sh = simhash(docs).pinnedLazy
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
      .pinnedLazy // reused by the size and the overlap branch
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
    val fp = winnowing(docs, k, w).pinnedLazy
    val dfc = fp.groupBy(col("fingerprint")).agg(count(lit(1)).as("df"))
    val fpk = fp.join(dfc.where(col("df") <= maxDf), Seq("fingerprint"))
      .select(col("doc_id"), col("fingerprint").as("h"))
      .pinnedLazy
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
    * once and pinned (Stage.pinnedLazy) for their three consumers;
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
      .pinnedLazy
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
    // out-of-bounds slice). The window key is the 16-byte digest, not
    // the 32-char hex — equality is unchanged, the stats exchanges
    // carry half the key bytes.
    val occ = w.where(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $k), i -> " +
          s"struct(i AS pos, " +
          s"unhex(md5(concat_ws(' ', slice(w, i + 1, $k)))) AS sh))"))
        .as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.sh").as("sh"))
    val stats = occ.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(col("doc_id")).as("min_doc"))
    // excised occurrences -> the token positions they cover (repeats
    // collapse inside the rebuild's per-doc set aggregate)
    val covered = occ.join(stats, Seq("sh"))
      .where(col("df") >= 2 && col("doc_id") =!= col("min_doc"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
    exciseRebuild(docs, covered)
  }

  /** Shared rebuild tail of the span-excision operators
    * ([[dedupSpans]], [[cleanRepetition]]): documents re-emitted from
    * their UNCOVERED token positions. `covered` is the exploded
    * (doc_id, pos) stream of excised positions (repeats allowed —
    * the per-doc collect_set dedups, so callers skip their own
    * distinct shuffle). The covered set aggregates to ONE doc-keyed
    * integer-array row and the kept positions, rebuilt text, and
    * segment count all compute INSIDE the row (array_except keeps
    * first-argument order and positions are unique, so the kept walk
    * is the ascending-position walk): where the exploded form
    * anti-joined every token row and re-collected per doc, token
    * text now never rides an exchange at all — only positions do
    * (guide §2.3, shuffle metadata instead of payloads; §2.4, the
    * token-level anti-join + collect_list shuffles are removed
    * outright). Null-text docs keep the exploded form's surface:
    * null counts, 0 segments, empty text_clean. */
  private[operators] def exciseRebuild(docs: DataFrame,
      covered: DataFrame): DataFrame = {
    val cov = covered.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("cpos"))
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"), expr(
        "array_except(sequence(0, size(w) - 1), " +
          "coalesce(cpos, CAST(array() AS ARRAY<INT>)))").as("kp"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kp"))).cast("long").as("n_removed"),
        // contiguous kept runs: 1 + number of position gaps > 1 (the
        // i >= 1 indices are always in bounds, so no ANSI guard needed
        // beyond the size >= 2 CASE)
        coalesce(expr("CASE WHEN size(kp) >= 2 THEN CAST(1 + size(filter(" +
          "transform(sequence(1, size(kp) - 1), " +
          "i -> kp[i] - kp[i-1]), d -> d > 1)) AS BIGINT) " +
          "ELSE CAST(size(kp) AS BIGINT) END"), lit(0L)).as("n_segments"),
        expr("concat_ws(' ', transform(kp, i -> w[i]))").as("text_clean"),
        ((size(col("w")) - size(col("kp"))).cast("double") /
          size(col("w"))).as("removed_frac"))
  }

  /** Per-source dedup funnel — the data-card companion of
    * [[dedupSurvivors]] (release notes report what dedup REMOVED per
    * source, not just what survived): docs and token mass kept vs
    * dropped for every source, with the drop rate as one final
    * division. The loser set is dup-mass-sized; everything else is
    * one count aggregate per side. */
  def dedupReport(docs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val d = docs.pinnedLazy
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
}
