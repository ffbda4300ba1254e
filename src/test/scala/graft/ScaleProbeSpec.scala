package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingOps, TextOps}

/** Scale probe for the dedup family: the 100 TB claims ("no
  * doc-cardinality frame is broadcast", "every shuffle keeps the
  * configured parallelism") pinned by PLAN assertions over a corpus
  * 10x the bench scale — not just by reading the code. The corpus is
  * generated, not loaded: plan shape is size-independent, but building
  * the frames here also proves the operators' EAGER steps (shingle-set
  * checkpoint, Lloyd training, BPE rounds) complete at 10x sf0.1.
  *
  * The probe walks the physical tree (not the rendered string): AQE
  * wraps the plan, so the initial physical plan is unwrapped first —
  * what the optimizer was ASKED to do, before size-dependent runtime
  * re-planning. */
class ScaleProbeSpec extends SparkSpec {

  /** 10x the sf0.1 documents cardinality: ~40-token docs over a
    * shared 1000-word vocabulary, hash-derived (deterministic, no
    * files). */
  private def syntheticDocs(n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr(
        "transform(sequence(0, 39), " +
          "i -> concat('w', pmod(xxhash64(id * 40 + i), 1000)))"))
        .as("text"),
      lit("en").as("lang"), lit("syn").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** 10x the sf0.1 embeddings cardinality, hash-derived vectors in
    * [-1, 1). 16-dim default keeps the generic probes cheap; the PQ
    * routes pass the real 64-dim shape (fixed 16-component
    * subspaces). */
  private def syntheticEmb(n: Long, dim: Int = 16): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), i -> " +
        s"cast((pmod(xxhash64(id * $dim + i), 2000) - 1000) / 1000.0 " +
        "as float))").as("embedding"),
      expr("cast(pmod(id, 5) as int)").as("label"))

  /** Build a frame with AQE off (under AQE the executed plan is an
    * opaque adaptive wrapper whose exchanges materialize lazily) and
    * SIZE-based auto-broadcast off: at test scale the optimizer may
    * legitimately auto-broadcast a frame its statistics prove tiny —
    * the very decision that flips to a shuffle at 100 TB — so the
    * probe silences the size heuristic and pins what the plan ASKS
    * for. Any BroadcastExchange that survives comes from an explicit
    * broadcast() hint in operator code, which is exactly the claim
    * under test. */
  private def staticPlanOf(build: => DataFrame): SparkPlan = {
    val keys = Seq("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val before = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try build.queryExecution.executedPlan
    finally before.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** The shared probe: every shuffle keeps the session's configured
    * partition count (a stage collapsing to 1 partition is the
    * distributed-operator equivalent of a driver loop), and no
    * cartesian product anywhere. */
  private def assertShuffleHealth(name: String, plan: SparkPlan): Unit = {
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.nonEmpty, s"$name: no shuffle found — not distributed?")
    parts.foreach(p => assert(p == expected,
      s"$name: a shuffle collapsed to $p partition(s), expected $expected"))
    val cartesian = plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }
    assert(cartesian.isEmpty, s"$name plans a CartesianProduct")
  }

  private def broadcastSubtrees(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect {
      case b: org.apache.spark.sql.execution.exchange
          .BroadcastExchangeExec => b.child
    }

  test("nearDupMinhash at 10x sf0.1: keyed shuffles throughout, zero broadcasts") {
    val plan =
      staticPlanOf(TextOps.nearDupMinhash(syntheticDocs(50000L)))
    assertShuffleHealth("nearDupMinhash", plan)
    // every frame in the route is doc- or shingle-cardinality; none
    // may be broadcast at any corpus size
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"nearDupMinhash broadcasts ${bc.length} corpus-derived frame(s)")
  }

  test("cappedBandPairs bounds candidate volume on a template-spam mega-bucket") {
    // the r11 scale finding: one boilerplate page duplicated B times
    // puts B identical signatures in the same bucket in EVERY band —
    // all-pairs candidate generation would emit B(B-1)/2 pairs
    // (~12.5M at B=5000, 5e11 at B=1e6). The cap must route the
    // bucket to exactly B-1 hub-star pairs: candidate volume O(B).
    val n = 5000L
    val spam = spark.range(n).select(col("id").as("doc_id"),
      lit("spam template page click here to win a free prize now")
        .as("text"))
    val cand = TextOps.cappedBandPairs(
      TextOps.minhashBands(TextOps.minhashSignature(spam)),
      Seq("band_idx", "band_hash"), bucketCap = 64)
    assert(cand.count() === n - 1,
      "an oversized bucket must yield B-1 hub-star candidates, " +
        "not B(B-1)/2 all-pairs")
    // end-to-end: identical docs verify at jaccard 1.0, so the
    // near-dup output is exactly the star...
    val pairs = TextOps.nearDupMinhash(spam, 0.7, bucketCap = 64)
    assert(pairs.count() === n - 1)
    // ...and downstream grouping still sees ONE cluster through the
    // hub — the spanning-structure argument the star routing rests on
    val grp = TextOps.dupGroups(
      pairs.select(col("doc_a"), col("doc_b")))
    assert(grp.select(col("group_id")).distinct().count() === 1L)
    assert(grp.count() === n)
  }

  test("star-pair verification spreads a mega-bucket hub across tasks: " +
    "per-task shuffle volume is O(B), never O(B x |hub set|)") {
    // the r12/r13 carried scale hazard: all B-1 star pairs of a capped
    // mega-bucket carry doc_a = hub, so a verify join that expanded
    // the doc_a side on its single key would make ONE task own
    // (B-1) x |hub's shingle set| rows. interFromCandidates expands
    // the member side first and joins the hub side on the COMPOSITE
    // key (doc_a, h), spreading the hub across its shingle hashes.
    // Measured, not inferred: per-task shuffle read AND write over the
    // whole route must stay within a small multiple of B — the
    // single-key order writes (B-1)*|H| ~ 9B rows from one task and
    // fails the bound.
    val n = 5000L
    val setSize = 9L // 11 fixture tokens -> 9 trigram shingles
    val spam = spark.range(n).select(col("id").as("doc_id"),
      lit("spam template page click here to win a free prize now")
        .as("text"))
    val maxRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val totWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          val w = m.shuffleWriteMetrics.recordsWritten
          maxRead.getAndUpdate(c => math.max(c, r))
          maxWrite.getAndUpdate(c => math.max(c, w))
          totWrite.addAndGet(w)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // run under the SCALE plan, measured at runtime: 32
    // production-shaped partitions (at the suite's 4, benign
    // co-location of distinct keys dominates the per-key argument)
    // and no broadcast joins (at fixture scale the set side fits the
    // broadcast threshold, the verify expansion stays inside one
    // stage, and nothing reaches a shuffle to measure — at corpus
    // scale that side is data-sized and always shuffles)
    val tuned = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = tuned.map { case (k, _) => k -> spark.conf.get(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      assert(TextOps.nearDupMinhash(spam, 0.7, bucketCap = 64)
        .count() === n - 1)
      // task-end events deliver asynchronously: wait until the
      // observed volume covers the verify stage's intermediate rows
      // (pairs x member-set expansion), so a too-early read cannot
      // pass the bound vacuously
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (totWrite.get() < (n - 1) * setSize &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
      // let stragglers land before reading the maxima (late events can
      // only strengthen the assertion's coverage, never flake it)
      var settled = totWrite.get()
      var same = 0
      while (same < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val now = totWrite.get()
        if (now == settled) same += 1 else { settled = now; same = 0 }
      }
      assert(totWrite.get() >= (n - 1) * setSize,
        s"listener saw only ${totWrite.get()} shuffle-write records — " +
          "the verify expansion never reached a shuffle")
      // O(B) bound with slack for key co-location (|H| distinct
      // (hub, h) keys hash into 32 partitions) and for the band
      // window's whole-bucket reads — both linear in B. The broken
      // order concentrates ~9B rows in one task and fails either arm.
      val bound = 4L * n
      assert(maxRead.get() <= bound,
        s"one task read ${maxRead.get()} shuffle records (> $bound): " +
          "the mega-bucket hub is concentrating on a single key")
      assert(maxWrite.get() <= bound,
        s"one task wrote ${maxWrite.get()} shuffle records (> $bound): " +
          "the mega-bucket hub is concentrating on a single key")
    } finally {
      prior.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("nearDupCosineLsh bounds pair volume on a duplicated-vector mega-bucket") {
    // the embedding twin of the text-band cap: one vector duplicated
    // B times lands B copies in ONE sign bucket — the capped route
    // must emit B-1 hub-star pairs (all at cos 1.0), not B(B-1)/2
    val n = 5000L
    val spam = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), i -> " +
        "cast((pmod(xxhash64(i * 7 + 3), 2000) - 1000) / 1000.0 " +
        "as float))").as("embedding"),
      lit(0).as("label"))
    val pairs = EmbeddingOps.nearDupCosineLsh(spam, threshold = 0.99)
    assert(pairs.count() === n - 1,
      "an oversized sign bucket must yield B-1 hub-star pairs")
  }

  test("lshNearestNeighbor bounds scored candidates on a mega-bucket " +
    "and pre-trims the candidate prefix in-plan") {
    // NN serving cannot hub-star (the answer is per-vector), so its
    // bound is on the CANDIDATE side: at most cap prefix members per
    // bucket are scored. A 5000-copy identical-vector bucket must
    // still answer every vector exactly (cos 1.0 with a prefix
    // member) at B*cap cost, not B^2.
    val n = 5000L
    val spam = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), i -> " +
        "cast((pmod(xxhash64(i * 7 + 3), 2000) - 1000) / 1000.0 " +
        "as float))").as("embedding"),
      lit(0).as("label"))
    val nn = EmbeddingOps.lshNearestNeighbor(spam).collect()
    assert(nn.length === n)
    assert(nn.forall(r => r.getAs[Double]("cos") == 1.0 &&
      r.getAs[Long]("nn_id") != r.getAs[Long]("vec_id")))
    // both the candidate-prefix trim and the best-NN pick must run as
    // rank-limit pre-trims (WindowGroupLimit), never full sorts
    val plan = staticPlanOf(
      EmbeddingOps.lshNearestNeighbor(syntheticEmb(50000L)))
    val wgl = plan.collect {
      case g: org.apache.spark.sql.execution.window
          .WindowGroupLimitExec => g
    }
    assert(wgl.length >= 2,
      s"expected candidate-prefix + best-NN WindowGroupLimits, found ${wgl.length}")
  }

  test("semanticDedup at 10x sf0.1: only centroid-cardinality frames broadcast") {
    val plan =
      staticPlanOf(EmbeddingOps.semanticDedup(syntheticEmb(50000L)))
    assertShuffleHealth("semanticDedup", plan)
    // the trained quantizer (cent_id, cq, cn) is the ONE legitimate
    // broadcast — bounded by nCentroids, not the corpus. Identify it
    // by output: a broadcast subtree without cent_id in its output is
    // a corpus-derived frame leaking into a broadcast.
    val bc = broadcastSubtrees(plan)
    bc.foreach { sub =>
      assert(sub.output.map(_.name).contains("cent_id"),
        "semanticDedup broadcasts a non-centroid frame with columns " +
          sub.output.map(_.name).mkString("[", ", ", "]"))
    }
    // the per-cell pair join itself must be a keyed shuffle join: the
    // corpus appears on BOTH sides, so neither side may broadcast
    // (both sides of every broadcast here are centroid frames)
    assert(bc.size <= 2,
      s"semanticDedup broadcasts ${bc.size} frames; expected at most " +
        "the assignment's centroid frame(s)")
  }

  test("every other near-dup route at 10x sf0.1: keyed shuffles, zero broadcasts") {
    // the same probe over the rest of the dedup family — every frame
    // in these routes is doc-, shingle-, or fingerprint-cardinality
    // (df caps and prefix blocks shrink CANDIDATES, not frames), so
    // none may broadcast at any corpus size
    val docs = syntheticDocs(50000L)
    val bench = syntheticDocs(2000L)
    Seq[(String, () => DataFrame)](
      "nearDupNgramJaccard" -> (() => TextOps.nearDupNgramJaccard(docs)),
      "nearDupSimhash" -> (() => TextOps.nearDupSimhash(docs)),
      "nearDupWinnowing" -> (() => TextOps.nearDupWinnowing(docs)),
      "dupNgramSpans" -> (() => TextOps.dupNgramSpans(docs)),
      // the benchmark side collapses to a distinct shingle SET, but it
      // grows with the benchmark suite — keyed shuffle, not broadcast
      "decontaminate" -> (() => TextOps.decontaminate(docs, bench)))
      .foreach { case (name, build) =>
        val plan = staticPlanOf(build())
        assertShuffleHealth(name, plan)
        val bc = broadcastSubtrees(plan)
        assert(bc.isEmpty,
          s"$name broadcasts ${bc.length} corpus-derived frame(s)")
        // payload-width probe for the hash-surrogate routes: their
        // shingle-keyed shuffles must carry the 8-byte surrogate, not
        // raw shingle text (the dedupSpans discipline)
        if (Set("dupNgramSpans", "decontaminate",
            "nearDupNgramJaccard").contains(name))
          plan.collect {
            case e: org.apache.spark.sql.execution.exchange
                .ShuffleExchangeExec => e.child.output.map(_.name)
          }.foreach { cols =>
            assert(!cols.contains("s"),
              s"$name shuffles the raw shingle string: " +
                cols.mkString("[", ", ", "]"))
          }
      }
  }

  test("ANN serving routes at 10x sf0.1: only bounded-cardinality frames broadcast") {
    // every broadcast in the serving family must be bounded by a
    // CONSTRUCTION parameter (nQueries, nCentroids, planes, kc*M) —
    // never by the corpus. Identify each by a column only the bounded
    // frame carries; a broadcast subtree without it is a corpus frame
    // leaking into a broadcast.
    val emb = syntheticEmb(50000L, dim = 64)
    Seq[(String, () => DataFrame, String)](
      // the query batch (vec_id < nQueries) broadcasts; corpus side streams
      ("annTopK", () => EmbeddingOps.annTopK(emb), "query_id"),
      // the coarse quantizer broadcasts; cells join by keyed shuffle
      ("ivfTopK", () => EmbeddingOps.ivfTopK(emb), "cent_id"),
      // codebooks (kc*M rows) and the query LUT broadcast; ADC
      // scoring joins the corpus codes by keyed shuffle
      ("pqTopK", () => EmbeddingOps.pqTopK(emb), "code"),
      // the hyperplane table broadcasts; bucket self-join shuffles
      ("lshNearestNeighbor",
        () => EmbeddingOps.lshNearestNeighbor(emb), "plane"),
      ("lshNearestNeighborMultiprobe",
        () => EmbeddingOps.lshNearestNeighborMultiprobe(emb), "plane"))
      .foreach { case (name, build, mark) =>
        val plan = staticPlanOf(build())
        assertShuffleHealth(name, plan)
        broadcastSubtrees(plan).foreach { sub =>
          assert(sub.output.map(_.name).contains(mark),
            s"$name broadcasts a frame without '$mark' — columns " +
              sub.output.map(_.name).mkString("[", ", ", "]"))
        }
      }
  }

  test("ivfpqTopK at 10x sf0.1: every broadcast is a quantizer/query frame, " +
    "never the corpus") {
    // the composite's broadcasts: coarse centroids (cent_id / cell),
    // residual codebooks (code), query probes + LUT (query_id) — all
    // bounded by construction parameters. Corpus frames carry vec_id;
    // every broadcast must carry a bounded mark and NO vec_id.
    val plan = staticPlanOf(
      EmbeddingOps.ivfpqTopK(syntheticEmb(50000L, dim = 64)))
    assertShuffleHealth("ivfpqTopK", plan)
    val marks = Set("query_id", "cent_id", "cell", "code")
    val bc = broadcastSubtrees(plan)
    assert(bc.nonEmpty, "ivfpqTopK lost its quantizer broadcasts")
    bc.foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.exists(marks) && !cols.contains("vec_id"),
        "ivfpqTopK broadcasts a corpus-shaped frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("ivfpqTopKRerank at 10x sf0.1: candidate set broadcasts bounded; " +
    "exact vectors never ride an exchange") {
    // two-stage serving contract: the ADC stage keeps the ivfpqTopK
    // discipline, and the refinement joins the stored lists against
    // the BROADCAST candidate set (bounded by rerankR x |queries| BY
    // CONSTRUCTION) — the corpus-sized exact-vector frame is filtered
    // in a broadcast-hash join, scanned once, never shuffled
    val emb = syntheticEmb(50000L, dim = 64)
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft_pqidx_probe").toString
    val ivDir = java.nio.file.Files
      .createTempDirectory("graft_ividx_probe").toString
    EmbeddingOps.ivfpqIndexWrite(emb, pqDir)
    EmbeddingOps.ivfIndexWrite(emb, ivDir)
    val plan = staticPlanOf(EmbeddingOps.ivfpqTopKRerank(
      spark, pqDir, ivDir, emb.where(col("vec_id") < 5)))
    assertShuffleHealth("ivfpqTopKRerank", plan)
    // every broadcast carries a construction-bounded mark: query_id
    // (candidates / queries / probes / LUT) or cent_id/cell/code
    // (quantizer tables); the stored-list frame carries only
    // (vec_id, q, nn) and must never appear under a broadcast
    val marks = Set("query_id", "cent_id", "cell", "code")
    val bc = broadcastSubtrees(plan)
    assert(bc.nonEmpty, "ivfpqTopKRerank lost its candidate broadcast")
    bc.foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.exists(marks),
        "ivfpqTopKRerank broadcasts a corpus-shaped frame with " +
          cols.mkString("[", ", ", "]"))
    }
    // the exact vectors are consumed inside the scan's partition: the
    // re-rank drops q before its top-k window, so no exchange input
    // may carry an exact-vector column
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }.foreach { cols =>
      assert(!cols.contains("q") && !cols.contains("qv"),
        "ivfpqTopKRerank shuffles exact vectors: " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("curate() composed chain: six keyed inter-stage joins in one " +
    "plan, no corpus broadcast, no raw-shingle shuffle") {
    // the per-operator probes pin each stage alone AT 10x; this walks
    // the COMPOSED plan (stage pinning replaced by identity, so the
    // six doc_id joins between stages stay visible) and asserts the
    // same discipline END TO END: every broadcast is bounded by
    // construction (langId's language-cardinality sizes, the mix
    // stage's 1-row scalars), every shuffle keeps parallelism (or is
    // a 1-partition scalar reduction), and no exchange carries a raw
    // shingle string (the digest-payload rule). Plan shape is
    // size-independent, and without stage checkpoints the interior
    // eager steps re-derive the whole prefix chain — so this probe
    // runs on a small corpus (the 10x eager-completion claim is the
    // per-operator probes' job)
    // varied source: a constant literal would constant-fold the mix
    // stage's source equi-key away and turn its rates join into a
    // Cartesian that the real (multi-source) shape never plans.
    // SMALL (10-term) vocabulary: syntheticDocs' 1000-term vocab makes
    // every bigram near-unique, so the LM gate drops the WHOLE corpus
    // — harmless while the chain was fully lazy, but the mix stage's
    // route probe now evaluates the per-source totals at construction
    // and a provably-empty rates LocalRelation lets Catalyst fold the
    // entire composed plan to an empty LocalTableScan (correct, but
    // then there is no plan shape left to probe). Repeating bigrams
    // keep the corpus alive through the gate, so the probed plan is
    // the real multi-stage shape.
    val raw = spark.range(2000L).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(4))).as("source"),
      lit("en").as("lang"),
      concat(lit("<html><body><p>"), concat_ws(" ", expr(
        "transform(sequence(0, 39), " +
          "i -> concat('w', pmod(xxhash64(id * 40 + i), 10)))")),
        lit("</p></body></html>")).as("html"))
    val plan = staticPlanOf(
      TextOps.curateChain(raw, 8, 3950L, 100000L,
        pin = identity).last._2)
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 6,
      s"composed curate lost its keyed inter-stage shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"composed curate has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "composed curate plans a CartesianProduct")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.exists(Set("cand_lang", "n_l", "tot_t", "budget",
          "keep_permille", "n_true")),
        "composed curate broadcasts an unbounded frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }.foreach { cols =>
      assert(!cols.contains("s"),
        "composed curate shuffles a raw shingle string: " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("nbClassify at 10x sf0.1: vocabulary model joins stay keyed; only " +
    "1-row scalar frames broadcast") {
    // the (word, c_p, c_n) model is vocabulary-sized — it grows with
    // the corpus and may never broadcast (the lmScore rule); the two
    // legitimate broadcasts are the 1-row totals and priors frames
    val plan = staticPlanOf(
      TextOps.nbClassify(syntheticDocs(50000L), "syn0", "syn1"))
    // scalar-tolerant shuffle health (the mixTemperature rule): the
    // global reductions behind the 1-row totals/priors frames
    // legitimately exchange map-side partials into one partition;
    // every corpus-carrying shuffle must keep full parallelism
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 2, // token counts + model join
      s"nbClassify lost its corpus-side parallel shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"nbClassify has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "nbClassify plans a CartesianProduct")
    val scalarCols = Set("qd_p", "qd_n", "qp_p", "qp_n")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.forall(scalarCols),
        "nbClassify broadcasts a non-scalar frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("capPerDomain at 10x sf0.1: WindowGroupLimit pre-trims per " +
    "partition before the domain shuffle") {
    // the per-domain cap is a rank<=N window — Spark 4's
    // WindowGroupLimit rewrites it so every MAP task keeps at most N
    // rows per domain before the exchange (Partial mode), which is
    // what makes the operator survive a mega-domain: the skewed
    // domain's rows are trimmed to N per upstream partition, not
    // sorted whole in one task
    val urls = syntheticDocs(50000L).select(col("doc_id"),
      concat(lit("https://d"), pmod(col("doc_id"), lit(50)).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string")).as("url"))
    val plan = staticPlanOf(
      TextOps.capPerDomain(TextOps.canonicalizeUrl(urls), 10))
    assertShuffleHealth("capPerDomain", plan)
    val wgl = plan.collect {
      case w: org.apache.spark.sql.execution.window
          .WindowGroupLimitExec => w
    }
    assert(wgl.nonEmpty,
      "no WindowGroupLimit — the cap sorts whole domains in one task")
    assert(wgl.exists(_.mode.toString == "Partial"),
      s"no Partial-mode pre-shuffle trim: ${wgl.map(_.mode)}")
  }

  test("dedupLines at 10x sf0.1: line-keyed shuffles carry hash " +
    "surrogates, never the raw line") {
    // the df aggregate and the excision join move (doc_id, line_no,
    // h) only; the raw text enters exactly one DOC-keyed reassembly
    // join (column ls) — the dedupSpans payload-width discipline
    val d = syntheticDocs(50000L).select(col("doc_id"),
      expr("concat('shared header line', chr(10), " +
        "array_join(slice(split(text, ' '), 1, 20), ' '), chr(10), " +
        "'shared footer line')").as("text"))
    val plan = staticPlanOf(TextOps.dedupLines(d))
    assertShuffleHealth("dedupLines", plan)
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }.foreach { cols =>
      assert(!cols.contains("line"),
        s"dedupLines shuffles the raw line: ${cols.mkString("[", ", ", "]")}")
    }
  }

  test("lmScore at 10x sf0.1: LM tables join by keyed shuffle, zero broadcasts") {
    // the bigram model and its context marginal are vocabulary- and
    // vocabulary²-sized — they grow with the corpus and may never
    // broadcast (the bpeEncode rule)
    val plan = staticPlanOf(TextOps.lmScore(syntheticDocs(50000L)))
    assertShuffleHealth("lmScore", plan)
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"lmScore broadcasts ${bc.length} corpus-derived frame(s)")
  }

  test("lmScoreBackoff at 10x sf0.1: model tables join keyed; only " +
    "the 1-row total broadcasts") {
    // the backoff adds the unigram marginal and the scalar total to
    // the serving joins: bigram/context/unigram tables are vocabulary-
    // sized and must stay keyed; the single legal broadcast is the
    // 1-row n_total frame (the scalar-frame exception)
    val d = syntheticDocs(50000L)
    val plan = staticPlanOf(
      TextOps.lmScoreBackoff(d, TextOps.lmModel(d)))
    // scalar-tolerant shuffle health (the nbClassify rule): the
    // global reduction behind the 1-row total legitimately collapses
    // to one partition; every corpus-carrying shuffle keeps full
    // parallelism
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 3, // bigrams + ctx/uni joins
      s"lmScoreBackoff lost its corpus-side parallel shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"lmScoreBackoff has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "lmScoreBackoff plans a CartesianProduct")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.forall(Set("n_total")),
        "lmScoreBackoff broadcasts a non-scalar frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("sq8TopKIndexed at 10x sf0.1: codes scan is committed-segment " +
    "pruned; only the query frame broadcasts") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_sq8_probe_idx").toString
    EmbeddingOps.sq8IndexWrite(syntheticEmb(50000L), idx)
    val queries = syntheticEmb(50000L).where(col("vec_id") < 5)
    val plan = staticPlanOf(
      EmbeddingOps.sq8TopKIndexed(spark, idx, queries))
    val scans = plan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("codes")) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the codes found")
    scans.foreach(sc => assert(sc.partitionFilters.nonEmpty,
      "codes scan has no committed-segment partition filter"))
    // the one broadcast is the reconstructed query frame (bounded by
    // nQueries); the codes never broadcast and never shuffle except
    // through the top-k window exchange
    assert(broadcastSubtrees(plan).nonEmpty,
      "queries are not broadcast — the codes side would shuffle")
  }

  test("dsirWeight at 10x sf0.1: only the fixed-bucket distribution broadcasts") {
    // feature hashing fixes the model at nBuckets rows BY CONSTRUCTION
    // — the one frame that is broadcast-safe at any corpus size; the
    // per-doc bucket counts must stay on the shuffle side
    val plan =
      staticPlanOf(TextOps.dsirWeight(syntheticDocs(50000L), "syn2"))
    assertShuffleHealth("dsirWeight", plan)
    val bc = broadcastSubtrees(plan)
    assert(bc.nonEmpty, "dsirWeight lost its distribution broadcast")
    bc.foreach { sub =>
      assert(sub.output.map(_.name).contains("qlog_t"),
        "dsirWeight broadcasts a non-distribution frame with columns " +
          sub.output.map(_.name).mkString("[", ", ", "]"))
    }
  }

  test("bpeEncode at 10x sf0.1: segmentations join by keyed shuffle, not broadcast") {
    // constructing the frame RUNS the trainer (5 rounds over the
    // synthetic vocabulary) — the driver sees one row per round; the
    // returned plan is the corpus-side encode join
    val plan =
      staticPlanOf(TextOps.bpeEncode(syntheticDocs(50000L), rounds = 5))
    assertShuffleHealth("bpeEncode", plan)
    // the trained per-word segmentation table is vocabulary-sized:
    // Heaps' law keeps it far smaller than the corpus but it GROWS
    // with the corpus, so it is not broadcast-safe at 100 TB — the
    // encode join must be a keyed shuffle with no broadcast side
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"bpeEncode broadcasts ${bc.length} frame(s); the vocabulary " +
        "join must stay a keyed shuffle")
  }

  test("unigramEncode at 10x sf0.1: vocabulary joins stay keyed, zero broadcasts") {
    // constructing the frame RUNS the Viterbi-EM trainer (2 rounds,
    // every intermediate pinned); the returned plan is the serving
    // side: edge->vocab join, per-word DP projection, word-keyed
    // corpus join, per-doc sum. The piece vocabulary grows with the
    // corpus charset (the bpeEncode rule) — keyed shuffles only.
    val plan = staticPlanOf(TextOps.unigramEncode(syntheticDocs(50000L)))
    assertShuffleHealth("unigramEncode", plan)
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"unigramEncode broadcasts ${bc.length} corpus-derived frame(s)")
  }

  test("mixTemperature at 10x sf0.1: collapsed route plans no corpus " +
    "shuffle; only the bounded rates LocalRelation broadcasts") {
    // the default (at-or-under-cap) route probes the per-source frame
    // in ONE job and re-emits the rates as a bounded LocalRelation:
    // the RETURNED plan is one broadcast-joined filter pass over the
    // corpus — no shuffle, no scalar-aggregate jobs, no cartesian
    val multiSource = syntheticDocs(50000L)
      .withColumn("source", concat(lit("src"),
        pmod(col("doc_id"), lit(8)).cast("string")))
    val collapsed = staticPlanOf(TextOps.mixTemperature(multiSource))
    assert(collapsed.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
    }.isEmpty,
      "collapsed mixTemperature still plans a shuffle — the rates " +
        "collapse did not take the driver route")
    assert(collapsed.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "collapsed mixTemperature plans a CartesianProduct")
    broadcastSubtrees(collapsed).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("keep_permille"),
        "collapsed mixTemperature broadcasts a frame other than the " +
          "rates LocalRelation: " + cols.mkString("[", ", ", "]"))
    }
  }

  test("mixTemperature at 10x sf0.1, over-cap arm: only 1-row scalar " +
    "frames broadcast") {
    // the per-source roots frame is DATA-derived (unbounded at
    // domain-level mixing) so it carries no broadcast hint — with the
    // size heuristic off, any surviving BroadcastExchange must be one
    // of the two 1-row scalars (total root mass, token budget).
    // localSourceLimit = 1 forces the distributed arm (8 sources > 1)
    // a MULTI-source corpus: with syntheticDocs' single literal
    // source, Catalyst constant-folds the source equi-join into a
    // degenerate cross — an artifact of the probe data, not the
    // operator's plan
    val multiSource = syntheticDocs(50000L)
      .withColumn("source", concat(lit("src"),
        pmod(col("doc_id"), lit(8)).cast("string")))
    val plan = staticPlanOf(
      TextOps.mixTemperature(multiSource, localSourceLimit = 1))
    // shuffle health, scalar-tolerant: the two global reductions
    // (total root mass, budget) legitimately exchange into one
    // partition — map-side partial aggregation means that exchange
    // moves per-partition partials, not rows — but every
    // corpus-carrying shuffle must keep full parallelism and nothing
    // may plan a cartesian product
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"mixTemperature lost its corpus-side parallel shuffle: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"mixTemperature has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "mixTemperature plans a CartesianProduct")
    val bc = broadcastSubtrees(plan)
    bc.foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("tot_t") || cols.contains("budget"),
        "mixTemperature broadcasts a non-scalar frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("dedupSpans at 10x sf0.1: shingle stats and covered positions stay keyed") {
    // every frame in the route grows with the corpus: the window
    // occurrences are token-cardinality, the shingle-stats aggregate
    // is corpus-vocabulary-sized, the covered-position explode is
    // duplication-mass-sized — none may ever broadcast; the stats
    // join and the covered anti-join must both be keyed shuffles
    val plan =
      staticPlanOf(TextOps.dedupSpans(syntheticDocs(50000L), minTokens = 5))
    assertShuffleHealth("dedupSpans", plan)
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"dedupSpans broadcasts ${bc.length} corpus-derived frame(s)")
    // payload-width probe (the r10 blind spot): shuffle count and
    // partitioning were green while the shuffles carried raw k-token
    // shingle STRINGS — an O(k) write amplification invisible to the
    // health probe above. Pin the fix at the schema level: no exchange
    // input may carry the raw shingle column, and the shingle-keyed
    // exchanges must key on the 16-byte digest instead.
    val exchanged = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }
    exchanged.foreach { cols =>
      assert(!cols.contains("s"),
        "dedupSpans shuffles the raw shingle string: " +
          cols.mkString("[", ", ", "]"))
    }
    assert(exchanged.exists(_.contains("sh")),
      "dedupSpans lost its digest-keyed shingle shuffle; exchanges: " +
        exchanged.map(_.mkString("[", ", ", "]")).mkString(" "))
  }

  test("nearDupServe at 10x sf0.1: the index side never shuffles its " +
    "shingle sets; only the batch broadcasts") {
    // serving contract at 100 TB: the persisted index is scanned once
    // (committed-segment pruned), joined against the BROADCAST batch
    // bands, and the only shuffle is the candidate-stat dedup — the
    // stored hs arrays must never ride an exchange
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_probe_idx").toString
    TextOps.minhashIndexWrite(syntheticDocs(50000L), idx)
    val batch = syntheticDocs(50100L).where(col("doc_id") >= 50000L)
    val plan = staticPlanOf(TextOps.nearDupServe(spark, idx, batch))
    assertShuffleHealth("nearDupServe", plan)
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }.foreach { cols =>
      assert(!cols.exists(c => c == "hs_a" || c == "hs"),
        "nearDupServe shuffles stored shingle sets: " +
          cols.mkString("[", ", ", "]"))
    }
    assert(broadcastSubtrees(plan).nonEmpty,
      "nearDupServe does not broadcast the batch side — the index " +
        "would shuffle at scale")
  }

  test("nearDupServe is WINDOW-FREE: bucket stats come from the " +
    "persisted per-segment sidecar and stored band rows never shuffle") {
    // the r12 scale finding was an index-wide bucket-stat window per
    // serve; r13 pruned its exchange to batch-touched buckets; r14
    // removes the window entirely — bn/hub now come from each
    // segment's `_bstats` sidecar (written with the segment, merged
    // by sum/min for touched buckets only, broadcast), so the stored
    // band rows feed two broadcast joins and ride NO exchange at all.
    // Pin all three structurally, on a TWO-segment index so the
    // cross-segment stat merge is live.
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_sidecar_probe").toString
    TextOps.minhashIndexWrite(
      syntheticDocs(50000L).where(col("doc_id") < 25000L), idx)
    TextOps.minhashIndexAppend(
      syntheticDocs(50000L).where(col("doc_id") >= 25000L), idx)
    val batch = syntheticDocs(50100L).where(col("doc_id") >= 50000L)
    val plan = staticPlanOf(TextOps.nearDupServe(spark, idx, batch))
    // 1. no window operator anywhere in the serve
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"nearDupServe still plans ${windows.length} window(s)")
    // 2. no exchange carries stored band rows (doc_a + bucket key):
    // the only shuffles left are the bounded stat merge and the
    // candidate-pair dedup
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }.foreach { cols =>
      assert(!Set("doc_a", "band_idx", "band_hash")
          .subsetOf(cols.toSet),
        "stored band rows ride an exchange: " +
          cols.mkString("[", ", ", "]"))
    }
    // 3. the capped-filter join against the merged stats is a
    // broadcast join whose build side carries (bn, hub)
    val statBroadcasts = broadcastSubtrees(plan).filter(sub =>
      Set("bn", "hub").subsetOf(sub.output.map(_.name).toSet))
    assert(statBroadcasts.nonEmpty,
      "nearDupServe lost its broadcast bucket-stat join")
    // 4. STEADY STATE (no tombstoned hubs): the dead-hub re-route
    // must cost the serve plan nothing — the stored band-hash rows
    // scan exactly ONCE (candidate generation; verification reads the
    // pruned shingle columns instead), never a second re-hub scan
    val bandScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.output.exists(_.name == "band_hashes") => f
    }
    assert(bandScans.length == 1,
      s"nearDupServe plans ${bandScans.length} stored band-hash " +
        "scans; the steady state must plan exactly 1 (candidates)")
    // behavioral half: a batch sharing no bucket with the index must
    // serve empty (disjoint vocabularies share no band hash)
    val alien = spark.range(60000L, 60010L).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr("transform(sequence(0, 39), " +
        "i -> concat('z', pmod(xxhash64(id * 40 + i), 1000)))"))
        .as("text"))
    assert(TextOps.nearDupServe(spark, idx, alien).count() === 0L)
  }

  test("phashNearDupServe at scale: static (seg, pb) partition " +
    "pruning, stored banded rows never shuffle, stats broadcast from " +
    "the sidecar, exactly one stored scan in the steady state") {
    // the image twin of the nearDupServe sidecar probe, on a
    // TWO-segment index so the cross-segment `_pstats` merge is live
    val idx = java.nio.file.Files
      .createTempDirectory("graft_phash_probe").resolve("ix").toString
    val all = graft.operators.Multimodal.syntheticPngMedia(
      spark.range(20000L).select(col("id").as("doc_id")))
    graft.operators.Multimodal.phashIndexWrite(
      all.where(col("doc_id") < 10000L), idx)
    graft.operators.Multimodal.phashIndexAppend(
      all.where(col("doc_id") >= 10000L), idx)
    val batch = graft.operators.Multimodal.syntheticPngMedia(
      spark.range(20000L, 20050L).select(col("id").as("doc_id")))
    val plan = staticPlanOf(
      graft.operators.Multimodal.phashNearDupServe(spark, idx, batch))
    val cartesian = plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }
    assert(cartesian.isEmpty, "phashNearDupServe plans a CartesianProduct")
    // 1. no exchange carries the stored BANDED rows — the only
    // shuffles left are batch-bounded (candidate-pair dedup)
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }.foreach { cols =>
      assert(!Set("doc_a", "band_idx", "band_val").subsetOf(cols.toSet),
        "stored banded rows ride an exchange: " +
          cols.mkString("[", ", ", "]"))
    }
    // 2. the capped filter joins merged sidecar stats by broadcast
    val statBroadcasts = broadcastSubtrees(plan).filter(sub =>
      Set("bn", "hub").subsetOf(sub.output.map(_.name).toSet))
    assert(statBroadcasts.nonEmpty,
      "phashNearDupServe lost its broadcast bucket-stat join")
    // 3. steady state (no tombstoned hubs): the stored rows scan
    // exactly ONCE — the conditional dead-hub re-route must not plan
    // a second scan
    val storedScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.output.exists(_.name == "bs") => f
    }
    assert(storedScans.length == 1,
      s"phashNearDupServe plans ${storedScans.length} stored scans; " +
        "the steady state must plan exactly 1")
    // 4. the one scan carries STATIC partition filters on BOTH the
    // committed segments and the batch-touched hash buckets
    val pf = storedScans.head.partitionFilters.map(_.toString)
      .mkString(" ")
    assert(pf.contains("seg") && pf.contains("pb"),
      s"stored scan lost its (seg, pb) partition pruning: $pf")
  }

  test("nearDupServe bounds candidate fan-out on an indexed template cluster") {
    // the serve twin of the cappedBandPairs probe: 5000 identical
    // docs in the index put 5000 signatures in one stored bucket per
    // band — an uncapped serve would fan every matching batch doc out
    // to all of them. The capped serve compares each batch doc
    // against the bucket's hub only: exactly |batch| pairs out, all
    // verified at jaccard 1.0 against the cluster representative.
    val spamText = "spam template page click here to win a free prize now"
    val idxDocs = spark.range(5000L).select(col("id").as("doc_id"),
      lit(spamText).as("text"))
    val batch = spark.range(5000L, 5010L).select(col("id").as("doc_id"),
      lit(spamText).as("text"))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_cap_probe").toString
    TextOps.minhashIndexWrite(idxDocs, idx)
    val served = TextOps.nearDupServe(spark, idx, batch, bucketCap = 64)
      .collect()
    assert(served.length === 10,
      s"capped serve emitted ${served.length} pairs; expected one " +
        "hub pair per batch doc")
    assert(served.forall(r => r.getAs[Long]("doc_a") == 0L &&
      r.getAs[Double]("jaccard") == 1.0))
  }

  test("nearDupServe re-hubs an oversized bucket whose hub is " +
    "tombstoned; a fully-tombstoned bucket answers nothing") {
    // regression: an oversized bucket routes exclusively through its
    // persisted hub (min doc_id). Tombstoning that hub used to erase
    // every pair it generated at the final anti-join — the whole
    // live cluster silently stopped answering until compaction. The
    // serve must re-route through the smallest LIVE doc instead.
    val spamText = "spam template page click here to win a free prize now"
    val idxDocs = spark.range(200L).select(col("id").as("doc_id"),
      lit(spamText).as("text"))
    val batch = spark.range(9000L, 9010L).select(col("id").as("doc_id"),
      lit(spamText).as("text"))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_mh_deadhub").toString
    TextOps.minhashIndexWrite(idxDocs, idx)
    TextOps.minhashIndexDelete(spark, idx,
      spark.range(1L).select(col("id").as("doc_id")))
    val served = TextOps.nearDupServe(spark, idx, batch, bucketCap = 64)
      .collect()
    assert(served.length === 10,
      s"dead-hub bucket answered ${served.length} pairs; expected " +
        "one re-hubbed pair per batch doc")
    assert(served.forall(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Double]("jaccard") == 1.0),
      "re-hub must pick the smallest live doc_id (1)")
    // compaction regenerates the hub from live rows — serve identical
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    val afterCompact = TextOps
      .nearDupServe(spark, idx, batch, bucketCap = 64).collect()
    assert(afterCompact.length === 10 &&
      afterCompact.forall(_.getAs[Long]("doc_a") == 1L))
    // every doc tombstoned: the bucket must answer NOTHING (the dead
    // hub stays in the stats; its pairs die at the anti-join)
    TextOps.minhashIndexDelete(spark, idx,
      spark.range(200L).select(col("id").as("doc_id")))
    assert(TextOps.nearDupServe(spark, idx, batch, bucketCap = 64)
      .count() === 0L)
  }

  test("bm25TopK at 10x sf0.1: only term-bounded and scalar frames broadcast") {
    // the tf aggregate runs AFTER the query-term semi-filter (only
    // matching tokens shuffle); the df frame is bounded by |terms|
    // and the corpus totals are a 1-row scalar — those are the only
    // legal broadcasts; dl joins tf by a keyed doc_id shuffle
    val plan = staticPlanOf(
      TextOps.bm25TopK(syntheticDocs(50000L), Seq("w1", "w2", "w3")))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"bm25TopK lost its corpus-side parallel shuffle: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"bm25TopK has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "bm25TopK plans a CartesianProduct")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("word") || cols.contains("t_tok"),
        "bm25TopK broadcasts a non-bounded frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
    // the global top-k must be a TakeOrderedAndProject, not a full sort
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "bm25TopK's top-k is not a TakeOrderedAndProject")
  }

  test("bm25TopKWith at 10x sf0.1: the vocabulary-sized stats frame " +
    "never broadcasts whole — only its term slice and totals do") {
    val corpus = syntheticDocs(50000L)
    val stats = TextOps.bm25Stats(corpus) // pinned inside the serve
    val plan = staticPlanOf(TextOps.bm25TopKWith(
      syntheticDocs(5000L), stats, Seq("w1", "w2", "w3")))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"bm25TopKWith lost its batch-side parallel shuffle: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"bm25TopKWith has a shuffle at odd parallelism: $parts")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("word") || cols.contains("t_tok"),
        "bm25TopKWith broadcasts a non-bounded frame with columns " +
          cols.mkString("[", ", ", "]"))
      // a broadcast carrying (word, df, tok) unfiltered would be the
      // whole vocabulary: the df slice must NOT carry the tok column
      assert(!(cols.contains("df") && cols.contains("tok")),
        "bm25TopKWith broadcasts the raw stats frame: " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("marginMineLsh at 10x sf0.1: candidates join keyed on bucket, " +
    "margins/windows all keyed, zero corpus broadcasts") {
    // 20000 = 10x the sf0.1 embeddings cardinality; the only
    // broadcast in the whole route (the plane matrix) sits behind the
    // bucketed() pin, so the mining plan itself must be
    // broadcast-free with every window/aggregate keyed per vector
    val plan = staticPlanOf(
      EmbeddingOps.marginMineLsh(syntheticEmb(20000L), nPlanes = 4))
    assertShuffleHealth("marginMineLsh", plan)
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"marginMineLsh broadcasts ${bc.length} corpus-derived frame(s)")
  }

  test("hardNegatives at 10x sf0.1: only the query frame broadcasts; " +
    "top-k windows pre-trim") {
    val plan = staticPlanOf(
      EmbeddingOps.hardNegatives(syntheticEmb(20000L, dim = 64)))
    assertShuffleHealth("hardNegatives", plan)
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("query_id"),
        "hardNegatives broadcasts a non-query frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
    val wgl = plan.collect {
      case w: org.apache.spark.sql.execution.window
          .WindowGroupLimitExec => w
    }
    assert(wgl.exists(_.mode.toString == "Partial"),
      "hardNegatives' rank<=k window has no Partial pre-shuffle trim")
  }

  test("late text/embedding cards at 10x sf0.1: bounded broadcasts, " +
    "keyed shuffles throughout") {
    val multiSource = syntheticDocs(50000L)
      .withColumn("source", concat(lit("src"),
        pmod(col("doc_id"), lit(8)).cast("string")))
    // (name, build, allowed broadcast marker columns, requireParallel;
    // a broadcast carrying none of the markers is a corpus-derived
    // frame leaking in. negSamplingTable's vocab shuffle happens at
    // pin time (invisible downstream), so only its scalar exchange
    // shows — exempt it from the parallel-shuffle floor)
    Seq[(String, () => DataFrame, Set[String], Boolean)](
      ("blocklistScreen",
        () => TextOps.blocklistScreen(multiSource, Seq("w1 w2", "w3 w4 w5")),
        Set("g"), true),
      ("distinctiveTerms",
        () => TextOps.distinctiveTerms(multiSource), Set("t_all"), true),
      ("scorePercentile",
        () => TextOps.scorePercentile(multiSource.select(col("doc_id"),
          col("source"),
          (pmod(xxhash64(col("doc_id")), lit(1000)) / 100.0).as("score"))),
        Set("_off", "n_src"), true),
      ("negSamplingTable",
        () => TextOps.negSamplingTable(multiSource), Set("tot"), false),
      ("dimStats",
        () => EmbeddingOps.dimStats(syntheticEmb(20000L, dim = 64)),
        Set.empty[String], true),
      ("denoiserMix",
        // doc-keyed distinct: round-robin the source so the exchange
        // the 100 TB plan needs is visible (the spanCorrupt rule)
        () => TextOps.denoiserMix(multiSource.repartition(
          spark.conf.get("spark.sql.shuffle.partitions").toInt)),
        Set.empty[String], true))
      .foreach { case (name, build, allowed, requireParallel) =>
        val plan = staticPlanOf(build())
        val expected =
          spark.conf.get("spark.sql.shuffle.partitions").toInt
        val parts = plan.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeExec => e.outputPartitioning.numPartitions
        }
        if (requireParallel) assert(parts.count(_ == expected) >= 1,
          s"$name lost its keyed parallel shuffle: $parts")
        assert(parts.forall(p => p == expected || p == 1),
          s"$name has a shuffle at odd parallelism: $parts")
        assert(plan.collect {
          case c: org.apache.spark.sql.execution.joins
              .CartesianProductExec => c
        }.isEmpty, s"$name plans a CartesianProduct")
        broadcastSubtrees(plan).foreach { sub =>
          val cols = sub.output.map(_.name)
          assert(allowed.nonEmpty && cols.exists(allowed.contains),
            s"$name broadcasts a non-bounded frame with columns " +
              cols.mkString("[", ", ", "]"))
        }
      }
  }

  test("lmScoreTrigramWith at 10x sf0.1: model tables join keyed; only " +
    "the 1-row total broadcasts") {
    // trigram/bigram tables and all three marginals are vocabulary-
    // sized (vocab^2, vocab^3 worst case) — they may never broadcast;
    // the single legal broadcast is the scalar total
    val corp = syntheticDocs(50000L)
    val plan = staticPlanOf(TextOps.lmScoreTrigramWith(
      syntheticDocs(5000L), TextOps.lmTrigramModel(corp),
      TextOps.lmModel(corp)))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"lmScoreTrigramWith lost its keyed shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"lmScoreTrigramWith has a shuffle at odd parallelism: $parts")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("n_total"),
        "lmScoreTrigramWith broadcasts a non-scalar frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("bm25TopKIndexed at 10x sf0.1: postings scan carries seg + " +
    "term-bucket partition filters; only bounded frames broadcast") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25_probe_idx").resolve("ix").toString
    TextOps.bm25IndexWrite(syntheticDocs(50000L), idx)
    // the serve pins the pruned scan for its two consumers, which
    // hides the file source from the downstream plan — probe the
    // exposed scan builder (the serve path itself) for the filters
    val scanPlan = staticPlanOf(
      TextOps.bm25PostingsScan(spark, idx, Seq("w1", "w2", "w3")))
    val plan = staticPlanOf(
      TextOps.bm25TopKIndexed(spark, idx, Seq("w1", "w2", "w3")))
    val scans = scanPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("postings")) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the postings found")
    scans.foreach { sc =>
      assert(sc.partitionFilters.nonEmpty,
        "postings scan has no partition filter")
      val rendered = sc.partitionFilters.map(_.toString).mkString(" ")
      assert(rendered.contains("tb#") || rendered.contains("tb IN"),
        s"postings scan does not prune on the term bucket: $rendered")
    }
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("word") || cols.contains("t_tok"),
        "bm25TopKIndexed broadcasts a non-bounded frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("retained pinned serve keeps the live serve's IO shape: the " +
    "postings scan of the RETIRED tree carries the same seg + " +
    "term-bucket partition filters") {
    // retention must not silently trade the pruned scan for a full
    // one — a pinned read resolving to the retired tree reads the
    // SAME layout (seg partition dirs, tb buckets), so the static
    // partition filters must survive the path switch
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25_ret_probe").resolve("ix")
      .toString
    TextOps.bm25IndexWrite(syntheticDocs(50000L), idx)
    val snap = graft.operators.EmbeddingOps.indexSnapshot(spark, idx)
    graft.operators.EmbeddingOps.indexDelete(spark, idx,
      spark.range(7L).select(col("id").as("doc_id")), keyCol = "doc_id")
    assert(TextOps.bm25IndexCompact(spark, idx) >= 1) // retires the tree
    val scanPlan = staticPlanOf(TextOps.bm25PostingsScan(spark, idx,
      Seq("w1", "w2", "w3"), asOf = Some(snap)))
    val scans = scanPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("postings")) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the postings found")
    scans.foreach { sc =>
      assert(sc.relation.location.rootPaths.exists(
          _.toString.contains(".ix.epoch-")),
        "pinned scan did not resolve to the retired tree: " +
          sc.relation.location.rootPaths.mkString(", "))
      val rendered = sc.partitionFilters.map(_.toString).mkString(" ")
      assert(rendered.contains("seg#") || rendered.contains("seg IN"),
        s"retired-tree scan lost the committed-segment prune: $rendered")
      assert(rendered.contains("tb#") || rendered.contains("tb IN"),
        s"retired-tree scan lost the term-bucket prune: $rendered")
    }
  }

  test("bm25TopKIndexedBatch at 10x sf0.1: only batch-bounded frames " +
    "broadcast; keyed shuffles keep parallelism for the whole batch") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25_batch_probe").resolve("ix")
      .toString
    TextOps.bm25IndexWrite(syntheticDocs(50000L), idx)
    // 100 queries x 3 terms, built shuffle-free so the probe sees
    // only the serve's own exchanges
    val qw = spark.range(300).select(
      (col("id") % 100).as("query_id"),
      element_at(array(lit("w1"), lit("w2"), lit("w3")),
        (col("id") / 100).cast("int") + 1).as("word"))
    val plan = staticPlanOf(
      TextOps.bm25TopKIndexedBatch(spark, idx, qw))
    // the postings scan's (seg, tb) partition filters are pinned by
    // the single-serve probe above — both serves ride the same
    // bm25PostingsScan. Here: the batch fan-out must broadcast ONLY
    // frames bounded by the batch or |terms| (the (query_id, word)
    // frame, per-term df, the scalar totals), and the per-(query,
    // doc) aggregate + per-query window must shuffle at full
    // parallelism — a batch serve that collapses to one partition
    // would serialize every query through one task. The scalar
    // totals aggregate legitimately collapses to 1.
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"bm25TopKIndexedBatch lost its keyed shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"bm25TopKIndexedBatch has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "bm25TopKIndexedBatch plans a CartesianProduct")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("word") || cols.contains("t_tok"),
        "bm25TopKIndexedBatch broadcasts a non-bounded frame with " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("qa profiling at 10x sf0.1: heavyHitters and numericProfile " +
    "shuffle one row per distinct (column, value); the only " +
    "broadcast is numericProfile's scalar total") {
    val d = syntheticDocs(50000L)
      .withColumn("v", (pmod(col("doc_id"), lit(977)) / lit(10.0)))
    val hh = staticPlanOf(
      graft.operators.Checks.heavyHitters(d, Seq("source", "lang")))
    assertShuffleHealth("heavyHitters", hh)
    assert(broadcastSubtrees(hh).isEmpty,
      "heavyHitters broadcasts a frame — the melt must stay keyed")
    val np = staticPlanOf(graft.operators.Checks.numericProfile(
      d.withColumn("w", col("v") * 2), Seq("v", "w")))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = np.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"numericProfile lost its keyed shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"numericProfile has a shuffle at odd parallelism: $parts")
    broadcastSubtrees(np).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("total"),
        "numericProfile broadcasts a non-scalar frame with " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("hybridTopKIndexed at 10x sf0.1: no cartesian, every broadcast " +
    "carries a batch/terms/quantizer mark and never a bare corpus " +
    "frame; fusion joins keyed at full-or-scalar parallelism") {
    val bmIdx = java.nio.file.Files
      .createTempDirectory("graft_hyb_probe_bm").resolve("ix").toString
    val pqIdx = java.nio.file.Files
      .createTempDirectory("graft_hyb_probe_pq").resolve("ix").toString
    TextOps.bm25IndexWrite(syntheticDocs(50000L), bmIdx)
    val emb = syntheticEmb(50000L, dim = 64)
    EmbeddingOps.ivfpqIndexWrite(emb, pqIdx)
    val qw = spark.range(300).select(
      (col("id") % 100).as("query_id"),
      element_at(array(lit("w1"), lit("w2"), lit("w3")),
        (col("id") / 100).cast("int") + 1).as("word"))
    val plan = staticPlanOf(graft.operators.Hybrid.hybridTopKIndexed(
      spark, bmIdx, pqIdx, qw, emb.where(col("vec_id") < 100)))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"hybridTopKIndexed lost its keyed shuffles: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"hybridTopKIndexed has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "hybridTopKIndexed plans a CartesianProduct")
    // allowed broadcast marks: the bm25 arm's (query_id, word) batch
    // frame, per-term df (word), scalar totals (t_tok); the dense
    // arm's probes/LUT (query_id), centroids (cent_id/cell),
    // codebooks (code). Anything carrying ONLY corpus columns is a
    // scale bug.
    val marks = Set("word", "t_tok", "query_id", "cent_id", "cell",
      "code")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.exists(marks),
        "hybridTopKIndexed broadcasts an unbounded frame with " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("rankFusion at 10x sf0.1: only shard offsets and the DSIR bucket " +
    "distribution broadcast; corpus shuffles keep parallelism") {
    val multiSource = syntheticDocs(50000L)
      .withColumn("source", concat(lit("src"),
        pmod(col("doc_id"), lit(8)).cast("string")))
    val plan = staticPlanOf(TextOps.rankFusion(multiSource, "src0"))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"rankFusion lost its corpus-side parallel shuffle: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"rankFusion has a shuffle at odd parallelism: $parts")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "rankFusion plans a CartesianProduct")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("_off") || cols.contains("bucket"),
        "rankFusion broadcasts a non-bounded frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "rankFusion's fused top-k is not a TakeOrderedAndProject")
  }

  test("projTopK at 10x sf0.1: only the plane matrix and query sketch " +
    "broadcast; sketch aggregation stays keyed") {
    val plan = staticPlanOf(
      EmbeddingOps.projTopK(syntheticEmb(20000L, dim = 64)))
    assertShuffleHealth("projTopK", plan)
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("coef") || cols.contains("query_id"),
        "projTopK broadcasts a non-bounded frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("budgetSelect at 10x sf0.1: only the shard-offset frame broadcasts; " +
    "no corpus-wide single-partition window") {
    // the corpus-sized frames move through shard-keyed shuffles; the
    // single-partition stages are confined to the shard-cardinality
    // offsets frame (bounded by granularity x score range), which is
    // also the only broadcast
    val scored = syntheticDocs(500000L).select(col("doc_id"),
      (pmod(xxhash64(col("doc_id")), lit(1000)) / 100.0).as("score"),
      (pmod(xxhash64(col("doc_id") + 7), lit(200)) + 1).as("n_tokens"))
    val plan = staticPlanOf(TextOps.budgetSelect(scored, budget = 1000000L))
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(parts.count(_ == expected) >= 1,
      s"budgetSelect lost its shard-keyed parallel shuffle: $parts")
    assert(parts.forall(p => p == expected || p == 1),
      s"budgetSelect has a shuffle at odd parallelism: $parts")
    broadcastSubtrees(plan).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(cols.contains("offset"),
        "budgetSelect broadcasts a non-offset frame with columns " +
          cols.mkString("[", ", ", "]"))
    }
  }

  test("spanCorrupt at 10x sf0.1: token-keyed shuffles only, zero broadcasts") {
    // window grouping, sentinel numbering, and reassembly are all
    // keyed per doc; nothing corpus-derived may broadcast. EVERY
    // stage of this operator keys by doc_id(, g) — over the
    // range-partitioned synthetic source Catalyst correctly elides
    // all of them (doc rows are already co-located), which is the
    // artifact, not the claim: round-robin the source like a real
    // parquet scan's UnknownPartitioning so the exchanges the 100 TB
    // plan needs actually appear
    val plan = staticPlanOf(TextOps.spanCorrupt(syntheticDocs(50000L)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)))
    assertShuffleHealth("spanCorrupt", plan)
    val bc = broadcastSubtrees(plan)
    assert(bc.isEmpty,
      s"spanCorrupt broadcasts ${bc.length} corpus-derived frame(s)")
  }

  test("sampleTopN at 10x sf0.1: WindowGroupLimit pre-trims per " +
    "partition before the stratum shuffle") {
    // same mega-stratum safety as capPerDomain: every map task keeps
    // at most n rows per source before the exchange. A MULTI-source
    // frame (the mixTemperature probe rule): syntheticDocs' single
    // literal source constant-folds the partition key away and the
    // window degenerates to a global one — probe-data artifact, not
    // the operator's plan
    val multiSource = syntheticDocs(500000L)
      .withColumn("source", concat(lit("src"),
        pmod(col("doc_id"), lit(20)).cast("string")))
    val plan = staticPlanOf(TextOps.sampleTopN(multiSource))
    assertShuffleHealth("sampleTopN", plan)
    val wgl = plan.collect {
      case w: org.apache.spark.sql.execution.window
          .WindowGroupLimitExec => w
    }
    assert(wgl.nonEmpty,
      "no WindowGroupLimit — the carve sorts whole strata in one task")
    assert(wgl.exists(_.mode.toString == "Partial"),
      s"no Partial-mode pre-shuffle trim: ${wgl.map(_.mode)}")
  }

  test("indexDiff at 10x sf0.1: every codes scan is segment-pruned and " +
    "reads ONLY the key column — the audit is O(keys), never O(payload)") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_diff_probe_idx").toString
    EmbeddingOps.sq8IndexWrite(
      syntheticEmb(50000L).where(col("vec_id") < 40000), idx)
    val from = EmbeddingOps.indexSnapshot(spark, idx)
    EmbeddingOps.sq8IndexAppend(
      syntheticEmb(50000L).where(col("vec_id") >= 40000), idx)
    EmbeddingOps.indexDelete(spark, idx,
      syntheticEmb(50000L).where(col("vec_id") % 100 === 7)
        .select(col("vec_id")))
    val to = EmbeddingOps.indexSnapshot(spark, idx)
    val plan = staticPlanOf(
      EmbeddingOps.indexDiff(spark, idx, "codes", from, to))
    val scans = plan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains(idx)) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the index found")
    scans.foreach { sc =>
      assert(sc.partitionFilters.nonEmpty,
        "an index scan has no segment partition filter")
      val dataCols = sc.requiredSchema.fieldNames.toSeq
      assert(dataCols == Seq("vec_id"),
        "an indexDiff scan reads payload columns — column pruning " +
          s"failed: $dataCols")
    }
    assertShuffleHealth("indexDiff", plan)
  }

  test("phraseOccurrencesIndexed at scale: the postings scan carries " +
    "static (seg, tb) partition pruning with positions packed inside " +
    "the posting rows, no explode anywhere, intersection joins keyed " +
    "on doc_id") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_phrase_probe").resolve("ix").toString
    val d = syntheticDocs(50000L)
    // TWO segments so the probe covers the appended chain
    TextOps.bm25IndexWrite(d.where(col("doc_id") < 25000L), idx,
      positional = true)
    TextOps.bm25IndexAppend(d.where(col("doc_id") >= 25000L), idx)
    val phrase = Seq("w1", "w2")
    // the pruned scan, probed directly: the serve pins this frame for
    // its slot consumers (one materialization, k cheap re-reads), so
    // the scan plan is not walkable from the serve's own tree
    val scanPlan = staticPlanOf(TextOps.bm25PostingsScan(spark, idx,
      phrase, withPositions = true))
    val scans = scanPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.output.exists(_.name == "ps") => f
    }
    assert(scans.length == 1,
      s"phrase serve plans ${scans.length} postings scans, expected 1")
    val pf = scans.head.partitionFilters.map(_.toString).mkString(" ")
    assert(pf.contains("seg") && pf.contains("tb"),
      s"postings scan lost its (seg, tb) partition pruning: $pf")
    // the serve plan itself: no Generate (positions never explode
    // into rows — adjacency is an array filter), no cartesian, and
    // the slot intersection joins carry doc_id keys
    val plan = staticPlanOf(
      TextOps.phraseOccurrencesIndexed(spark, idx, phrase))
    assert(plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, "positions exploded into rows")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "phrase serve plans a CartesianProduct")
    val joinKeys = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.toString).mkString(" ")
      case j: org.apache.spark.sql.execution.joins
          .ShuffledHashJoinExec =>
        j.leftKeys.map(_.toString).mkString(" ")
    }
    assert(joinKeys.nonEmpty && joinKeys.forall(_.contains("doc_id")),
      s"slot intersection must join on doc_id: $joinKeys")
    // behavioral parity at probe scale against the corpus brute force
    // (the synthetic vocabulary makes any fixed bigram rare, so
    // equality is the assertion, not non-emptiness — non-vacuous
    // parity rides PhraseIndexSpec at gate scale)
    val k = phrase.size
    val conds = phrase.zipWithIndex
      .map { case (w, i) => s"w[CAST(p + $i AS INT)] = '$w'" }
      .mkString(" AND ")
    val brute = d.select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= k)
      .withColumn("starts", expr(
        s"filter(sequence(0, size(w) - $k), p -> $conds)"))
      .where(size(col("starts")) > 0)
      .select(col("doc_id"),
        size(col("starts")).cast("long").as("n_occ"),
        element_at(col("starts"), 1).cast("long").as("first_pos"))
      .collect().map(_.toString).sorted
    assert(TextOps.phraseOccurrencesIndexed(spark, idx, phrase)
      .collect().map(_.toString).sorted.sameElements(brute),
      "probe-scale phrase serve must equal the corpus brute force")
  }

  test("exact all-pairs family at 10x sf0.1: keyed shuffles, zero " +
    "broadcasts, 16-byte digests on every exchange, no cartesian") {
    // the exact joins' 100 TB shape, pinned like their capped
    // siblings': every frame is doc- or shingle-cardinality (the
    // prefix shrinks CANDIDATES, not frames) so nothing may broadcast,
    // every exchange keeps parallelism, and — the digest discipline —
    // no exchange carries raw shingle text (the set key is the
    // 16-byte unhex(md5) surrogate, column h)
    val docs = syntheticDocs(50000L)
    val other = syntheticDocs(52000L).where(col("doc_id") >= 50000L)
    Seq[(String, () => DataFrame)](
      "allPairsExact" -> (() => TextOps.allPairsExact(docs)),
      "containmentPairs" -> (() => TextOps.containmentPairs(docs)),
      "allPairsJoin" -> (() => TextOps.allPairsJoin(other, docs)))
      .foreach { case (name, build) =>
        val plan = staticPlanOf(build())
        assertShuffleHealth(name, plan)
        val bc = broadcastSubtrees(plan)
        assert(bc.isEmpty,
          s"$name broadcasts ${bc.length} corpus-derived frame(s)")
        plan.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeExec => e.child.output.map(_.name)
        }.foreach { cols =>
          assert(!cols.contains("s"),
            s"$name shuffles the raw shingle string: " +
              cols.mkString("[", ", ", "]"))
        }
      }
  }

  test("nearDupServeExact at scale: posting scans are pb-partition-" +
    "pruned, batch sets broadcast, stored hs never rides a broadcast") {
    // the exact serve's 100 TB shape: IO is the batch prefix's
    // (seg, pb) posting buckets (static pruning, the bm25 term-bucket
    // discipline), the bounded batch sets broadcast, and the stored
    // hs arrays reach the verify join only through the
    // candidate-keyed exchange — never a broadcast (candidates are
    // data-dependent, the documented exact trade)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_exact_probe").toString + "/ix"
    TextOps.minhashIndexWrite(syntheticDocs(50000L), idx, exact = true)
    val batch = syntheticDocs(50100L).where(col("doc_id") >= 50000L)
    // the candidate-route probe collapses the posting scan out of the
    // RETURNED plan (within-cap candidates re-emit as a
    // LocalRelation), so the pruning assertions walk the frame the
    // probe EXECUTES — exactServeCandidates is the serve's own
    // construction, shared verbatim
    val (candAll, _, _) = TextOps.exactServeCandidates(spark, idx,
      batch, 0.7, None)
    val candPlan = staticPlanOf(candAll)
    val postScans = candPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("_posts")) => f
    }
    assert(postScans.nonEmpty, "no _posts posting scan found")
    postScans.foreach { sc =>
      val pf = sc.partitionFilters.map(_.toString).mkString(" ")
      assert(pf.contains("pb"),
        s"posting scan lost its pb partition pruning: $pf")
    }
    // the batch prefix broadcasts INTO the posting scan; no stored
    // column may ride a candidate-side broadcast or exchange
    val candBc = broadcastSubtrees(candPlan)
    assert(candBc.nonEmpty,
      "the batch prefix is not broadcast — the postings would shuffle")
    val plan = staticPlanOf(TextOps.nearDupServeExact(spark, idx, batch))
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
    }.isEmpty, "nearDupServeExact plans a CartesianProduct")
    val bc = broadcastSubtrees(plan)
    assert(bc.nonEmpty,
      "the batch sets are not broadcast — the stored rows would shuffle")
    (candBc ++ bc).foreach { sub =>
      val cols = sub.output.map(_.name)
      assert(!cols.contains("hs_a") && !cols.contains("hs"),
        "nearDupServeExact broadcasts stored shingle sets: " +
          cols.mkString("[", ", ", "]"))
    }
    // the stored side NEVER rides an exchange on the fast path:
    // prefix and candidates broadcast into the posting/docs scans, so
    // no shuffle input may carry the stored hs arrays (the
    // nearDupServe discipline) — on EITHER plan
    (candPlan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    } ++ plan.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e.child.output.map(_.name)
    }).foreach { cols =>
      assert(!cols.contains("hs") && !cols.contains("hs_a"),
        "stored shingle sets ride an exchange: " +
          cols.mkString("[", ", ", "]"))
    }
    // behavioral: a batch sharing no shingle with the index serves
    // empty (disjoint vocabularies), and identical docs serve at 1.0
    val alien = spark.range(60000L, 60010L).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr("transform(sequence(0, 39), " +
        "i -> concat('z', pmod(xxhash64(id * 40 + i), 1000)))"))
        .as("text"))
    assert(TextOps.nearDupServeExact(spark, idx, alien).count() === 0L)
  }

  test("exact all-pairs prefix filter: candidate volume strictly below " +
    "brute force on a boilerplate corpus, yet recall stays complete") {
    // the filter's measured selectivity, live: a corpus where EVERY
    // doc shares one boilerplate shingle makes the brute-force
    // shingle-sharing pair set ALL n(n-1)/2 pairs, while the shared
    // shingle's corpus-wide frequency ranks it LAST in every doc's
    // rarest-first order — outside every prefix — so the candidate
    // join prunes it. Random-tail shingles keep the candidate count
    // near the true-duplicate mass. Completeness rides along: planted
    // exact duplicates must all surface at jaccard 1.0.
    val n = 2000L
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      concat(
        concat_ws(" ", expr("transform(sequence(0, 27), " +
          "i -> concat('w', pmod(xxhash64(id * 28 + i), 200)))")),
        lit(" all rights reserved")).as("text"))
    // plant 5 exact duplicates (doc_id 9000+k copies doc k)
    val dups = base.where(col("doc_id") < 5).select(
      (col("doc_id") + lit(9000L)).as("doc_id"), col("text"))
    val docs = base.unionByName(dups)
    val t = 700L
    val ds = TextOps.digestSets(docs).localCheckpoint()
    val cand = TextOps.prefixCandidates(ds, ds, t, selfJoin = true)
      .count()
    val brute = ds.as("a").join(ds.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(brute == (n + 5) * (n + 4) / 2,
      s"fixture lost its boilerplate all-pairs floor: $brute")
    assert(cand < brute / 100,
      s"prefix filter stopped pruning: $cand candidates vs $brute " +
        "brute-force shingle-sharing pairs")
    // recall: every planted duplicate pair surfaces
    val found = TextOps.allPairsExact(docs, 0.7)
      .where(col("jaccard") === 1.0)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(k => assert(found.contains((k, 9000L + k)),
      s"planted duplicate ($k, ${9000L + k}) missed — recall broken"))
  }
}
