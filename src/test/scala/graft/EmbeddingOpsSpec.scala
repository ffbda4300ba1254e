package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingOps

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Seq[Float] =
    v ++ Seq.fill(64 - v.size)(0f)

  private def emb = embDf(Seq(
    (0L, pad(Seq(1f, 0f, 0f)), 0),
    (1L, pad(Seq(1f, 0f, 0f)), 0),   // identical to 0
    (2L, pad(Seq(0f, 1f, 0f)), 1),   // orthogonal
    (3L, pad(Seq(0.9f, 0.1f, 0f)), 0))) // close to 0

  test("quantized norms are exact integers") {
    val q = EmbeddingOps.quantized(emb).where($"vec_id" === 0).collect()(0)
    assert(q.getAs[Long]("nn") == 1000000L)
  }

  test("annTopK ranks an identical vector first with cosine 1.0") {
    val top = EmbeddingOps.annTopK(emb, nQueries = 1, k = 3).collect()
    assert(top(0).getAs[Long]("vec_id") == 1L)
    assert(top(0).getAs[Double]("cos") == 1.0)
    assert(top(1).getAs[Long]("vec_id") == 3L) // close beats orthogonal
    assert(top(2).getAs[Double]("cos") == 0.0) // orthogonal
  }

  test("nearDupCosineBrute keeps only pairs above threshold") {
    val pairs = EmbeddingOps.nearDupCosineBrute(emb, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("nearDupCosineLsh pairs are a subset of brute pairs, cosines equal") {
    // sf0.01: the brute twin has real pairs; every LSH pair must be one
    // of them with a bit-identical cosine. 4 planes (the registered
    // configuration — coarse buckets for recall) is non-vacuous here.
    val e = Tables(spark, "/root/testdata/sf0.01").embeddings
    val brute = EmbeddingOps.nearDupCosineBrute(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.nonEmpty)
    val lsh = EmbeddingOps.nearDupCosineLsh(e, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, cos) =>
      assert(brute.get(pair).contains(cos), s"$pair not in brute or cos differs")
    }
    // identical vectors have identical sign patterns -> always co-bucket,
    // so the route is provably non-vacuous on exact duplicates
    val tiny = EmbeddingOps.nearDupCosineLsh(emb, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny.contains((0L, 1L)))
  }

  test("semanticDedup pairs are a subset of brute pairs, cosines equal") {
    // the cluster-then-prune route: every within-cell pair must be a
    // brute pair with a bit-identical cosine (same exact-integer
    // arithmetic), and identical vectors always share a cell (they
    // rank every centroid identically, ties broken the same way), so
    // exact duplicates are provably never split across cells.
    val e = Tables(spark, "/root/testdata/sf0.01").embeddings
    val brute = EmbeddingOps.nearDupCosineBrute(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = EmbeddingOps.semanticDedup(e).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3))
    assert(sem.nonEmpty)
    sem.foreach { case (pair, cos) =>
      assert(brute.get(pair).contains(cos),
        s"$pair not in brute or cos differs")
    }
    val tiny = EmbeddingOps.semanticDedup(emb, nCentroids = 4,
        threshold = 0.99)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(tiny.contains((0L, 1L)))
  }

  test("LSH buckets identical vectors together; NN is exact in-bucket") {
    val nn = EmbeddingOps.lshNearestNeighbor(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (Option(r.getAs[Any]("nn_id")), Option(r.getAs[Any]("cos"))))
      .toMap
    // 0 and 1 are identical -> same bucket, each other's NN at cos 1.0
    assert(nn(0L)._1.contains(1L))
    assert(nn(1L)._1.contains(0L))
    assert(nn(0L)._2.contains(1.0))
  }

  test("planes are deterministic odd coefficients in [-15, 15]") {
    val p = EmbeddingOps.planes(emb)
    assert(p.count() == 8 * 64)
    val bad = p.where($"coef" < -15 || $"coef" > 15 || $"coef" % 2 === 0)
    assert(bad.count() == 0)
  }

  test("planes count scales with nPlanes") {
    assert(EmbeddingOps.planes(emb, 10).count() == 10 * 64)
  }

  test("kmeansCentroids: trained centroids beat the seed objective") {
    // Lloyd with cosine assignment + integer-requantized arithmetic
    // means does NOT guarantee per-step monotone descent (that needs
    // the normalized spherical update), so the pinned contract is the
    // robust one: training never worsens the arbitrary seed. Equality
    // is tolerated — the seed can already be a fixed point of the
    // requantized update.
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val objs = (0 to 2).map { n =>
      val cents = EmbeddingOps.kmeansCentroids(e, nCentroids = 16, iters = n)
      EmbeddingOps.kmeansObjective(e, cents)
        .collect()(0).getAs[Double]("inertia")
    }
    assert(objs(1) <= objs(0), objs.mkString(","))
    assert(objs(2) <= objs(0), objs.mkString(","))
  }

  test("pqTopK: dense ranks, monotone ADC scores, nonzero brute recall") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    // identical vectors get identical codes (same slices, same argmin)
    val codes = EmbeddingOps.pqEncode(
        EmbeddingOps.quantized(emb)).collect()
      .groupBy(_.getLong(0)).view.mapValues(
        _.map(r => r.getInt(1) -> r.getInt(2)).toMap).toMap
    assert(codes(0L) == codes(1L))
    assert(codes.values.forall(_.values.forall(c => c >= 0 && c < 16)))

    val rows = EmbeddingOps.pqTopK(e, nQueries = 3, k = 10).collect()
    assert(rows.length == 30)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10))
      val adots = sorted.map(_.getLong(3))
      assert(adots.zip(adots.tail).forall { case (x, y) => x >= y })
    }
    // the compressed scores still carry signal: some overlap with the
    // exact brute top-10
    val brute = EmbeddingOps.annTopK(e, nQueries = 3, k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).count(brute) > 0)
  }

  test("pqTrainCodebooks never worsens the seed objective") {
    // same relaxed contract as the IVF trainer: per-step monotone
    // descent is not guaranteed under integer re-quantization, so pin
    // seed-vs-trained only (equality tolerated at a fixed point)
    val e = EmbeddingOps.quantized(
      Tables(spark, "/root/testdata/sf0.001").embeddings).localCheckpoint()
    val seed = EmbeddingOps.pqObjective(e, EmbeddingOps.pqCodebooks(e))
      .collect()(0).getAs[Long]("inertia")
    val cb = EmbeddingOps.pqTrainCodebooks(e)
    val trained = EmbeddingOps.pqObjective(e, cb)
      .collect()(0).getAs[Long]("inertia")
    assert(trained <= seed, s"trained $trained > seed $seed")
    // codebook stays well-formed: <= 4 subspaces x 16 codes, full-width
    val rows = cb.collect()
    assert(rows.length <= 64)
    assert(rows.forall(_.getAs[Seq[Long]]("cq").length == 16))
  }

  test("pqRecall agrees with the direct top-k overlap") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val brute = EmbeddingOps.annTopK(e).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    val pq = EmbeddingOps.pqTopK(e).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val expected = brute.groupBy(_._1).view
      .mapValues(_.count(pq)).toMap
    val got = EmbeddingOps.pqRecall(e).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == expected(q).toLong, s"query $q")
      assert(r.getDouble(2) == expected(q).toDouble / 10)
    }
  }

  test("truncRecall is exactly 1.0 at full dimension and bounded below") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    // dims = 64 is the identity: the truncated ranking IS the brute
    // ranking, so every query's recall must be exactly 1.0
    EmbeddingOps.truncRecall(e, dims = 64).collect().foreach { r =>
      assert(r.getAs[Long]("n_overlap") == 10L)
      assert(r.getAs[Double]("recall_at_k") == 1.0)
    }
    // a real truncation loses SOME neighbors on this corpus (probed:
    // recall 0.1-0.3) but the row must stay well-formed
    val t = EmbeddingOps.truncRecall(e, dims = 16).collect()
    assert(t.length == 5)
    t.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 10L)
      assert(r.getAs[Double]("recall_at_k") == n.toDouble / 10)
    }
    assertThrows[IllegalArgumentException](
      EmbeddingOps.truncRecall(e, dims = 0))
    assertThrows[IllegalArgumentException](
      EmbeddingOps.truncRecall(e, dims = 65))
  }

  test("multiprobe LSH never finds a worse neighbor than single-probe") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val single = EmbeddingOps.lshNearestNeighbor(e)
      .select($"vec_id", $"cos".as("cos_s"))
    val multi = EmbeddingOps.lshNearestNeighborMultiprobe(e)
      .select($"vec_id", $"cos".as("cos_m"))
    single.join(multi, Seq("vec_id")).collect().foreach { r =>
      val s = Option(r.get(r.fieldIndex("cos_s"))).map(_.asInstanceOf[Double])
      val m = Option(r.get(r.fieldIndex("cos_m"))).map(_.asInstanceOf[Double])
      s.foreach { sv =>
        assert(m.nonEmpty && m.get >= sv,
          s"vec=${r.getLong(0)} single=$sv multi=$m")
      }
    }
    // probing a superset of buckets must find at least as many neighbors
    val nS = single.where($"cos_s".isNotNull).count()
    val nM = multi.where($"cos_m".isNotNull).count()
    assert(nM >= nS)
  }

  test("persisted IVF index: round trip equals live serving; probes prune partitions") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_spec").toString
    EmbeddingOps.ivfIndexWrite(e, idx)
    val queries = e.where($"vec_id" < 5)
    val served = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
    // byte-for-byte parity with the live (assign-per-call) path
    val live = EmbeddingOps.ivfTopK(e)
    assert(served.collect().map(_.toString).sorted
      .sameElements(live.collect().map(_.toString).sorted))
    // the lists scan carries a STATIC partition filter on cell — the
    // probe set is pushed as literals, so IO is probed cells only
    // the pre-adaptive physical plan: AQE's executed wrapper hides
    // leaf scans from collect()
    val scans = served.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("lists")) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the lists found")
    scans.foreach { sc =>
      assert(sc.partitionFilters.nonEmpty,
        "lists scan has no partition filter — serving reads ALL cells")
    }
    // a trained quantizer persists and serves identically too
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_spec2").toString
    EmbeddingOps.ivfIndexWrite(e, idx2, iters = 2)
    val served2 = EmbeddingOps.ivfTopKIndexed(spark, idx2, queries)
    assert(served2.select(countDistinct($"query_id")).head.getLong(0) == 5L)
  }

  test("IVF index append: incremental build equals one-shot build") {
    // the quantizer is fixed at build time, so building from the first
    // half and appending the second must serve exactly like a one-shot
    // build over the full corpus (the seed centroids — vec_id < 16 —
    // live in the first half)
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val idxInc = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_inc").toString
    EmbeddingOps.ivfIndexWrite(e.where($"vec_id" < 250), idxInc)
    EmbeddingOps.ivfIndexAppend(e.where($"vec_id" >= 250), idxInc)
    val idxFull = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_full").toString
    EmbeddingOps.ivfIndexWrite(e, idxFull)
    val queries = e.where($"vec_id" < 5)
    val inc = EmbeddingOps.ivfTopKIndexed(spark, idxInc, queries)
      .collect().map(_.toString).sorted
    val full = EmbeddingOps.ivfTopKIndexed(spark, idxFull, queries)
      .collect().map(_.toString).sorted
    assert(inc.sameElements(full))
  }

  test("persisted PQ index: codes-only round trip equals live ADC serving") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_pq_idx_spec").toString
    EmbeddingOps.pqIndexWrite(e, idx)
    val served =
      EmbeddingOps.pqTopKIndexed(spark, idx, e.where($"vec_id" < 5))
    val live = EmbeddingOps.pqTopK(e)
    assert(served.collect().map(_.toString).sorted
      .sameElements(live.collect().map(_.toString).sorted))
    // the persisted index carries CODES, never vectors: 500 vectors x
    // 4 subspaces, three scalar columns, no array anywhere
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() == 4L * e.count())
    assert(codes.schema.fields.forall(f =>
      !f.dataType.typeName.contains("array")),
      s"codes schema leaks vectors: ${codes.schema.simpleString}")
    // incremental build: half + append serves like one-shot (the seed
    // codebooks -- vec_id < 16 -- live in the first half)
    val idxInc = java.nio.file.Files
      .createTempDirectory("graft_pq_idx_inc").toString
    EmbeddingOps.pqIndexWrite(e.where($"vec_id" < 250), idxInc)
    EmbeddingOps.pqIndexAppend(e.where($"vec_id" >= 250), idxInc)
    val inc = EmbeddingOps
      .pqTopKIndexed(spark, idxInc, e.where($"vec_id" < 5))
      .collect().map(_.toString).sorted
    assert(inc.sameElements(served.collect().map(_.toString).sorted))
  }

  test("index compaction collapses the segment chain; serving is " +
    "byte-identical before and after") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    def segsOf(idx: String, dir: String): Seq[String] =
      Option(new java.io.File(s"$idx/$dir").list()).toSeq.flatten
        .filter(_.startsWith("seg="))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_compact").toString
    EmbeddingOps.ivfIndexWrite(e.where($"vec_id" < 200), idx)
    EmbeddingOps.ivfIndexAppend(
      e.where($"vec_id" >= 200 && $"vec_id" < 350), idx)
    EmbeddingOps.ivfIndexAppend(e.where($"vec_id" >= 350), idx)
    assert(segsOf(idx, "lists").size == 3)
    val before = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    assert(EmbeddingOps.ivfIndexCompact(spark, idx) == 3)
    assert(segsOf(idx, "lists") == Seq("seg=0"))
    val after = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before))
    // idempotent: an already-compact index is a no-op
    assert(EmbeddingOps.ivfIndexCompact(spark, idx) == 0)

    val pqIdx = java.nio.file.Files
      .createTempDirectory("graft_pq_idx_compact").toString
    EmbeddingOps.pqIndexWrite(e.where($"vec_id" < 250), pqIdx)
    EmbeddingOps.pqIndexAppend(e.where($"vec_id" >= 250), pqIdx)
    val pqBefore = EmbeddingOps.pqTopKIndexed(spark, pqIdx, queries)
      .collect().map(_.toString).sorted
    assert(EmbeddingOps.pqIndexCompact(spark, pqIdx) == 2)
    assert(segsOf(pqIdx, "codes") == Seq("seg=0"))
    val pqAfter = EmbeddingOps.pqTopKIndexed(spark, pqIdx, queries)
      .collect().map(_.toString).sorted
    assert(pqAfter.sameElements(pqBefore))
  }

  test("index appends are crash-atomic: a killed append leaves serving " +
    "unchanged; the retry completes it") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val batch = e.where($"vec_id" >= 250)

    // IVF: kill in BOTH crash windows — after the segment is staged
    // (hidden dir only) and after it renamed visible but before the
    // manifest commit (unreferenced dir). Serving must be unchanged
    // after each kill: the manifest still lists only seg 0, and the
    // seg IN filter makes the leftover invisible.
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_crash").toString
    EmbeddingOps.ivfIndexWrite(e.where($"vec_id" < 250), idx)
    val before = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    for (window <- Seq("staged-written", "segment-renamed")) {
      val boom = intercept[RuntimeException] {
        EmbeddingOps.ivfIndexAppend(batch, idx,
          fp => if (fp == window) throw new RuntimeException(s"kill@$fp"))
      }
      assert(boom.getMessage.contains(window))
      val after = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
        .collect().map(_.toString).sorted
      assert(after.sameElements(before),
        s"serving changed after a crash at '$window'")
    }
    // the retry clears the crashed leftovers and completes: serving
    // now equals a one-shot build over the full corpus
    EmbeddingOps.ivfIndexAppend(batch, idx)
    val idxFull = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx_crash_full").toString
    EmbeddingOps.ivfIndexWrite(e, idxFull)
    val healed = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    val oneShot = EmbeddingOps.ivfTopKIndexed(spark, idxFull, queries)
      .collect().map(_.toString).sorted
    assert(healed.sameElements(oneShot))

    // PQ twin: one window suffices to pin the shared protocol wiring
    val pqIdx = java.nio.file.Files
      .createTempDirectory("graft_pq_idx_crash").toString
    EmbeddingOps.pqIndexWrite(e.where($"vec_id" < 250), pqIdx)
    val pqBefore = EmbeddingOps.pqTopKIndexed(spark, pqIdx, queries)
      .collect().map(_.toString).sorted
    intercept[RuntimeException] {
      EmbeddingOps.pqIndexAppend(batch, pqIdx,
        fp => if (fp == "segment-renamed")
          throw new RuntimeException("kill@segment-renamed"))
    }
    val pqAfter = EmbeddingOps.pqTopKIndexed(spark, pqIdx, queries)
      .collect().map(_.toString).sorted
    assert(pqAfter.sameElements(pqBefore),
      "PQ serving changed after a crashed append")
    EmbeddingOps.pqIndexAppend(batch, pqIdx)
    val pqIdxFull = java.nio.file.Files
      .createTempDirectory("graft_pq_idx_crash_full").toString
    EmbeddingOps.pqIndexWrite(e, pqIdxFull)
    val pqHealed = EmbeddingOps.pqTopKIndexed(spark, pqIdx, queries)
      .collect().map(_.toString).sorted
    val pqOneShot = EmbeddingOps.pqTopKIndexed(spark, pqIdxFull, queries)
      .collect().map(_.toString).sorted
    assert(pqHealed.sameElements(pqOneShot))
  }

  test("persisted IVF-PQ index: round trip equals live serving; codes " +
    "carry no vectors; serving prunes cells AND segments statically") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_idx_spec").toString
    EmbeddingOps.ivfpqIndexWrite(e, idx)
    val served = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
    val live = EmbeddingOps.ivfpqTopK(e)
    assert(served.collect().map(_.toString).sorted
      .sameElements(live.collect().map(_.toString).sorted))
    // the stored codes are M scalar rows per vector — no array column
    // anywhere (product quantization's entire point)
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() == 4L * e.count())
    assert(codes.schema.fields.forall(f =>
      !f.dataType.typeName.contains("array")),
      s"codes schema leaks vectors: ${codes.schema.simpleString}")
    // the codes scan carries STATIC partition filters (probed cells +
    // committed segments) — serve IO is probed cells' code rows only
    val scans = served.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("codes")) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the codes found")
    scans.foreach { sc =>
      val f = sc.partitionFilters.map(_.sql).mkString(" AND ")
      assert(sc.partitionFilters.nonEmpty &&
        f.contains("cell") && f.contains("seg"),
        s"codes scan misses a static partition filter: $f")
    }
  }

  test("ivfpqTopKRerank: exact re-rank lifts recall at equal R; " +
    "vector-index tombstones mask served candidates") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val pqIdx = java.nio.file.Files
      .createTempDirectory("graft_rerank_pq").toString
    val ivIdx = java.nio.file.Files
      .createTempDirectory("graft_rerank_iv").toString
    EmbeddingOps.ivfpqIndexWrite(e, pqIdx)
    EmbeddingOps.ivfIndexWrite(e, ivIdx)
    // the persisted two-stage serve re-ranks the SAME top-30 ADC
    // candidates the live card measures — per query, the exact pass
    // can only use candidates ADC surfaced, so its output is a
    // reordering/subset of them
    val cand = EmbeddingOps.ivfpqTopKIndexed(spark, pqIdx, queries,
        k = 30).select($"query_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = EmbeddingOps.ivfpqTopKRerank(spark, pqIdx, ivIdx,
      queries)
    served.select($"query_id", $"vec_id").collect()
      .foreach(r => assert(cand((r.getLong(0), r.getLong(1)))))
    // recall card: the exact stage never ranks candidates WORSE than
    // ADC's quantized scores do (per query, overlap with brute top-k
    // is >= the ADC arm's on this fixture)
    val rec = EmbeddingOps.ivfpqRerankRecall(e).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      val (nAdc, nRer) = (r.getAs[Long]("n_adc"), r.getAs[Long]("n_rerank"))
      assert(nRer >= nAdc,
        s"rerank lost recall vs ADC for query ${r.get(0)}: $nRer < $nAdc")
    }
    // deleting a served vec from the VECTOR index masks it from the
    // two-stage serve (the refinement respects both indexes' deletes)
    val victim = served.where($"rk" === 1)
      .select($"vec_id").limit(1).collect()(0).getLong(0)
    EmbeddingOps.indexDelete(spark, ivIdx,
      Seq(victim).toDF("vec_id"))
    val after = EmbeddingOps.ivfpqTopKRerank(spark, pqIdx, ivIdx,
      queries)
    assert(after.where($"vec_id" === victim).count() === 0L)
  }

  test("IVF-PQ index append: incremental equals one-shot; a killed " +
    "append leaves serving unchanged; compaction is byte-identical") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val batch = e.where($"vec_id" >= 250)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_idx_inc").toString
    // both quantizers (seed centroids AND residual codebooks — vec_id
    // < 16) live in the first half, so half + append must serve
    // exactly like a one-shot build over the full corpus
    EmbeddingOps.ivfpqIndexWrite(e.where($"vec_id" < 250), idx)
    val before = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    // crash window: segment renamed visible but manifest not committed
    val boom = intercept[RuntimeException] {
      EmbeddingOps.ivfpqIndexAppend(batch, idx,
        fp => if (fp == "segment-renamed")
          throw new RuntimeException("kill@segment-renamed"))
    }
    assert(boom.getMessage.contains("segment-renamed"))
    val after = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before),
      "serving changed after a crashed IVF-PQ append")
    // the retry completes; incremental == one-shot
    EmbeddingOps.ivfpqIndexAppend(batch, idx)
    val idxFull = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_idx_full").toString
    EmbeddingOps.ivfpqIndexWrite(e, idxFull)
    val inc = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    val full = EmbeddingOps.ivfpqTopKIndexed(spark, idxFull, queries)
      .collect().map(_.toString).sorted
    assert(inc.sameElements(full))
    // compaction collapses the 2-segment chain; serving unchanged
    assert(EmbeddingOps.ivfpqIndexCompact(spark, idx) == 2)
    assert(Option(new java.io.File(s"$idx/codes").list()).toSeq.flatten
      .filter(_.startsWith("seg=")) == Seq("seg=0"))
    val compacted = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    assert(compacted.sameElements(inc))
    assert(EmbeddingOps.ivfpqIndexCompact(spark, idx) == 0)
  }

  test("indexSnapshot: pinned serving replays the capture-time view " +
    "bit-identically under appends and deletes; compaction and " +
    "rebuild expire it loudly") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_idx").toString
    EmbeddingOps.ivfpqIndexWrite(e.where($"vec_id" < 250), idx)
    val snap = EmbeddingOps.indexSnapshot(spark, idx)
    val at = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    // mutate underneath the snapshot: an append AND a delete of a
    // currently-served vector
    EmbeddingOps.ivfpqIndexAppend(e.where($"vec_id" >= 250), idx)
    val victim = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap))
      .where($"rk" === 1).select($"vec_id").limit(1)
      .collect()(0).getLong(0)
    EmbeddingOps.indexDelete(spark, idx, Seq(victim).toDF("vec_id"))
    // pinned == the capture-time serve, bit-identical; live differs
    // (new vectors visible, the victim masked)
    val pinned = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
      asOf = Some(snap)).collect().map(_.toString).sorted
    assert(pinned.sameElements(at),
      "pinned serve drifted from the capture-time view")
    val live = EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries)
      .collect()
    assert(live.forall(_.getAs[Long]("vec_id") != victim))
    assert(!live.map(_.toString).sorted.sameElements(at))
    // a fresh snapshot pins the MUTATED view
    val snap2 = EmbeddingOps.indexSnapshot(spark, idx)
    assert(EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap2)).collect().map(_.toString).sorted
      .sameElements(live.map(_.toString).sorted))
    // compaction rewrites the tree, but the replaced incarnation is
    // RETAINED one epoch back: both pre-compaction tokens keep
    // serving bit-identically from the retired tree (the retention
    // grace a long training run rides)
    assert(EmbeddingOps.ivfpqIndexCompact(spark, idx) == 2)
    assert(EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap)).collect().map(_.toString).sorted
      .sameElements(at), "retained pinned serve drifted (snap)")
    assert(EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap2)).collect().map(_.toString).sorted
      .sameElements(live.map(_.toString).sorted),
      "retained pinned serve drifted (snap2)")
    // a post-compaction snapshot serves the (unchanged) live view...
    val snap3 = EmbeddingOps.indexSnapshot(spark, idx)
    assert(EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap3)).collect().map(_.toString).sorted
      .sameElements(live.map(_.toString).sorted))
    // ...and a rebuild (the SECOND swap) prunes the older retired
    // tree: the pre-compaction tokens now refuse loudly, while the
    // pre-rebuild token rides the grace one more epoch
    EmbeddingOps.ivfpqIndexWrite(e, idx)
    for (dead <- Seq(snap, snap2)) {
      val err = intercept[IllegalArgumentException] {
        EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
          asOf = Some(dead))
      }
      assert(err.getMessage.contains("snapshot expired"))
    }
    assert(EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap3)).collect().map(_.toString).sorted
      .sameElements(live.map(_.toString).sorted))
    // a third swap retires the rebuilt tree and prunes snap3's
    EmbeddingOps.ivfpqIndexWrite(e, idx)
    val err2 = intercept[IllegalArgumentException] {
      EmbeddingOps.ivfpqTopKIndexed(spark, idx, queries,
        asOf = Some(snap3))
    }
    assert(err2.getMessage.contains("snapshot expired"))
    // a non-index path refuses at capture
    val err3 = intercept[IllegalArgumentException] {
      EmbeddingOps.indexSnapshot(spark, s"$idx/definitely-not-an-index")
    }
    assert(err3.getMessage.contains("not an index root"))
  }

  test("snapshot tokens persist: snapshotWrite/snapshotRead round-trips " +
    "and the re-read token serves the pinned IVF view; malformed or " +
    "missing tokens refuse") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snaptok_idx").toString
    EmbeddingOps.ivfIndexWrite(e.where($"vec_id" < 250), idx)
    val snap = EmbeddingOps.indexSnapshot(spark, idx)
    val tok = s"$idx-token.json"
    EmbeddingOps.snapshotWrite(spark, tok, snap)
    assert(EmbeddingOps.snapshotRead(spark, tok) == snap,
      "token did not round-trip")
    val at = EmbeddingOps.ivfTopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    // mutate underneath: append + delete a currently-served vector
    EmbeddingOps.ivfIndexAppend(e.where($"vec_id" >= 250), idx)
    val victim = EmbeddingOps.ivfTopKIndexed(spark, idx, queries,
        asOf = Some(snap))
      .where($"rk" === 1).select($"vec_id").limit(1)
      .collect()(0).getLong(0)
    EmbeddingOps.indexDelete(spark, idx, Seq(victim).toDF("vec_id"))
    // the RE-READ token replays the capture-time serve bit-identically
    val pinned = EmbeddingOps.ivfTopKIndexed(spark, idx, queries,
        asOf = Some(EmbeddingOps.snapshotRead(spark, tok)))
      .collect().map(_.toString).sorted
    assert(pinned.sameElements(at),
      "re-read token drifted from the capture-time view")
    val live = EmbeddingOps.ivfTopKIndexed(spark, idx, queries).collect()
    assert(live.forall(_.getAs[Long]("vec_id") != victim))
    // a token with deletions captures the non-empty tombstone sets too
    val snap2 = EmbeddingOps.indexSnapshot(spark, idx)
    assert(snap2.delSegs.nonEmpty)
    EmbeddingOps.snapshotWrite(spark, tok, snap2)
    assert(EmbeddingOps.snapshotRead(spark, tok) == snap2)
    // missing and malformed tokens refuse loudly
    val miss = intercept[IllegalArgumentException] {
      EmbeddingOps.snapshotRead(spark, s"$idx-no-such-token.json")
    }
    assert(miss.getMessage.contains("no snapshot token"))
    // fresh path: overwriting `tok` with nio would leave Hadoop's
    // stale .crc sidecar behind and fail on checksum, not on parse
    val badTok = s"$idx-bad-token.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(badTok),
      """{"epoch":1,"dataSegs":"oops"}""".getBytes("UTF-8"))
    val bad = intercept[IllegalArgumentException] {
      EmbeddingOps.snapshotRead(spark, badTok)
    }
    assert(bad.getMessage.contains("malformed snapshot token"))
  }

  test("embQualityCard flags null/empty/NaN/zero/mismatched vectors " +
    "and pins quantized norm extremes over clean modal-width rows") {
    val typed = embDf(Seq(
      (1L, Seq(1.0f, 0.0f), 0), // nn 1_000_000
      (2L, Seq(0.5f, 0.5f), 0), // nn 500_000
      (3L, Seq(2.0f, 0.0f), 0), // nn 4_000_000
      (4L, Seq(0.0f, 0.0f), 0), // zero vector: clean width, norm 0
      (5L, Seq(Float.NaN, 1.0f), 0), // NaN — excluded from norm stats
      (6L, Seq(1.0f, 1.0f, 1.0f), 0), // width 3: mismatch
      (7L, Seq.empty[Float], 0))) // empty
    val withNull = typed.unionByName(
      spark.sql("SELECT CAST(8 AS BIGINT) AS vec_id, " +
        "CAST(NULL AS ARRAY<FLOAT>) AS embedding, 0 AS label"))
    val c = EmbeddingOps.embQualityCard(withNull).collect()(0)
    assert(c.getAs[Long]("n_vecs") == 8L)
    assert(c.getAs[Long]("n_null_vec") == 1L)
    assert(c.getAs[Long]("n_empty") == 1L)
    assert(c.getAs[Long]("n_nan") == 1L)
    assert(c.getAs[Long]("n_zero_norm") == 1L)
    assert(c.getAs[Long]("dim_mode") == 2L)
    // non-null rows disagreeing with the modal width: the 3-wide and
    // the empty one
    assert(c.getAs[Long]("n_dim_mismatch") == 2L)
    // norm extremes over clean modal rows only (1-4): the zero
    // vector legitimately sets min_nn = 0 — that is the gate signal
    assert(c.getAs[Long]("min_nn") == 0L)
    assert(c.getAs[Long]("max_nn") == 4000000L)
  }

  test("embQualityCard on a fully-NULL batch still counts the batch " +
    "(the mode frame must not annihilate the card)") {
    // regression: the modal-width frame used to be an orderBy+limit(1)
    // — EMPTY on an all-NULL batch, and the crossJoin zeroed the whole
    // card (n_vecs=0 for a non-empty, fully-broken batch:
    // indistinguishable from an empty one)
    val allNull = spark.sql("SELECT id AS vec_id, " +
      "CAST(NULL AS ARRAY<FLOAT>) AS embedding, 0 AS label " +
      "FROM range(5)")
    val c = EmbeddingOps.embQualityCard(allNull).collect()(0)
    assert(c.getAs[Long]("n_vecs") == 5L)
    assert(c.getAs[Long]("n_null_vec") == 5L)
    assert(c.isNullAt(c.fieldIndex("dim_mode")))
    assert(c.getAs[Long]("n_dim_mismatch") == 0L)
  }

  test("indexDiff classifies keys added and removed between two pinned " +
    "views; appended-then-deleted keys are in neither; unordered or " +
    "expired tokens refuse") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val aSlice = e.where($"vec_id" < 250)
    val bSlice = e.where($"vec_id" >= 250)
    val nB = bSlice.count()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_diff_idx").toString
    EmbeddingOps.sq8IndexWrite(aSlice, idx)
    val from = EmbeddingOps.indexSnapshot(spark, idx)
    val queries = e.where($"vec_id" < 5)
    val atBuild = EmbeddingOps.sq8TopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    EmbeddingOps.sq8IndexAppend(bSlice, idx)
    // victims: two from the build slice, one from the appended slice
    EmbeddingOps.indexDelete(spark, idx,
      Seq(10L, 20L, 300L).toDF("vec_id"))
    val to = EmbeddingOps.indexSnapshot(spark, idx)
    val diff = EmbeddingOps.indexDiff(spark, idx, "codes", from, to)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val added = diff.collect { case (id, "added") => id }.toSet
    val removed = diff.collect { case (id, "removed") => id }.toSet
    // ONE ROW PER CHANGED KEY — a family storing several rows per key
    // (PQ: one per (key, sub)) must not leak multiplicity into the
    // audit (the sim_index_diff oracle counts rows, not key sets)
    assert(diff.length == added.size + removed.size,
      s"indexDiff emitted duplicate key rows: ${diff.length} rows " +
        s"for ${added.size + removed.size} changed keys")
    assert(removed == Set(10L, 20L),
      s"removed leg wrong: $removed")
    assert(added.size == nB - 1 && !added.contains(300L) &&
      added.forall(_ >= 250L),
      "added leg must be the appended slice minus its deleted key")
    // the sq8 serve pinned to `from` still replays the build-time view
    assert(EmbeddingOps.sq8TopKIndexed(spark, idx, queries,
        asOf = Some(from)).collect().map(_.toString).sorted
      .sameElements(atBuild))
    // a token diffed against itself is empty
    assert(EmbeddingOps.indexDiff(spark, idx, "codes", to, to)
      .count() == 0)
    // reversed order refuses
    val uno = intercept[IllegalArgumentException] {
      EmbeddingOps.indexDiff(spark, idx, "codes", to, from)
    }
    assert(uno.getMessage.contains("not ordered"))
    // a rebuild bumps the epoch, but BOTH tokens share the retired
    // incarnation — the audit still replays under the retention grace
    EmbeddingOps.sq8IndexWrite(e, idx)
    val diffRetained = EmbeddingOps.indexDiff(spark, idx, "codes",
      from, to).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(diffRetained.sorted.sameElements(diff.sorted),
      "retained diff drifted from the live-epoch diff")
    // a token from the POST-rebuild epoch cannot diff against a
    // pre-rebuild one: segment arithmetic spans incarnations
    val after = EmbeddingOps.indexSnapshot(spark, idx)
    val cross = intercept[IllegalArgumentException] {
      EmbeddingOps.indexDiff(spark, idx, "codes", to, after)
    }
    assert(cross.getMessage.contains("epoch boundary"))
    // a second rebuild prunes the retired tree -> both tokens expire
    EmbeddingOps.sq8IndexWrite(e, idx)
    val dead = intercept[IllegalArgumentException] {
      EmbeddingOps.indexDiff(spark, idx, "codes", from, to)
    }
    assert(dead.getMessage.contains("snapshot expired"))
  }

  test("index deletion: tombstones mask vectors in all three servings, " +
    "crash-atomically; compaction applies and clears them") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val victims = e.where($"vec_id" >= 20 && $"vec_id" < 30)
      .select($"vec_id")
    val rest = e.where($"vec_id" < 20 || $"vec_id" >= 30)
    def build(kind: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_${kind}_del").toString
      kind match {
        case "ivf" => EmbeddingOps.ivfIndexWrite(e, p)
        case "pq" => EmbeddingOps.pqIndexWrite(e, p)
        case "ivfpq" => EmbeddingOps.ivfpqIndexWrite(e, p)
      }
      p
    }
    def serve(kind: String, p: String): Array[String] = (kind match {
      case "ivf" => EmbeddingOps.ivfTopKIndexed(spark, p, queries)
      case "pq" => EmbeddingOps.pqTopKIndexed(spark, p, queries)
      case "ivfpq" => EmbeddingOps.ivfpqTopKIndexed(spark, p, queries)
    }).collect().map(_.toString).sorted
    for (kind <- Seq("ivf", "pq", "ivfpq")) {
      val idx = build(kind)
      val before = serve(kind, idx)
      // both crash windows: serving unchanged after a killed delete
      for (window <- Seq("staged-written", "segment-renamed")) {
        intercept[RuntimeException] {
          EmbeddingOps.indexDelete(spark, idx, victims,
            fp => if (fp == window)
              throw new RuntimeException(s"kill@$fp"))
        }
        assert(serve(kind, idx).sameElements(before),
          s"$kind serving changed after a crashed delete at $window")
      }
      // the committed delete serves exactly like an index built over
      // the corpus WITHOUT the victims (per-vector assignment against
      // shared quantizers — vec_id < 16 seeds survive)
      EmbeddingOps.indexDelete(spark, idx, victims)
      val restIdx = java.nio.file.Files
        .createTempDirectory(s"graft_${kind}_del_rest").toString
      kind match {
        case "ivf" => EmbeddingOps.ivfIndexWrite(rest, restIdx)
        case "pq" => EmbeddingOps.pqIndexWrite(rest, restIdx)
        case "ivfpq" => EmbeddingOps.ivfpqIndexWrite(rest, restIdx)
      }
      val masked = serve(kind, idx)
      assert(masked.sameElements(serve(kind, restIdx)),
        s"$kind tombstoned serving != subset-built serving")
      // compaction drops the rows physically and clears the tombstones
      val dataDir = if (kind == "ivf") "lists" else "codes"
      val compacted = kind match {
        case "ivf" => EmbeddingOps.ivfIndexCompact(spark, idx)
        case "pq" => EmbeddingOps.pqIndexCompact(spark, idx)
        case "ivfpq" => EmbeddingOps.ivfpqIndexCompact(spark, idx)
      }
      assert(compacted == 1, s"$kind compaction skipped the tombstones")
      assert(!new java.io.File(s"$idx/dels").exists() &&
        !new java.io.File(s"$idx/_dels").exists(),
        s"$kind compaction left tombstones behind")
      val perVec = if (kind == "ivf") 1L else 4L
      assert(spark.read.parquet(s"$idx/$dataDir").count() ==
        perVec * (e.count() - 10))
      assert(serve(kind, idx).sameElements(masked),
        s"$kind serving changed across compaction")
      // now genuinely compact and tombstone-free
      val again = kind match {
        case "ivf" => EmbeddingOps.ivfIndexCompact(spark, idx)
        case "pq" => EmbeddingOps.pqIndexCompact(spark, idx)
        case "ivfpq" => EmbeddingOps.ivfpqIndexCompact(spark, idx)
      }
      assert(again == 0)
    }
  }

  test("IVF-PQ recall row is well-formed and bounded by construction") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val r = EmbeddingOps.ivfpqRecall(e).collect()
    assert(r.length == 5)
    r.foreach { row =>
      val n = row.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 10L)
      assert(row.getAs[Double]("recall_at_k") == n.toDouble / 10)
    }
  }

  test("filtered IVF serving: label predicate reaches the lists scan " +
    "as a pushed filter; results are the unfiltered ranking's matches " +
    "re-ranked") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_filtered").toString
    EmbeddingOps.ivfIndexWrite(e, idx)
    val served = EmbeddingOps.ivfTopKIndexedWhere(
      spark, idx, queries, $"label" === 1)
    val rows = served.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("label") == 1))
    // the predicate must reach the parquet reader: the lists scan
    // carries BOTH the static cell partition filter AND a pushed
    // label data filter
    val scans = served.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("lists")) => sc
    }
    assert(scans.nonEmpty, "no parquet scan of the lists found")
    scans.foreach { sc =>
      assert(sc.partitionFilters.nonEmpty,
        "filtered serving lost the static cell prune")
      assert(sc.dataFilters.exists(_.toString.contains("label")),
        s"label predicate not pushed to the scan: ${sc.dataFilters}")
    }
    // correctness cross-check: ranking label-1 candidates only ==
    // taking the unfiltered route's scored candidates, filtering by
    // label, and re-ranking (same probes, same cosine) — here via a
    // larger unfiltered k so the filtered top-k is covered
    val unf = EmbeddingOps.ivfTopKIndexed(spark, idx, queries, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.foreach { r =>
      assert(unf.contains((r.getLong(0), r.getAs[Long]("vec_id"))))
    }
  }

  test("sq8 codes are bytes and reconstructions stay within one step") {
    val q = EmbeddingOps.quantized(emb)
    val rc = EmbeddingOps.sq8Reconstructed(q).collect()
    def seqOf(row: org.apache.spark.sql.Row, name: String): Seq[Long] =
      row.getSeq[Long](row.fieldIndex(name))
    rc.foreach { row =>
      val qs = seqOf(row, "q")
      val cs = seqOf(row, "c")
      val rs = seqOf(row, "r")
      assert(cs.forall(c => c >= 0L && c <= 255L))
      // per-dim range over the 4-vector fixture: the reconstruction in
      // 255ths must sit within one quantization step (mx-mn) of the
      // exact value scaled by 255
      qs.indices.foreach { i =>
        val col = rc.map(seqOf(_, "q")(i))
        val step = col.max - col.min
        assert(math.abs(rs(i) - qs(i) * 255L) <= step)
      }
    }
  }

  test("sq8TopK still ranks the identical vector first") {
    val top = EmbeddingOps.sq8TopK(emb, nQueries = 1, k = 3).collect()
    assert(top(0).getAs[Long]("vec_id") == 1L)
    assert(top(0).getAs[Double]("cos") == 1.0)
  }

  test("persisted SQ8 index: codes-only round trip equals live " +
    "ranking; a killed append leaves serving unchanged; appended " +
    "vectors become findable") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = e.where($"vec_id" < 5)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_sq8_idx").toString
    EmbeddingOps.sq8IndexWrite(e, idx)
    // the stored representation carries no embedding/q column at all
    // (seg is the discovered partition-layout column, not data)
    val codeCols =
      spark.read.parquet(s"$idx/codes").schema.fieldNames.toSet
    assert(codeCols == Set("vec_id", "label", "c", "seg"))
    val live = EmbeddingOps.sq8TopK(e).collect().map(_.toString).sorted
    val served = EmbeddingOps.sq8TopKIndexed(spark, idx, queries)
      .collect().map(_.toString).sorted
    assert(served.sameElements(live))

    // crash windows: build over half, kill the append both ways —
    // serving unchanged; retry completes and the appended
    // exact-duplicate vector ranks first for its query
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft_sq8_idx_inc").toString
    EmbeddingOps.sq8IndexWrite(e.where($"vec_id" < 250), idx2)
    val before = EmbeddingOps.sq8TopKIndexed(spark, idx2, queries)
      .collect().map(_.toString).sorted
    for (window <- Seq("staged-written", "segment-renamed")) {
      val boom = intercept[RuntimeException] {
        EmbeddingOps.sq8IndexAppend(e.where($"vec_id" >= 250), idx2,
          fp => if (fp == window) throw new RuntimeException(s"kill@$fp"))
      }
      assert(boom.getMessage.contains(window))
      val after = EmbeddingOps.sq8TopKIndexed(spark, idx2, queries)
        .collect().map(_.toString).sorted
      assert(after.sameElements(before),
        s"serving changed after a crash at '$window'")
    }
    EmbeddingOps.sq8IndexAppend(e.where($"vec_id" >= 250), idx2)
    val healed = EmbeddingOps.sq8TopKIndexed(spark, idx2, queries)
      .collect()
    // pre-append the index could only serve vec_id < 250; the healed
    // append makes the new half findable (the live full ranking keeps
    // several >= 250 vectors in its top-10s)
    assert(healed.map(_.getAs[Long]("vec_id")).exists(_ >= 250L))
  }

  test("sq8Recall at sf0.001 is high but honest (not assumed 1.0)") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val r = EmbeddingOps.sq8Recall(e).collect()
    assert(r.length == 5)
    r.foreach { row =>
      val n = row.getAs[Long]("n_overlap")
      assert(n >= 5L && n <= 10L) // 8-bit codes: near-exact ranking
      assert(row.getAs[Double]("recall_at_k") == n.toDouble / 10)
    }
  }

  test("dimStats computes exact per-dimension min/max/median") {
    // dim 0 values (milli-quantized): 1000, 3000, 2000, 5000, 4000
    // -> sorted 1000..5000, lower median 3000; dim 1 constant
    val e = embDf(Seq(
      (0L, Seq(1f, 7f, 0f, 0f), 0), (1L, Seq(3f, 7f, 0f, 0f), 0),
      (2L, Seq(2f, 7f, 0f, 0f), 0), (3L, Seq(5f, 7f, 0f, 0f), 0),
      (4L, Seq(4f, 7f, 0f, 0f), 0)))
    val r = EmbeddingOps.dimStats(e).collect()
      .map(x => x.getAs[Int]("c") ->
        (x.getAs[Long]("min_q"), x.getAs[Long]("max_q"),
          x.getAs[Long]("median_q"))).toMap
    assert(r(0) == ((1000L, 5000L, 3000L)))
    assert(r(1) == ((7000L, 7000L, 7000L)))
    assert(r(2) == ((0L, 0L, 0L)))
    // even count: the LOWER median is selected
    val e2 = embDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(2f, 0f, 0f, 0f), 0),
      (2L, Seq(3f, 0f, 0f, 0f), 0), (3L, Seq(4f, 0f, 0f, 0f), 0)))
    val m2 = EmbeddingOps.dimStats(e2).collect()
      .find(_.getAs[Int]("c") == 0).get.getAs[Long]("median_q")
    assert(m2 == 2000L)
  }

  test("centroidClassify separates orthogonal label clusters exactly") {
    // three orthogonal label clusters of two identical vectors each:
    // every vector's nearest centroid is its own label -> a diagonal
    // confusion matrix
    val e = embDf(Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f), 3L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 0f, 1f, 0f), 5L -> Seq(0f, 0f, 1f, 0f))
      .map { case (id, v) => (id, v, (id / 2).toInt) })
    val r = EmbeddingOps.centroidClassify(e).collect()
      .map(x => (x.getAs[Int]("label"), x.getAs[Int]("pred")) ->
        x.getAs[Long]("n_vecs")).toMap
    assert(r == Map((0, 0) -> 2L, (1, 1) -> 2L, (2, 2) -> 2L))
    // a mislabeled vector lands in the off-diagonal cell
    val e2 = embDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(0f, 1f, 0f, 0f), 1), (3L, Seq(0f, 1f, 0f, 0f), 1),
      (4L, Seq(1f, 0f, 0f, 0f), 1))) // label 1, sits in cluster 0
    val r2 = EmbeddingOps.centroidClassify(e2).collect()
      .map(x => (x.getAs[Int]("label"), x.getAs[Int]("pred")) ->
        x.getAs[Long]("n_vecs")).toMap
    assert(r2((1, 0)) == 1L) // the planted confusion
    assert(r2((0, 0)) == 2L)
  }

  test("projRecall at sf0.001 is high but honest (not assumed 1.0)") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val r = EmbeddingOps.projRecall(e).collect()
    assert(r.length == 5)
    r.foreach { row =>
      val n = row.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 10L)
      assert(row.getAs[Double]("recall_at_k") == n.toDouble / 10)
    }
    // the 4x compression is genuinely lossy on this corpus (all
    // cosines are tight), but it cannot be random noise everywhere:
    // some brute neighbor survives the sketch across the query set
    assert(r.map(_.getAs[Long]("n_overlap")).sum > 0L)
    // identical vectors stay identical under any projection: a corpus
    // of twins ranks its twin first in projected space too
    val twins = embDf((0L to 5L).map(i =>
      (i, Seq.tabulate(64)(j => if (j == (i / 2).toInt) 1f else 0f),
        (i % 3).toInt)))
    val top = EmbeddingOps.projTopK(twins, nQueries = 2, k = 1).collect()
    assert(top.map(r2 => r2.getAs[Long]("query_id") ->
      r2.getAs[Long]("vec_id")).toMap == Map(0L -> 1L, 1L -> 0L))
  }

  test("marginMine pairs orthogonal even/odd twins mutually") {
    // three orthogonal directions, one even/odd twin per direction:
    // the mined set is exactly the diagonal matching, each with
    // margin_q = 1e6*8*1000 div 2e6 = 4000 (cq saturates the top-k
    // sums on both sides; cross pairs have cq = 0 and never mine)
    val e = embDf(Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f), 3L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 0f, 1f, 0f), 5L -> Seq(0f, 0f, 1f, 0f))
      .map { case (id, v) => (id, v, (id % 3).toInt) })
    val r = EmbeddingOps.marginMine(e).collect()
    val pairs = r.map(x =>
      (x.getAs[Long]("vec_a"), x.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((0L, 1L), (2L, 3L), (4L, 5L)))
    assert(r.map(_.getAs[Long]("margin_q")).forall(_ == 4000L))
    // mutual-best mining always yields a partial matching
    assert(r.map(_.getAs[Long]("vec_a")).distinct.length == r.length)
    assert(r.map(_.getAs[Long]("vec_b")).distinct.length == r.length)
  }

  test("marginMine suppresses the hub side: a near-parallel decoy " +
      "cannot steal a mutual pair from the true twin") {
    // vec 0's true twin is vec 1; vec 7 is a decoy close to BOTH even
    // vectors 0 and 6, so its neighborhood sum is large and its margin
    // against any single partner shrinks — the classic hub penalty
    val e = embDf(Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f, 0f),
      6L -> Seq(0.9f, 0.1f, 0f, 0f), 7L -> Seq(0.95f, 0.05f, 0f, 0f))
      .map { case (id, v) => (id, v, 0) })
    val r = EmbeddingOps.marginMine(e, kNn = 2).collect()
    val pairs = r.map(x =>
      (x.getAs[Long]("vec_a"), x.getAs[Long]("vec_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(r.map(_.getAs[Long]("vec_a")).distinct.length == r.length)
  }

  test("marginMineLsh recovers identical-twin pairs (equal vectors " +
      "always co-bucket) and stays a partial matching") {
    val e = embDf(Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f), 3L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 0f, 1f, 0f), 5L -> Seq(0f, 0f, 1f, 0f))
      .map { case (id, v) => (id, v, (id % 3).toInt) })
    val r = EmbeddingOps.marginMineLsh(e, nPlanes = 4).collect()
    val pairs = r.map(x =>
      (x.getAs[Long]("vec_a"), x.getAs[Long]("vec_b"))).toSet
    // every diagonal twin co-buckets by construction; orthogonal
    // cross pairs have cq = 0 and can never mine even when candidates
    assert(pairs == Set((0L, 1L), (2L, 3L), (4L, 5L)))
    assert(r.map(_.getAs[Long]("vec_a")).distinct.length == r.length)
    assert(r.map(_.getAs[Long]("vec_b")).distinct.length == r.length)
  }

  test("truncIndexBuild: driver-side width selection (cheapest clearing " +
    "the floor, widest as fallback), sidecar-stamped tier, served " +
    "recall equals the sweep arm, tombstones mask") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    // floor 0: every candidate clears it -> the CHEAPEST width wins
    val p0 = java.nio.file.Files
      .createTempDirectory("graft_trunc_min").resolve("t").toString
    assert(EmbeddingOps.truncIndexBuild(e, p0, recallFloorMilli = 0L)
      === 8)
    assert(EmbeddingOps.truncIndexDim(spark, p0) === 8)
    // the tier stores ONLY the chosen width (selection happened before
    // the build, driver-side on the sweep card — not a per-row choice)
    val widths = spark.read.parquet(s"$p0/vecs")
      .selectExpr("size(q) AS w").distinct()
      .collect().map(_.getAs[Int]("w")).toSeq
    assert(widths === Seq(8))
    // floor 1001 (> any possible recall): nothing clears -> the widest
    // candidate serves as the best-available fallback
    val p1 = java.nio.file.Files
      .createTempDirectory("graft_trunc_max").resolve("t").toString
    assert(EmbeddingOps.truncIndexBuild(e, p1, recallFloorMilli = 1001L)
      === 32)
    // served recall rows equal the sweep's same-width arm (the serve
    // reads the PERSISTED tier; the sweep computes live — parity pins
    // that the tier's contents are the sliced corpus)
    val served = EmbeddingOps.truncServeRecall(spark, p1, e)
      .collect().map(_.toString).sorted
    val arm = EmbeddingOps.truncRecallSweep(e, dims = Seq(32))
      .collect().map(_.toString).sorted
    assert(served.length === 5 && served.sameElements(arm))
    // the standard tombstone protocol works on the tier: delete a
    // stored vector and the serve equals a tier built WITHOUT it
    val victim = 37L
    EmbeddingOps.indexDelete(spark, p1,
      Seq(victim).toDF("vec_id"))
    val p2 = java.nio.file.Files
      .createTempDirectory("graft_trunc_rest").resolve("t").toString
    EmbeddingOps.truncIndexBuild(e.where($"vec_id" =!= victim), p2,
      recallFloorMilli = 1001L)
    val masked = EmbeddingOps.truncServeRecall(spark, p1, e)
      .collect().map(_.toString).sorted
    val rebuilt = EmbeddingOps.truncServeRecall(spark, p2, e)
      .collect().map(_.toString).sorted
    assert(masked.sameElements(rebuilt),
      "tombstoned trunc-tier serving != subset-built serving")
  }

  test("assignedCells/probedCells over-cap broadcast routes equal the " +
    "window reference; plans carry a broadcast and no window") {
    // 100 hash-derived vectors, 80 seed centroids — above
    // MaxLiteralCentroids (64), so both helpers must take the
    // broadcast arm instead of embedding 80 typedlit structs. The
    // ground truth is the rankedAgainst definition itself (cross-join
    // + row_number window), rebuilt here verbatim.
    assert(EmbeddingOps.MaxLiteralCentroids < 80)
    val big = embDf((0L until 100L).map { i =>
      (i, pad(Seq.tabulate(8) { j =>
        (((i * 8 + j) * 2654435761L % 2000) - 1000) / 1000.0f
      }), (i % 3).toInt)
    })
    val e = EmbeddingOps.quantized(big)
    val cents = EmbeddingOps.seedCentroids(e, 80)
    val ref = EmbeddingOps.rankedAgainst(e, cents)
    // argmax route: e's columns + (cent_id, ccos) must equal crk = 1
    val got = EmbeddingOps.assignedCells(e, cents)
      .select($"vec_id", $"cent_id", $"ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val want = ref.where($"crk" === 1)
      .select($"vec_id", $"cent_id", $"ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == want, "over-cap assignedCells != window crk=1")
    // probe route: the (vec_id, cent_id) pair set must equal crk <= 3
    val gotP = EmbeddingOps.probedCells(e.where($"vec_id" < 5), cents, 3)
      .select($"vec_id", $"cent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wantP = ref.where($"vec_id" < 5 && $"crk" <= 3)
      .select($"vec_id", $"cent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotP == wantP, "over-cap probedCells != window crk<=nProbe")
    // plan shape: the over-cap assignment broadcasts the centroid
    // frame (no typedlit bloat) and plans NO window; the under-cap
    // route embeds literals and plans neither window nor broadcast
    def shapes(df: org.apache.spark.sql.DataFrame) = {
      val p = df.queryExecution.executedPlan
      (p.toString.contains("BroadcastExchange") ||
        p.toString.contains("BroadcastQueryStage"),
        p.toString.contains(" Window") || p.toString.contains("Window ["))
    }
    val (bigBc, bigWin) = shapes(EmbeddingOps.assignedCells(e, cents))
    assert(bigBc, "over-cap assignedCells plans no BroadcastExchange")
    assert(!bigWin, "over-cap assignedCells re-grew a Window")
    val small = EmbeddingOps.seedCentroids(e, 16)
    val (smallBc, smallWin) =
      shapes(EmbeddingOps.assignedCells(e, small))
    assert(!smallBc && !smallWin,
      "literal assignedCells grew an exchange or window")
    // under-cap probe slice: same pair set as the window, no window
    val gotS = EmbeddingOps.probedCells(e.where($"vec_id" < 5), small, 3)
      .select($"vec_id", $"cent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wantS = EmbeddingOps.rankedAgainst(e, small)
      .where($"vec_id" < 5 && $"crk" <= 3)
      .select($"vec_id", $"cent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotS == wantS, "literal probedCells != window crk<=nProbe")
    val (probeBc, probeWin) =
      shapes(EmbeddingOps.probedCells(e.where($"vec_id" < 5), small, 3))
    assert(!probeBc && !probeWin,
      "literal probedCells grew an exchange or window")
  }

  test("hardNegatives only surfaces OTHER labels, ranked by cosine") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), // query, label 0
      (1L, Seq(1f, 0f, 0f, 0f), 0), // same label: excluded
      (2L, Seq(0.9f, 0.1f, 0f, 0f), 1), // hard negative (closest)
      (3L, Seq(0.1f, 0.9f, 0f, 0f), 1), // easier negative
      (4L, Seq(0f, 0f, 1f, 0f), 2))) // easiest negative
    val r = EmbeddingOps.hardNegatives(e, nQueries = 1, k = 3).collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 3L, 4L))
    assert(r.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
    assert(r.forall(_.getAs[Int]("label") != 0))
    val cs = r.map(_.getAs[Double]("cos"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }
}
