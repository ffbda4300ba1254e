package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Sinks, StarSchema}

/** Randomized invariant tests (seeded — deterministic across runs)
  * covering the SURVEY.md §5.3 property list: replay idempotence,
  * ratio closure, category partitioning, dedup cardinality. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int): DataFrame = {
    val rnd = new Random(seed)
    val types = Seq("play", "skip", "purchase", "error", "")
    eventsDf((1 to n).map { i =>
      val day = 1 + rnd.nextInt(9)
      val h = rnd.nextInt(24)
      val mi = rnd.nextInt(60)
      (i.toLong, rnd.nextInt(20).toLong,
        f"2024-01-0$day $h%02d:$mi%02d:00",
        types(rnd.nextInt(types.size)),
        math.round(rnd.nextDouble() * 10000) / 100.0,
        s"""{"k":${rnd.nextInt(5)}}""")
    })
  }

  test("replay idempotence: inserting the same batch twice adds nothing") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val c = StarSchema.clean(randomEvents(seed, 500))
      val first = Sinks.insertIfAbsent(c.limit(0), c,
        Seq("user_id", "ts"), "event_id")
      val again = Sinks.insertIfAbsent(first, c,
        Seq("user_id", "ts"), "event_id")
      assert(again.count() == 0, s"seed=$seed")
      // and the merged target equals one distinct pass
      assert(first.count() ==
        c.dropDuplicates("user_id", "ts").count(), s"seed=$seed")
    }
  }

  test("fact load preserves cardinality and resolves all keys") {
    for (seed <- Seq(3L, 11L)) {
      val c = StarSchema.clean(randomEvents(seed, 400))
      val f = StarSchema.fact(c)
      assert(f.count() == c.count(), s"seed=$seed")
      assert(f.where($"user_key".isNull || $"type_key".isNull ||
        $"date_key".isNull).count() == 0, s"seed=$seed")
    }
  }

  test("hourRatio percentages close to 100 per day partition") {
    for (seed <- Seq(5L, 13L)) {
      val bad = Analytics.hourRatio(StarSchema.clean(randomEvents(seed, 600)))
        .groupBy($"pg_dow").agg(sum($"pct_of_day").as("p"))
        .where(abs($"p" - 100.0) > 1e-9)
      assert(bad.count() == 0, s"seed=$seed")
    }
  }

  test("lifecycle conversion categories partition every user exactly once") {
    for (seed <- Seq(2L, 17L)) {
      val c = StarSchema.clean(randomEvents(seed, 500))
      val lc = Analytics.lifecycle(c)
      assert(lc.count() == c.select($"user_id").distinct().count())
      assert(lc.where(!$"conversion_category"
        .isin("single", "casual", "regular", "heavy")).count() == 0)
    }
  }

  test("dailyStats totals equal clean-side recomputation") {
    for (seed <- Seq(23L)) {
      val c = StarSchema.clean(randomEvents(seed, 800))
      val s = StarSchema.dailyStats(c)
      val expected = c.groupBy($"event_date".as("d"))
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("u"),
          countDistinct($"event_type").as("t"))
      val joined = s.join(expected, s("event_date") === expected("d"))
      assert(joined.where($"total_events" =!= $"n" ||
        $"unique_users" =!= $"u" || $"unique_types" =!= $"t").count() == 0)
    }
  }

  test("upsertKeepNewest: result keys are distinct, newest wins") {
    for (seed <- Seq(9L)) {
      val rnd = new Random(seed)
      val rows = (1 to 300).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(1000), rnd.nextInt(100).toLong))
      val df = rows.toDF("k", "payload", "version")
      val merged = Sinks.upsertKeepNewest(df.limit(0), df, Seq("k"), "version")
      assert(merged.count() == merged.select($"k").distinct().count())
      val maxV = df.groupBy($"k").agg(max($"version").as("mv"))
      assert(merged.join(maxV, "k").where($"version" =!= $"mv").count() == 0)
    }
  }

  /** Skewed random corpora (zipf-ish word picks) for the sketch
    * invariants. */
  private def randomDocs(seed: Long, n: Int): DataFrame = {
    val rnd = new Random(seed)
    val vocab = (1 to 50).map(i => s"w$i")
    docsDf((1L to n.toLong).map { i =>
      val len = 3 + rnd.nextInt(20)
      val words = (1 to len).map { _ =>
        val j = math.min((1.0 / (rnd.nextDouble() + 0.02)).toInt,
          vocab.size - 1)
        vocab(j)
      }
      (i, words.mkString(" "), if (i % 3 == 0) "en" else "de", "s")
    })
  }

  test("heavy-hitter containment holds on random skewed corpora") {
    for (seed <- Seq(5L, 13L); support <- Seq(0.02, 0.1)) {
      val d = randomDocs(seed, 300)
      val r = graft.operators.TextOps.heavyHitters(d, support)
        .collect()(0)
      assert(r.getAs[Boolean]("all_found"), s"seed=$seed support=$support")
      // exact side recomputed independently
      val counts = d.select(explode(split($"text", " ")).as("w"))
        .groupBy($"w").count().collect()
        .map(x => x.getString(0) -> x.getLong(1))
      val n = counts.map(_._2).sum
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("n_true_hh") ==
        counts.count(_._2 > support * n), s"seed=$seed support=$support")
    }
  }

  test("approx-quantile bound holds on random length distributions") {
    for (seed <- Seq(2L, 9L)) {
      val rnd = new Random(seed)
      // heavy-tailed lengths so the quantiles are well spread
      val d = docsDf((1L to 400L).map { i =>
        val len = 1 + (math.pow(rnd.nextDouble(), 3) * 500).toInt
        (i, "x" * len, if (rnd.nextBoolean()) "en" else "de", "s")
      })
      graft.operators.TextOps.lengthQuantilesApprox(d).collect()
        .foreach(r => assert(r.getAs[Boolean]("within_bound"),
          s"seed=$seed $r"))
    }
  }

  test("BPE laws hold on random corpora: monotone counts, exact floors") {
    // the trainer/encoder pair on randomized corpora: each extra merge
    // round can only SHRINK per-doc token counts, counts never fall
    // below the per-doc word count (one token per word is the fixed
    // point), and round-1 counts never exceed the character count
    val rnd = new Random(7)
    val alphabet = "abcd"
    def word() = (0 until 1 + rnd.nextInt(6))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 2).foreach { trial =>
      val docs = docsDf((1L to 8L).map(id =>
        (id, (0 until 3 + rnd.nextInt(10)).map(_ => word())
          .mkString(" "), "en", "s")))
      def counts(rounds: Int): Map[Long, Long] =
        graft.operators.TextOps.bpeEncode(docs, rounds).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c1 = counts(1)
      val c4 = counts(4)
      val words = docs.select($"doc_id",
          expr("size(filter(split(text, ' '), w -> w != ''))")
            .cast("long").as("n_words"),
          expr("length(replace(text, ' ', ''))").cast("long")
            .as("n_chars"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      words.foreach { case (id, nWords, nChars) =>
        assert(c4(id) <= c1(id),
          s"trial $trial doc $id: counts grew ${c1(id)} -> ${c4(id)}")
        assert(c4(id) >= nWords,
          s"trial $trial doc $id: ${c4(id)} below word floor $nWords")
        assert(c1(id) <= nChars,
          s"trial $trial doc $id: ${c1(id)} above char ceiling $nChars")
      }
    }
  }

  test("PQ top-k is deterministic and input-order invariant") {
    // min(struct)/sum argmin-aggregation is associative+commutative
    // over exact integers, so ANY partitioning yields the same ranking
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val a = graft.operators.EmbeddingOps.pqTopK(e, nQueries = 3)
      .collect().map(_.toString).sorted
    val b = graft.operators.EmbeddingOps.pqTopK(
        e.repartition(7), nQueries = 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
