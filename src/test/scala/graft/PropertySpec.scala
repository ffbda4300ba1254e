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
}
