package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{EtlJob, StarSchema}

/** SURVEY.md §5.4 pipeline replay: day-sliced incremental runs (with
  * overlapping/duplicate deliveries) must converge to the same star
  * schema as one full-batch run. */
class EtlJobSpec extends SparkSpec {
  import spark.implicits._

  private def events: DataFrame = eventsDf((1 to 90).map { i =>
    val day = 1 + (i % 3) // three days
    (i.toLong, (i % 7).toLong, f"2024-01-0$day ${i % 24}%02d:15:00",
      Seq("play", "skip", "purchase")(i % 3), i * 1.25, "{}")
  })

  private def sorted(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col).toIndexedSeq: _*).collect()
      .map(_.toString).toSeq.sorted
  }

  test("incremental day-sliced replay converges to the full-batch state") {
    val full = EtlJob.run(None, events, "full")

    // day slices, delivered with day-2 duplicated across two batches
    val d1 = events.where(to_date($"ts") === "2024-01-01")
    val d2 = events.where(to_date($"ts") === "2024-01-02")
    val d3 = events.where(to_date($"ts") === "2024-01-03")
    val s1 = EtlJob.run(None, d1, "b1")
    val s2 = EtlJob.run(Some(s1), d2.unionAll(d1.limit(10)), "b2") // replays
    val s3 = EtlJob.run(Some(s2), d3.unionAll(d2), "b3") // full d2 again

    assert(sorted(s3.fact) == sorted(full.fact))
    assert(sorted(s3.dimUsers) == sorted(full.dimUsers))
    assert(sorted(s3.dimTypes) == sorted(full.dimTypes))
    assert(sorted(s3.dailyStats) == sorted(full.dailyStats))
    // ledger: 3 batches, replayed rows not double-counted
    val processed = s3.ledger.agg(sum($"records_processed")).collect()(0)
      .getLong(0)
    assert(processed == events.dropDuplicates("user_id", "ts").count())
  }

  test("out-of-order backfill delivery converges to the full-batch state") {
    val full = EtlJob.run(None, events, "full")
    val d1 = events.where(to_date($"ts") === "2024-01-01")
    val d2 = events.where(to_date($"ts") === "2024-01-02")
    val d3 = events.where(to_date($"ts") === "2024-01-03")
    // newest day first, then a backfill of the oldest, then the middle
    val s1 = EtlJob.run(None, d3, "b1")
    val s2 = EtlJob.run(Some(s1), d1, "b2_backfill")
    val s3 = EtlJob.run(Some(s2), d2, "b3")
    assert(sorted(s3.fact) == sorted(full.fact))
    assert(sorted(s3.dailyStats) == sorted(full.dailyStats))
    assert(sorted(s3.dimUsers) == sorted(full.dimUsers))
    assert(sorted(s3.dimDates) == sorted(full.dimDates))
  }

  test("incremental dims equal the StarSchema aggregates over history") {
    val d1 = events.where(to_date($"ts") === "2024-01-01")
    val d2 = events.where(to_date($"ts") === "2024-01-02")
    val d3 = events.where(to_date($"ts") === "2024-01-03")
    val s1 = EtlJob.run(None, d1, "b1")
    val s2 = EtlJob.run(Some(s1), d2.unionAll(d1.limit(5)), "b2")
    val s3 = EtlJob.run(Some(s2), d3, "b3")
    // the accumulator-derived dims must be indistinguishable from a
    // full re-aggregation of the accumulated clean staging
    assert(sorted(s3.dimUsers) == sorted(StarSchema.dimUsers(s3.clean)))
    assert(sorted(s3.dimTypes) == sorted(StarSchema.dimTypes(s3.clean)))
    assert(sorted(s3.dimDates) == sorted(StarSchema.dimDates(s3.clean)))
  }

  test("running the identical batch twice is a no-op") {
    val s1 = EtlJob.run(None, events, "b1")
    val s2 = EtlJob.run(Some(s1), events, "b2")
    assert(sorted(s2.fact) == sorted(s1.fact))
    assert(sorted(s2.dailyStats) == sorted(s1.dailyStats))
    assert(s2.ledger.where($"batch_id" === "b2").collect()(0)
      .getAs[Long]("records_processed") == 0L)
  }
}
