package graft

import org.apache.spark.sql.functions._

import graft.functions.{QualityFns, TimeFns}

/** Pinned semantics for the Postgres↔Spark deltas called out in
  * SURVEY.md §7 risk register. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("pgDow shifts Spark dayofweek to Postgres dow (Sunday=0)") {
    val df = Seq("2024-01-06", "2024-01-07", "2024-01-08", "2024-01-12")
      .toDF("d").select(TimeFns.pgDow(to_date($"d")).as("dow"))
    // Sat=6, Sun=0, Mon=1, Fri=5
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(6, 0, 1, 5))
  }

  test("isWeekend is true exactly for Saturday and Sunday") {
    val df = (1 to 14).map(i => f"2024-01-$i%02d").toDF("d")
      .select(to_date($"d").as("d"), TimeFns.isWeekend(to_date($"d")).as("w"))
    val weekend = df.where($"w").select(date_format($"d", "EEEE"))
      .collect().map(_.getString(0)).toSet
    assert(weekend == Set("Saturday", "Sunday"))
  }

  test("timePeriod buckets on the reference boundaries (P2)") {
    val df = Seq(0, 5, 6, 11, 12, 17, 18, 23).toDF("h")
      .select(TimeFns.timePeriod($"h").as("p"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq(
      "night", "night", "morning", "morning",
      "afternoon", "afternoon", "evening", "evening"))
  }

  test("epochWeek matches (date - 2000-01-01)/7 integer division") {
    val df = Seq("2000-01-01", "2000-01-07", "2000-01-08", "2000-01-15")
      .toDF("d").select(TimeFns.epochWeek(to_date($"d")).as("w"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 0L, 1L, 2L))
  }

  test("cents is exact for 2-decimal doubles") {
    val df = Seq(10.07, 0.01, -3.55, 123.45).toDF("v")
      .select(TimeFns.cents($"v").as("c"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(1007L, 1L, -355L, 12345L))
  }

  test("quality score/flag tiers are first-match-wins (P3)") {
    val df = Seq(
      (null.asInstanceOf[String], 100.0), // missing type wins
      ("  ", 5.0),                        // blank type wins over short
      ("play", 5.0),                      // short duration
      ("play", 100.0))                    // clean
      .toDF("t", "v")
      .select(QualityFns.qualityScore($"t", $"v").as("s"),
        QualityFns.qualityFlag($"t", $"v").as("f"))
    assert(df.collect().map(r => (r.getDouble(0), r.getString(1))).toSeq ==
      Seq((0.5, "missing_type"), (0.5, "missing_type"),
        (0.7, "short_duration"), (1.0, "")))
  }
}
