package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, StarSchema}

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def clean = StarSchema.clean(eventsDf(Seq(
    (1L, 10L, "2024-01-01 08:00:00", "play", 10.0, "{}"),
    (2L, 10L, "2024-01-01 14:00:00", "play", 20.0, "{}"),
    (3L, 10L, "2024-01-02 09:00:00", "skip", 30.0, "{}"),
    (4L, 11L, "2024-01-01 22:00:00", "play", 40.0, "{}"),
    (5L, 11L, "2024-01-03 03:00:00", "purchase", 50.0, "{}"),
    (6L, 12L, "2024-01-04 12:00:00", "play", 60.0, "{}"))))

  test("heatmap grid is dense over the hour span with zero fill (J6)") {
    val h = Analytics.heatmap(clean)
    // span 2024-01-01 08:00 .. 2024-01-04 12:00 = 77 hourly cells
    assert(h.count() == 77)
    assert(h.agg(sum($"n_events")).collect()(0).getLong(0) == 6L)
    assert(h.where($"n_events" === 0 && $"total_value" =!= 0.0).count() == 0)
  }

  test("hourRatio percentages sum to 100 per day (W2)") {
    val r = Analytics.hourRatio(clean)
      .groupBy($"pg_dow").agg(sum($"pct_of_day").as("p"))
    assert(r.collect().forall(r => math.abs(r.getDouble(1) - 100.0) < 1e-9))
  }

  test("loyalty span/ratio math and HAVING floor (A5)") {
    val l = Analytics.loyalty(clean, minEvents = 3)
    // only user 10 has >= 3 events: days 1..2, span 2, active 2
    val rows = l.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("user_id") == 10L)
    assert(r.getAs[Int]("span_days") == 2)
    assert(r.getAs[Double]("loyalty_ratio") == 1.0)
  }

  test("lifecycle conversion categories partition on exact boundaries (A6)") {
    val events = (1 to 16).map(i =>
      (100L + i, i.toLong, "2024-01-01 10:00:00", "play", 1.0, "{}")) ++
      Seq((200L, 20L, "2024-01-01 10:00:00", "play", 1.0, "{}"))
    // user 20: 1 event; users 1..16: 1 event each — craft counts instead:
    val df = StarSchema.clean(eventsDf(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "play", 1.0, "{}"),
      (2L, 2L, "2024-01-01 10:00:00", "play", 1.0, "{}"),
      (3L, 2L, "2024-01-01 11:00:00", "play", 1.0, "{}"),
      (4L, 2L, "2024-01-01 12:00:00", "play", 1.0, "{}"),
      (5L, 2L, "2024-01-01 13:00:00", "play", 1.0, "{}"),
      (6L, 2L, "2024-01-01 14:00:00", "play", 1.0, "{}"))))
    val lc = Analytics.lifecycle(df)
    val cats = lc.collect().map(r =>
      r.getAs[Long]("user_id") -> r.getAs[String]("conversion_category"))
      .toMap
    assert(cats(1L) == "single")
    assert(cats(2L) == "casual") // 5 events = casual (<=5)
  }

  test("topN orders by count desc with deterministic tie-break (A7/W4)") {
    val t = Analytics.topN(clean, "event_type", 2).collect()
    assert(t(0).getAs[String]("event_type") == "play") // 4 events
    assert(t(1).getAs[String]("event_type") == "purchase") // tie 1-1, asc
  }

  test("setOps tags are consistent partitions (§2.7)") {
    val s = Analytics.setOps(clean)
    val byTag = s.groupBy($"tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag.getOrElse("both", 0L) + byTag.getOrElse("only_h1", 0L) +
      byTag.getOrElse("only_h2", 0L) == byTag.getOrElse("any", 0L))
  }

  test("approx distinct lands within the configured error of exact") {
    val c = StarSchema.clean(eventsDf((1 to 2000).map(i =>
      (i.toLong, (i % 400).toLong, "2024-01-01 10:00:00", "play", 1.0, "{}"))))
    val r = c.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"exact=$exact approx=$approx")
  }

  test("dailyDelta lags by one day (W3)") {
    val d = Analytics.dailyDelta(clean).orderBy($"event_date").collect()
    assert(d(0).isNullAt(d(0).fieldIndex("prev_events")))
    assert(d(1).getAs[Long]("prev_events") == d(0).getAs[Long]("n_events"))
  }

  test("setOpsAll preserves duplicate multiplicities (§2.7 bag forms)") {
    val ev = StarSchema.clean(eventsDf(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "play", 1.0, "{}"),
      (2L, 1L, "2024-01-01 10:30:00", "play", 1.0, "{}"), // play@10 x2 in h1
      (3L, 1L, "2024-01-01 11:00:00", "skip", 1.0, "{}"), // skip@11 x1 in h1
      (4L, 2L, "2024-01-20 10:00:00", "play", 1.0, "{}"), // play@10 x1 in h2
      (5L, 2L, "2024-01-20 11:00:00", "skip", 1.0, "{}"),
      (6L, 2L, "2024-01-20 11:30:00", "skip", 1.0, "{}")))) // skip@11 x2
    val r = Analytics.setOpsAll(ev)
      .groupBy($"tag", $"event_type", $"event_hour").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getInt(2)) -> x.getLong(3))
      .toMap
    // common bag keeps MIN multiplicity; surplus keeps the difference
    assert(r(("common_bag", "play", 10)) == 1L)
    assert(r(("common_bag", "skip", 11)) == 1L)
    assert(r(("h1_surplus", "play", 10)) == 1L)
    assert(r.keys.count(_._1 == "h1_surplus") == 1)
  }

  test("discoveryBySegment groups first-seen dates by enrichment attr (A9)") {
    val customer = Seq((10L, "BUILDING"), (11L, "AUTOMOBILE"))
      .toDF("c_custkey", "c_mktsegment")
    val r = Analytics.discoveryBySegment(clean, customer).collect()
      .map(x => (x.getAs[java.sql.Date]("first_seen").toString,
        x.getAs[String]("segment")) -> x.getAs[Long]("new_users")).toMap
    // users 10 and 11 first seen 2024-01-01 in different segments;
    // user 12 (no customer row) falls back to UNKNOWN on 2024-01-04
    assert(r(("2024-01-01", "BUILDING")) == 1L)
    assert(r(("2024-01-01", "AUTOMOBILE")) == 1L)
    assert(r(("2024-01-04", "UNKNOWN")) == 1L)
    assert(r.size == 3)
  }
}
