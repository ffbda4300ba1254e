package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("expect counts violations per rule and is null-hostile") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -1.0), (null, 5.0), (4L, null))
      .toDF("id", "v")
    val out = Checks.expect(df, Seq(
      "id_not_null" -> $"id".isNotNull,
      "v_positive" -> ($"v" > 0), // null v -> NULL rule -> violation
      "always" -> lit(true)))
      .collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))))
      .toMap
    assert(out("id_not_null") == ((1L, false)))
    assert(out("v_positive") == ((2L, false))) // -1.0 AND the null
    assert(out("always") == ((0L, true)))
    assertThrows[IllegalArgumentException](
      Checks.expect(df, Seq.empty))
    assertThrows[IllegalArgumentException](
      Checks.expect(df, Seq("a" -> lit(true), "a" -> lit(false))))
  }

  test("expect on an empty frame passes every rule with zero counts") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val out = Checks.expect(empty, Seq("r" -> ($"v" > 0))).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_violations") == 0L)
    assert(out(0).getAs[Boolean]("passed"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")
    val next = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "payload")
    val out = Checks.snapshotDiff(prev, next, "k", md5($"payload"))
      .collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_keys"))
      .toMap
    assert(out == Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L))
  }

  test("snapshotDiff: NULL fingerprints and duplicate keys count per key") {
    def df(rows: Seq[(Long, Option[String])]) = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (k, p) => Row(k, p.orNull) }),
        StructType(Seq(StructField("k", LongType),
          StructField("payload", StringType))))
    }
    // key 1: NULL payload in BOTH -> md5 fingerprint NULL on both
    // sides -> unchanged (presence flags, not fp nullness, decide);
    // key 2: NULL -> value = changed; key 3 duplicated in prev with
    // the same payload -> ONE key, unchanged
    val prev = df(Seq((1L, None), (2L, None), (3L, Some("x")),
      (3L, Some("x"))))
    val next = df(Seq((1L, None), (2L, Some("v")), (3L, Some("x"))))
    val out = Checks.snapshotDiff(prev, next, "k", md5($"payload"))
      .collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_keys"))
      .toMap
    assert(out == Map("unchanged" -> 2L, "changed" -> 1L))
  }

  test("expect accepts dotted rule names") {
    val df = Seq((1L, 10.0), (2L, -1.0)).toDF("id", "v")
    val out = Checks.expect(df, Seq("v.positive" -> ($"v" > 0))).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("rule") == "v.positive")
    assert(out(0).getAs[Long]("n_violations") == 1L)
    // case-insensitive duplicate names are rejected up front (they
    // would be ambiguous under the default resolver)
    assertThrows[IllegalArgumentException](
      Checks.expect(df, Seq("A" -> lit(true), "a" -> lit(false))))
  }

  test("profileCard: nulls counted, exact distinct, native-type " +
    "min/max surfaced as strings") {
    val df = Seq(
      (Some("b"), Some(10L)), (Some("a"), Some(2L)),
      (None, Some(10L)), (Some("a"), None))
      .toDF("s", "n")
    val card = Checks.profileCard(df, Seq("s", "n")).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = card("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 1L &&
      s.getLong(3) == 2L && s.getString(4) == "a" &&
      s.getString(5) == "b")
    val n = card("n")
    // NATIVE ordering: numeric min is 2 even though "10" < "2" as text
    assert(n.getLong(2) == 1L && n.getLong(3) == 2L &&
      n.getString(4) == "2" && n.getString(5) == "10")
    assertThrows[IllegalArgumentException](
      Checks.profileCard(df, Seq.empty))
    assertThrows[IllegalArgumentException](
      Checks.profileCard(df, Seq("s", "s")))
  }

  test("numericProfile: cents quantization, null accounting, and the " +
    "lower-median rank rule on even and odd populations") {
    val df = Seq(
      (Some(1.25), Some(10.0)), (Some(2.50), Some(20.0)),
      (Some(3.75), Some(30.0)), (Some(99.99), None))
      .toDF("a", "b")
    val out = Checks.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a") // 4 values: median = 2nd smallest (lower median)
    assert(a.getLong(1) == 4L && a.getLong(2) == 0L)
    assert(a.getLong(3) == 125L && a.getLong(4) == 9999L &&
      a.getLong(5) == 250L)
    val b = out("b") // 3 values + 1 null: median = 2nd of 3
    assert(b.getLong(1) == 3L && b.getLong(2) == 1L)
    assert(b.getLong(3) == 1000L && b.getLong(4) == 3000L &&
      b.getLong(5) == 2000L)
    assertThrows[IllegalArgumentException](
      Checks.numericProfile(df, Seq("a", "a")))
  }

  test("numericProfile emits a row for a fully-NULL column (n_vals=0, " +
    "n_nulls=total, NULL extremes) instead of dropping it") {
    // regression: an all-NULL column contributes no histogram rows
    // and the inner joins used to drop it from the card entirely —
    // the most alarming column shape looked un-profiled
    val df = Seq((Some(1.0), Option.empty[Double]),
      (Some(2.0), Option.empty[Double])).toDF("a", "b")
    val out = Checks.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b"))
    val b = out("b")
    assert(b.getLong(1) == 0L && b.getLong(2) == 2L)
    assert(b.isNullAt(3) && b.isNullAt(4) && b.isNullAt(5))
    val a = out("a")
    assert(a.getLong(1) == 2L && a.getLong(2) == 0L &&
      a.getLong(3) == 100L)
  }

  test("heavyHitters: exact per-column top-k, nulls excluded, count " +
    "ties break by value") {
    val df = Seq("x", "x", "y", "y", "z", null)
      .map(Tuple1(_)).toDF("c")
      .withColumn("k", lit(1L))
    val hh = Checks.heavyHitters(df, Seq("c"), k = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // x and y tie at 2 — value order puts x first; z (1) is cut by k
    assert(hh.sortBy(_._3).toSeq == Seq(("x", 2L, 1), ("y", 2L, 2)))
    assertThrows[IllegalArgumentException](
      Checks.heavyHitters(df, Seq("c"), k = 0))
  }
}
