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
}
