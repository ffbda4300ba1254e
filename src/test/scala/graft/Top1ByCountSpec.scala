package graft

import org.apache.spark.sql.functions._

class Top1ByCountSpec extends SparkSpec {
  import spark.implicits._

  test("returns the highest-weight key; ties break to the smallest key") {
    val df = Seq(
      ("g1", "b", 5L), ("g1", "a", 5L), ("g1", "c", 4L), // tie a/b -> a
      ("g2", "z", 1L), ("g2", "z", 9L), ("g2", "y", 3L)) // z accumulates
      .toDF("g", "k", "w")
    val out = df.groupBy($"g")
      .agg(call_function("top1_by_count", $"k", $"w").as("top"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g1") == "a")
    assert(out("g2") == "z")
  }

  test("supports bigint keys and null-heavy input") {
    val df = Seq(
      (1, Some(10L), 2L), (1, Some(20L), 2L), // tie -> 10
      (1, None, 99L), // null keys ignored
      (2, Some(7L), 1L))
      .toDF("g", "k", "w")
    val out = df.groupBy($"g")
      .agg(call_function("top1_by_count", $"k", $"w").as("top"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == 10L)
    assert(out(2) == 7L)
  }

  test("callable from raw SQL and merges across partitions") {
    val n = 10000
    (1 to n).map(i => (i % 32, s"k${i % 7}", 1L)).toDF("g", "k", "w")
      .repartition(8).createOrReplaceTempView("t1bc")
    val out = spark.sql(
      """SELECT g, top1_by_count(k, w) AS top FROM t1bc GROUP BY g""")
      .collect()
    // every group sees keys k0..k6 with near-equal counts; the exact
    // winner is deterministic: max total weight, ties to smallest key
    assert(out.length == 32)
    assert(out.forall(_.getString(1).startsWith("k")))
    // aggregate over one group computed two ways agrees
    val manual = spark.sql(
      """SELECT k FROM (
        |  SELECT k, SUM(w) AS s FROM t1bc WHERE g = 0 GROUP BY k
        |  ORDER BY s DESC, k LIMIT 1)""".stripMargin).collect()(0).getString(0)
    val viaAgg = out.find(_.getInt(0) == 0).get.getString(1)
    assert(manual == viaAgg)
  }
}
