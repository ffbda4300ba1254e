package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the greatest right time <= left time, per key") {
    val left = Seq(
      (1L, 10, "2024-01-05"), // after two snapshots -> v2
      (2L, 10, "2024-01-02"), // exactly on a snapshot -> inclusive v2? no: v1@01, v2@03
      (3L, 10, "2024-01-01"), // exactly on the first snapshot -> v1
      (4L, 20, "2024-01-04"), // other key -> its own snapshot
      (5L, 30, "2024-01-04")) // key with no snapshots -> null
      .toDF("id", "k", "d")
      .withColumn("d", to_date($"d"))
    val right = Seq(
      (10, "2024-01-01", "v1"),
      (10, "2024-01-03", "v2"),
      (20, "2024-01-02", "w1"))
      .toDF("k", "rd", "v")
      .withColumn("rd", to_date($"rd"))

    val out = AsOf.joinAsOf(left, right, "k", "d", "rd", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out(1L) == "v2")
    assert(out(2L) == "v1") // 01-02 is after v1, before v2
    assert(out(3L) == "v1") // inclusive on the boundary
    assert(out(4L) == "w1")
    assert(out(5L) == null)
  }

  test("range join matches a BETWEEN theta join exactly") {
    val left = (1 to 200).map(i =>
      ((i % 9).toLong, java.sql.Date.valueOf(f"2024-01-${1 + i % 28}%02d"), i))
      .toSeq.toDF("k", "d", "v")
    val right = (1 to 30).map(i =>
      ((i % 9).toLong, java.sql.Date.valueOf(f"2024-01-${1 + i % 25}%02d"), i * 100))
      .toSeq.toDF("k", "start", "rid")
    val viaBuckets = AsOf.joinRange(left, right, "k", "d", "start", 5,
      Seq("rid"))
    val viaTheta = left.join(right,
      left("k") === right("k") && left("d") >= right("start") &&
        left("d") <= date_add(right("start"), 4))
      .select(left("k"), col("d"), col("v"), col("start"), col("rid"))
    assert(viaBuckets.count() == viaTheta.count())
    assert(viaBuckets.select("k", "d", "v", "rid")
      .exceptAll(viaTheta.select("k", "d", "v", "rid")).count() == 0)
  }

  test("dot_i64 rejects non-array<bigint> inputs with a clear error") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Seq(1.0f), Seq(1.0f))).toDF("a", "b")
        .select(call_function("dot_i64", $"a", $"b")).collect()
    }
    assert(err.getMessage.contains("dot_i64"))
  }

  test("as-of join never matches NULL keys (SQL join semantics)") {
    val left = Seq((1L, Option(10), "2024-01-05"), (2L, None, "2024-01-05"))
      .toDF("id", "k", "d").withColumn("d", to_date($"d"))
    val right = Seq((Option(10), "2024-01-01", "real"),
        (None, "2024-01-02", "phantom"))
      .toDF("k", "rd", "v").withColumn("rd", to_date($"rd"))
    val out = AsOf.joinAsOf(left, right, "k", "d", "rd", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out(1L) == "real")
    assert(out(2L) == null) // NULL key must not pick up the phantom row
  }

  test("as-of join is inclusive on exact timestamp ties") {
    val left = Seq((1L, 1, "2024-02-01")).toDF("id", "k", "d")
      .withColumn("d", to_date($"d"))
    val right = Seq((1, "2024-02-01", "same_day")).toDF("k", "rd", "v")
      .withColumn("rd", to_date($"rd"))
    val out = AsOf.joinAsOf(left, right, "k", "d", "rd", Seq("v")).collect()
    assert(out(0).getAs[String]("v") == "same_day")
  }
}
