package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, StarSchema}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    // a=5 (101b) -> bits at z-positions 0,4; b=3 (011b) -> 1,3
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b", bits = 3).as("z"))
      .collect()(0).getLong(0)
    assert(z == (1L | 16L | 2L | 8L)) // 27
    // masking: values beyond the grid truncate to their low bits
    val zMasked = Seq((8L + 5L, 3L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b", bits = 3).as("z"))
      .collect()(0).getLong(0)
    assert(zMasked == z)
    assertThrows[IllegalArgumentException](Layout.zValue($"a", $"b", 0))
  }

  test("zValue and zValueSql agree on NEGATIVE inputs (sign-preserving %)") {
    // Spark SQL's % is sign-preserving exactly like DuckDB's, so
    // evaluating the generated SQL through expr() reproduces what the
    // DuckDB oracle computes: before the normalization fix, -1 % 65536
    // = -1 drove every CASE term to 0 while zValue's bit mask saw
    // 0xFFFF — the r5 ADVICE drift. Pin parity over a grid that mixes
    // signs, including Long.MinValue (whose mathematical mod must
    // still land non-negative).
    val keys = Seq(-1L, -5L, -65536L, -65541L, Long.MinValue,
      Long.MaxValue, 0L, 1L, 5L, 65535L)
    val pairs = for (a <- keys; b <- keys) yield (a, b)
    val drift = pairs.toDF("a", "b")
      .select(
        Layout.zValue($"a", $"b").as("z_col"),
        expr(Layout.zValueSql("a", "b")).as("z_sql"))
      .where($"z_col" =!= $"z_sql")
      .count()
    assert(drift == 0, s"$drift / ${pairs.size} pairs drifted")
    // and the normalization really is the two's-complement low bits:
    // -1 masks to 0xFFFF in both dimensions -> all 32 z-bits set
    val zNeg = Seq((-1L, -1L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z"))
      .collect()(0).getLong(0)
    assert(zNeg == (1L << 32) - 1)
  }

  test("zValue is a bijection on the grid") {
    val grid = spark.range(32).select($"id".as("a"))
      .crossJoin(spark.range(32).select($"id".as("b")))
    val n = grid.select(Layout.zValue($"a", $"b", bits = 5).as("z"))
      .distinct().count()
    assert(n == 32L * 32)
  }

  test("z-ordered write clusters BOTH dimensions per file") {
    val events = StarSchema.clean(
      Tables(spark, "/root/testdata/sf0.001").events)
      .select($"event_id", $"user_id", $"event_hour")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString

    def fileRanges(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy($"f")
        .agg((max($"user_id") - min($"user_id")).as("ur"),
          (max($"event_hour") - min($"event_hour")).as("hr"))
        .agg(avg($"ur").as("ur"), avg($"hr").as("hr"))
        .collect()(0)
      (r.getAs[Double]("ur"), r.getAs[Double]("hr"))
    }

    // baseline: single-column sort clusters user_id perfectly and
    // leaves event_hour at full range in every file
    events.repartitionByRange(8, $"user_id")
      .sortWithinPartitions($"user_id")
      .write.mode("overwrite").parquet(s"$dir/by_user")
    val (uBase, hBase) = fileRanges(s"$dir/by_user")

    Layout.zOrderWrite(events, "user_id", "event_hour",
      s"$dir/by_z", nFiles = 8)
    val (uZ, hZ) = fileRanges(s"$dir/by_z")

    val uFull = 149.0 // user_id spans 1..150
    val hFull = 23.0
    // the single-column baseline: perfect on user, useless on hour
    assert(uBase < 0.5 * uFull, s"baseline user range $uBase")
    assert(hBase > 0.9 * hFull, s"baseline hour range $hBase")
    // z-order: BOTH dimensions clustered below full range
    assert(uZ < 0.75 * uFull, s"z-order user range $uZ not clustered")
    assert(hZ < 0.75 * hFull, s"z-order hour range $hZ not clustered")
  }
}
