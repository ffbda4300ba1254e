package graft

import org.apache.spark.sql.functions._

import graft.operators.Warehouse

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete())
      loc.delete()
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val t = Tables(spark, dir)
    dropTable("b_lineitem")
    dropTable("b_orders")
    Warehouse.saveBucketed(
      t.lineitem.select($"l_orderkey", $"l_extendedprice"),
      "b_lineitem", "l_orderkey", 8)
    Warehouse.saveBucketed(
      t.orders.select($"o_orderkey", $"o_custkey"),
      "b_orders", "o_orderkey", 8)

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    // co-located: a sort-merge join with NO ShuffleExchange on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    // and the result is the plain join's result
    val expected = t.lineitem.join(t.orders, $"l_orderkey" === $"o_orderkey")
      .count()
    assert(joined.count() == expected)
  }

  test("saveBucketed refuses to clear another table's location") {
    val dir = "/root/testdata/sf0.001"
    val t = Tables(spark, dir)
    dropTable("b_victim")
    spark.sql("DROP TABLE IF EXISTS b_victim_alias")
    // an EXTERNAL table registered under a DIFFERENT name whose
    // location is exactly where saveBucketed("b_victim") writes —
    // DROP TABLE b_victim does not protect it
    val wh = new java.io.File("spark-warehouse").getAbsoluteFile
    val loc = new java.io.File(wh, "b_victim")
    t.region.write.parquet(loc.toString)
    spark.sql("CREATE TABLE b_victim_alias USING parquet LOCATION " +
      s"'${loc.toURI}'")
    val ex = intercept[IllegalArgumentException] {
      Warehouse.saveBucketed(t.nation.select($"n_nationkey"),
        "b_victim", "n_nationkey", 2)
    }
    assert(ex.getMessage.contains("b_victim_alias"), ex.getMessage)
    assert(spark.table("b_victim_alias").count() == 5)
    spark.sql("DROP TABLE b_victim_alias")
    dropTable("b_victim")
  }

  test("saveBucketed refuses a directory that is not a prior write") {
    val dir = "/root/testdata/sf0.001"
    val t = Tables(spark, dir)
    dropTable("b_userdata")
    // unrelated user data squatting on the managed location: contents
    // are not parquet-committer artifacts, so the write must not
    // clear the directory
    val wh = new java.io.File("spark-warehouse").getAbsoluteFile
    val loc = new java.io.File(wh, "b_userdata")
    loc.mkdirs()
    val keep = new java.io.File(loc, "notes.txt")
    java.nio.file.Files.write(keep.toPath, "precious".getBytes)
    val ex = intercept[IllegalArgumentException] {
      Warehouse.saveBucketed(t.nation.select($"n_nationkey"),
        "b_userdata", "n_nationkey", 2)
    }
    assert(ex.getMessage.contains("notes.txt"), ex.getMessage)
    assert(keep.exists())
    keep.delete()
    dropTable("b_userdata")
  }
}
