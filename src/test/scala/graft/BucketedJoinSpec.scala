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
}
