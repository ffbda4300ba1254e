package graft

import graft.operators.Relational

/** Value-based window frames (the RANGE sibling of
  * rel_customer_order_windows' ROWS frames). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("trailingSpend RANGE frame is value-bounded, not row-bounded") {
    val orders = Seq(
      (1L, 101L, "2024-01-01", 10.00),
      (1L, 102L, "2024-01-15", 20.00), // 14 days after 101 -> in frame
      (1L, 103L, "2024-02-15", 40.00), // 31 days after 102 -> alone
      (2L, 201L, "2024-01-01", 5.00),
      (2L, 202L, "2024-01-01", 7.00)) // same-day RANGE peers
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val r = Relational.trailingSpendOf(orders, days = 30).collect()
      .map(x => x.getAs[Long]("o_orderkey") ->
        x.getAs[Double]("trailing_spend")).toMap
    assert(r(101L) == 10.0)
    assert(r(102L) == 30.0) // includes 101 (within 29 days)
    assert(r(103L) == 40.0) // the >29-day gap excludes both earlier orders
    // RANGE CURRENT ROW includes same-value peers — BOTH same-day rows
    // see the full day total (a ROWS frame would give order-dependent
    // 5.0 / 12.0 instead)
    assert(r(201L) == 12.0 && r(202L) == 12.0)
  }
}
