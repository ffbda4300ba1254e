package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bloom-pruned join equals the plain join (no false negatives)") {
    val t = Tables(spark, dir)
    val buyers = t.customer
      .where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_mktsegment")
    val pruned = BloomJoin.bloomPrunedJoin(
      t.orders, "o_custkey", buyers, "c_custkey")
    val plain = t.orders.join(buyers, $"o_custkey" === $"c_custkey")
    assert(pruned.exceptAll(plain).isEmpty)
    assert(plain.exceptAll(pruned).isEmpty)
    // the probe expression sits in the executed plan
    assert(pruned.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
  }

  test("bloomPrunedJoin resolves SAME-NAMED keys on both sides") {
    // natural keys usually carry the same name on both sides; before
    // the r7 fix, col(key) === col(key) resolved against the combined
    // join output and threw AMBIGUOUS_REFERENCE. The keys must be
    // resolved against their own frames.
    val t = Tables(spark, dir)
    val buyers = t.customer
      .where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey".as("custkey"), $"c_mktsegment")
    val facts = t.orders
      .select($"o_orderkey", $"o_custkey".as("custkey"))
    val joined = BloomJoin.bloomPrunedJoin(
      facts, "custkey", buyers, "custkey")
    val expected = t.orders.join(buyers,
      $"o_custkey" === $"custkey").count()
    assert(joined.count() == expected)
    // and the OUTPUT is usable: only one 'custkey' column survives,
    // so selecting/grouping by the shared name cannot re-trigger the
    // ambiguity downstream
    assert(joined.columns.count(_ == "custkey") == 1)
    assert(joined.groupBy("custkey").count().count() > 0)
    // CASE-VARIANT key names are the same collision under the default
    // case-insensitive resolver: the small side's copy must be
    // dropped just as for an exact-name match
    val caseJoined = BloomJoin.bloomPrunedJoin(
      facts.withColumnRenamed("custkey", "CUSTKEY"), "CUSTKEY",
      buyers, "custkey")
    assert(caseJoined.count() == expected)
    assert(caseJoined.columns
      .count(_.equalsIgnoreCase("custkey")) == 1)
    assert(caseJoined.groupBy("custkey").count().count() > 0)
  }

  test("the prune removes non-matching rows before the join") {
    val t = Tables(spark, dir)
    val buyers = t.customer.where($"c_mktsegment" === "BUILDING")
    val filter = BloomJoin.buildFilter(buyers, "c_custkey",
      expectedItems = 64)
    val kept = BloomJoin.prune(t.orders, "o_custkey", filter)
    val total = t.orders.count()
    val matching = t.orders.join(
      buyers.select($"c_custkey"), $"o_custkey" === $"c_custkey").count()
    val keptN = kept.count()
    // superset of the true matches, strict subset of the fact table
    // (34/150 custkeys at 1% fpp cannot keep everything)
    assert(keptN >= matching)
    assert(keptN < total, s"prune kept all $total rows")
  }

  test("probe works under whole-stage codegen with fallback disabled") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val t = Tables(spark, dir)
      val keys = t.nation.select($"n_nationkey")
      val filter = BloomJoin.buildFilter(keys, "n_nationkey", 25)
      val kept = BloomJoin.prune(
        t.customer.select($"c_custkey", $"c_nationkey"),
        "c_nationkey", filter)
      // every nationkey is in the filter -> nothing may be dropped
      assert(kept.count() == t.customer.count())
      // null keys are filtered out, not passed to the sketch
      val withNull = Seq(Some(1L), None).toDF("k")
      val keptNull = BloomJoin.prune(withNull, "k", filter)
      assert(keptNull.collect().map(_.getAs[Long]("k")).toSeq == Seq(1L))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("buildFilter validates its sizing arguments") {
    val t = Tables(spark, dir)
    assertThrows[IllegalArgumentException](
      BloomJoin.buildFilter(t.nation, "n_nationkey", 0))
    assertThrows[IllegalArgumentException](
      BloomJoin.buildFilter(t.nation, "n_nationkey", 10, fpp = 1.5))
  }

  test("non-integral keys are refused on both sides") {
    val t = Tables(spark, dir)
    // a string key would hash as bytes on the build side but as a
    // long cast on the probe side - silent false negatives
    assertThrows[IllegalArgumentException](
      BloomJoin.buildFilter(t.customer, "c_name", 10))
    val f = BloomJoin.buildFilter(t.nation, "n_nationkey", 25)
    assertThrows[IllegalArgumentException](
      BloomJoin.prune(t.customer, "c_name", f))
  }

  test("no false negatives on randomized key subsets") {
    val rnd = new scala.util.Random(42) // fixed seed: reproducible
    val t = Tables(spark, dir)
    val all = t.customer.select($"c_custkey")
    (1 to 5).foreach { _ =>
      val mod = 2 + rnd.nextInt(9)
      val rem = rnd.nextInt(mod)
      val subset = all.where($"c_custkey" % mod === rem)
      val n = math.max(1L, subset.count())
      val f = BloomJoin.buildFilter(subset, "c_custkey", n)
      val kept = BloomJoin.prune(t.customer, "c_custkey", f)
      // every subset member must survive the prune — a bloom filter
      // can over-keep, never under-keep
      assert(subset.exceptAll(kept.select($"c_custkey")).isEmpty,
        s"false negative for mod=$mod rem=$rem")
    }
  }

  test("wrong arity surfaces as an AnalysisException") {
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT bloom_might_contain(1)").collect())
    assert(e.getMessage.contains("bloom_might_contain"))
  }
}
