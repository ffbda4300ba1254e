package graft

/** Driver-contract smoke: entry() returns rows on sf0.001 and the
  * queries map self-registers the custom expressions in whatever
  * session the caller supplies. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries run through the self-registering wrappers") {
    val dir = "/root/testdata/sf0.001"
    // one query per operator family, incl. the two custom-expression users
    for (name <- Seq("etl_daily_stats", "sim_ann_topk", "dedup_minhash_lsh",
        "text_langid", "sql_raw_entry")) {
      assert(SparkEntry.queries(name)(spark, dir).count() > 0, name)
    }
    assert(SparkEntry.oracleSql.contains("etl_daily_stats"))
  }
}
