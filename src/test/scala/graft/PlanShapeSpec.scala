package graft

/** Physical-plan regression guards for the operators whose 100 TB
  * story depends on plan shape: scalar/sketch frames must reach their
  * joins as broadcasts (never a CartesianProduct), and the LSH dedup
  * route must not broadcast the corpus side. The checks read the
  * pre-execution plan (AQE's initial plan), so they pin what the
  * optimizer was ASKED to do — hints and join structure — not
  * size-dependent runtime choices. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val q = Suite.all.find(_.name == name)
      .getOrElse(fail(s"no registered query named $name"))
    q.run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
  }

  test("scalar and sketch cross-joins broadcast, never cartesian") {
    Seq("dedup_embedding_lsh", "text_length_quantiles_approx",
      "text_heavy_hitters", "sim_pq_topk", "sim_pq_recall",
      "text_langid_ngram", "an_approx_distinct")
      .foreach { n =>
        assert(!planOf(n).contains("CartesianProduct"),
          s"$n plans a CartesianProduct")
      }
  }

  private def hintsOf(name: String) = {
    val q = Suite.all.find(_.name == name)
      .getOrElse(fail(s"no registered query named $name"))
    q.run(spark, "/root/testdata/sf0.001").queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
  }

  test("the LSH dedup route hints only the constant planes frame") {
    val hints = hintsOf("dedup_embedding_lsh")
    assert(hints.nonEmpty)
    hints.foreach { h =>
      val leaves = h.child.collectLeaves().map(_.nodeName).toSet
      assert(leaves == Set("Range"),
        s"a broadcast hint covers non-constant input: $leaves")
    }
  }

  test("filters and projections reach the parquet scan") {
    import spark.implicits._
    val df = Tables(spark, "/root/testdata/sf0.001").lineitem
      .where($"l_quantity" > 40)
      .select($"l_orderkey", $"l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    // matched loosely (filter name + column, schema column presence /
    // absence) rather than on the exact rendered strings: the precise
    // PushedFilters / ReadSchema formatting is datasource- and
    // version-specific, and pinning it fails the suite on a Spark
    // upgrade without a real pushdown regression
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(raw"GreaterThan\(l_quantity\s*,\s*40".r
      .findFirstIn(pushed).isDefined, s"predicate not pushed: $pushed")
    val read = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_orderkey") && read.contains("l_quantity"),
      s"projected columns missing from scan: $read")
    // column pruning: none of the unprojected lineitem columns are read
    Seq("l_extendedprice", "l_shipdate", "l_comment", "l_partkey")
      .foreach(c => assert(!read.contains(c), s"scan reads pruned $c: $read"))
  }

  test("span-dedup and repetition never broadcast a corpus-derived frame") {
    // dfq (document frequency over shingles) is vocabulary-sized and
    // must reach its join by shuffle; same for every frame in
    // text_repetition — neither query may carry ANY broadcast hint
    Seq("dedup_ngram_spans", "text_repetition").foreach { n =>
      assert(hintsOf(n).isEmpty, s"$n gained a broadcast hint")
      assert(!planOf(n).contains("CartesianProduct"),
        s"$n plans a CartesianProduct")
    }
  }

  test("the bloom probe reaches the fact table's scan") {
    // the prune only helps if it runs BEFORE the join's exchange — the
    // strongest plan evidence is the probe sitting in the fact scan's
    // own DataFilters (Catalyst pushes the filter into the scan node;
    // it even propagates a copy to the dim side via join constraints)
    val plan = planOf("rel_bloom_prune_join")
    val factScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("orders.parquet"))
      .mkString
    assert(factScan.nonEmpty, s"no orders scan in:\n$plan")
    assert(factScan.contains("bloom_might_contain"),
      s"bloom probe not on the fact scan: $factScan")
  }

  test("corpus-derived broadcast hints pass through an Aggregate") {
    // the repo's broadcast policy: a frame derived from a growing table
    // may only be hinted after an aggregation collapses its cardinality
    // (langSize: languages; quantile estimates: languages x pcts;
    // heavy-hitter total/sketch: one row)
    Seq("text_langid_ngram", "text_length_quantiles_approx",
      "text_heavy_hitters").foreach { n =>
      val hints = hintsOf(n)
      assert(hints.nonEmpty, s"$n lost its broadcast hints")
      hints.foreach { h =>
        val constant = h.child.collectLeaves().map(_.nodeName).toSet
          .subsetOf(Set("Range", "LocalRelation", "OneRowRelation"))
        val aggregated = h.child.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty
        assert(constant || aggregated,
          s"$n hints a corpus-sized frame with no aggregation")
      }
    }
  }
}
