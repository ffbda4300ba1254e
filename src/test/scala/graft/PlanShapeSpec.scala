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
    // predicate pushed into the scan, not evaluated post-read
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString)
    // column pruning: the scan reads ONLY the projected columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString)
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
