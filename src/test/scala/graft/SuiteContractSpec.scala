package graft

/** Meta-spec guarding the driver contract for EVERY registered query:
  * the comparator sorts columns by name and hashes values, so a query
  * whose output has duplicate or un-aliased computed columns (names
  * containing parentheses/spaces, e.g. "sum(l_quantity)") would
  * hash-mismatch its oracle even with identical values. Also smokes
  * every query end-to-end on sf0.001 so a future addition that throws
  * is caught here before the driver's verify run. */
class SuiteContractSpec extends SparkSpec {

  test("registered query names are unique") {
    // SparkEntry.queries is a Map — a duplicate registration would
    // silently shadow one of the two queries AND desync the driver's
    // registry arithmetic (oracle count vs Q-site count). Caught here
    // the moment it is introduced.
    val names = Suite.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty,
      s"duplicate registered query name(s): ${dups.mkString(", ")}")
  }

  test("every registered query runs on sf0.001 with clean column names") {
    val dir = "/root/testdata/sf0.001"
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    Suite.all.foreach { q =>
      val df =
        try q.run(spark, dir)
        catch {
          case e: Throwable =>
            bad += s"${q.name}: THROWS ${e.getMessage.take(120)}"
            null
        }
      if (df != null) {
        val cols = df.columns
        if (cols.distinct.length != cols.length)
          bad += s"${q.name}: duplicate column names ${cols.mkString(",")}"
        cols.filter(c => c.exists(ch => ch == '(' || ch == ' ')).foreach(c =>
          bad += s"${q.name}: un-aliased column '$c'")
        // executing the plan (not just resolving it) is the real smoke
        try df.limit(1).collect()
        catch {
          case e: Throwable =>
            bad += s"${q.name}: EXEC FAILS ${e.getMessage.take(120)}"
        }
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("oracle coverage: EVERY query has a full oracle") {
    // since r7 even the stubbed media decode carries a hash-checked
    // oracle (exact-integer millis projection) — no exceptions remain
    val noOracle = Suite.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle.isEmpty, noOracle)
  }
}
