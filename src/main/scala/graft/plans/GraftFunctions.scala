package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Imperative registration of the custom expressions into an existing
  * session's function registry. GraftSession installs
  * [[GraftExtensions]] at build time; this covers sessions the engine
  * does not own (a host application's or test harness's session that
  * calls into the library directly). Idempotent — re-registration
  * overwrites with the same builders.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    // The engine's determinism contract assumes UTC (SURVEY.md §1.3:
    // session TZ = UTC): epoch arithmetic over the NTZ event times is
    // interpreted in the session zone, so a non-UTC host session would
    // silently shift every derived timestamp. Enforce it at the entry
    // point rather than depending on the session owner remembering.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      new FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductI64].getName, "dot_i64"),
      (children: Seq[Expression]) =>
        DotProductI64(children(0), children(1)))
    reg.registerFunction(
      new FunctionIdentifier("top1_by_count"),
      new ExpressionInfo(classOf[Top1ByCount].getName, "top1_by_count"),
      (children: Seq[Expression]) =>
        Top1ByCount(children(0), children(1)).toAggregateExpression())
    reg.registerFunction(
      new FunctionIdentifier("kgram_hashes"),
      new ExpressionInfo(classOf[KgramRollingHashes].getName, "kgram_hashes"),
      KgramRollingHashes.build _)
    reg.registerFunction(
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainI64].getName,
        "bloom_might_contain"),
      BloomMightContainI64.build _)
  }
}
