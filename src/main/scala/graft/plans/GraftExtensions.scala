package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer (SURVEY.md §2.10): registers the custom
  * Catalyst expressions so they are callable from both the Column API
  * (functions.call_function) and raw SQL. Installed by
  * [[graft.GraftSession]]; also usable via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductI64].getName, "dot_i64"),
      (children: Seq[Expression]) =>
        DotProductI64(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("top1_by_count"),
      new ExpressionInfo(classOf[Top1ByCount].getName, "top1_by_count"),
      (children: Seq[Expression]) =>
        Top1ByCount(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("kgram_hashes"),
      new ExpressionInfo(classOf[KgramRollingHashes].getName, "kgram_hashes"),
      KgramRollingHashes.build _))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainI64].getName,
        "bloom_might_contain"),
      BloomMightContainI64.build _))
  }
}
