package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, filter_bytes)` — membership probe of a
  * long key against a serialized `org.apache.spark.util.sketch
  * .BloomFilter` (the sketch Spark's own runtime row-level filtering
  * builds). False positives possible, false negatives impossible — so
  * filtering a join's big side with it before the shuffle is a pure
  * prune: the join itself removes the false positives and the result
  * is exactly the unpruned join (see
  * [[graft.operators.BloomJoin.bloomPrunedJoin]]).
  *
  * The filter argument must be a foldable BINARY (a literal produced by
  * serializing the built filter): it is deserialized ONCE per
  * partition/codegen-instance, not per row — interpreted eval goes
  * through a transient lazy val, codegen pins the deserialized filter
  * as a referenced object. A custom Expression rather than a UDF keeps
  * the probe inside whole-stage codegen (SURVEY.md §2.10 preference
  * order), which matters because this sits in the scan's hot filter
  * path by design.
  */
case class BloomMightContainI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires a foldable (literal) filter argument")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (bigint, binary) arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per executor instance of the expression; the
    * bytes are tiny next to a row batch (kilobytes at 1 % fpp for
    * thousands of keys, ~1.2 MB per million keys). */
  @transient private lazy val filter: BloomFilter =
    BloomMightContainI64.deserialize(right.eval(null))

  override def nullSafeEval(key: Any, bytes: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // materialize the filter at codegen time and reference the OBJECT:
    // the generated row loop calls mightContainLong directly, no
    // deserialization or byte-array handling on the hot path (the
    // bytes operand's generated value is intentionally unused)
    val bf = BloomMightContainI64.deserialize(right.eval(null))
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContainI64 {
  private[plans] def deserialize(v: Any): BloomFilter = {
    require(v != null, "bloom_might_contain: filter literal is null")
    BloomFilter.readFrom(
      new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
  }

  /** Registry builder shared by GraftExtensions and GraftFunctions:
    * validates arity up front (the KgramHashes.build pattern) so
    * misuse surfaces as a standard AnalysisException rather than an
    * IndexOutOfBounds during resolution. */
  def build(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> "`bloom_might_contain`",
          "expectedNum" -> "2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    BloomMightContainI64(children(0), children(1))
  }
}
