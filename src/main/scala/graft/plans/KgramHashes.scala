package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram Rabin-Karp hashes of a string in ONE O(n) pass.
  *
  * The composable form ([[graft.operators.TextOps.winnowing]]'s original
  * shape) is `transform(sequence(...), i -> aggregate(slice(cs,i,k), ...))`
  * — O(n*k) interpreted lambda evaluations per document plus a
  * per-character array materialization. This expression slides the
  * polynomial window instead:
  *
  *   h(i+1) = ((h(i) - cp(i)*B^(k-1)) * B + cp(i+k)) mod P
  *
  * with B=131, P=2^31-1 — every hash after the first costs O(1), the
  * whole document costs O(n), and the loop runs as compiled code
  * reachable from generated code (no per-element lambda dispatch).
  * Each produced value is bit-identical to the stepwise fold
  * `(acc*131 + cp) % P` over the k-gram's code points (both compute the
  * polynomial residue mod P), so the DuckDB oracle is unchanged.
  *
  * Iteration is by Unicode code point (matching DuckDB's
  * string_split('') + ascii); malformed lone surrogates hash as their
  * code-unit value.
  */
case class KgramRollingHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kgram_hashes requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "kgram_hashes"

  override def nullSafeEval(input: Any): Any =
    KgramRollingHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.KgramRollingHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object KgramRollingHashes {
  private val B = 131L
  private val P = 2147483647L // 2^31 - 1

  /** Registry builder shared by GraftExtensions and GraftFunctions:
    * validates arity and the constant-k contract up front so misuse
    * surfaces as a normal AnalysisException (standard Spark error
    * classes, caught by the analyzer's error path) rather than a bare
    * runtime IllegalArgument/IndexOutOfBounds later. */
  def build(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> "`kgram_hashes`", "expectedNum" -> "2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    val kExpr = children(1)
    if (!kExpr.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> "`kgram_hashes`", "paramName" -> "`k`",
          "paramType" -> "\"INT\""))
    kExpr.eval() match {
      // integral types only: a fractional k (2.9) must error, not
      // silently truncate to 2
      case n @ (_: java.lang.Byte | _: java.lang.Short |
          _: java.lang.Integer | _: java.lang.Long) =>
        val k = n.asInstanceOf[java.lang.Number].longValue
        if (k < 1 || k > Int.MaxValue)
          throw new org.apache.spark.sql.AnalysisException(
            "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE",
            Map("sqlExpr" -> "\"kgram_hashes(text, k)\"",
              "exprName" -> "`k`",
              "valueRange" -> s"[1, ${Int.MaxValue}]",
              "currentValue" -> k.toString))
        KgramRollingHashes(children(0), k.toInt)
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          "UNEXPECTED_INPUT_TYPE",
          Map("paramIndex" -> "second", "functionName" -> "`kgram_hashes`",
            "requiredType" -> "\"INT\"",
            "inputSql" -> s""""$other"""",
            "inputType" -> s""""${Option(other).map(_.getClass.getSimpleName)
              .getOrElse("NULL")}""""))
    }
  }

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    // one pass: decode code points into a ring buffer of the last k
    val nCp = str.codePointCount(0, str.length)
    val m = nCp - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    // B^(k-1) mod P for the sliding removal
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = bk1 * B % P; e += 1 }
    val ring = new Array[Long](k)
    var h = 0L
    var ci = 0 // char index into str
    var cp = 0 // code-point index
    while (cp < nCp) {
      val c = str.codePointAt(ci)
      if (cp < k) {
        // build the first window with the stepwise fold
        h = (h * B + c) % P
      } else {
        // slide: drop ring(cp % k) (the code point k positions back)
        val drop = ring(cp % k) * bk1 % P
        h = ((h - drop + P) % P * B + c) % P
      }
      ring(cp % k) = c
      if (cp >= k - 1) out(cp - k + 1) = h
      ci += Character.charCount(c)
      cp += 1
    }
    new GenericArrayData(out)
  }
}
