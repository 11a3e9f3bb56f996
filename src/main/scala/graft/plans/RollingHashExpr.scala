package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Codepoint-wise polynomial rolling hash: h = (h*31 + cp) mod 1e9+7.
  * Shared by the interpreted and generated paths so they cannot drift. */
object GraftHash {
  final val Mod = 1000000007L
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native Catalyst expression for the Karp-Rabin document fingerprint
  * (SURVEY.md §7.3's "custom Expression" slot).
  *
  * Why native instead of the declarative
  * `aggregate(transform(split(text,'')...)` chain
  * (graft.operators.TextAnalysis.rollingHash): the declarative form
  * materializes a per-character string array per row — at 100 TB of
  * documents that is an array allocation + per-element lambda eval per
  * character. This expression walks the UTF8String's codepoints in one
  * tight loop and participates in whole-stage codegen via a static
  * call, so a corpus-wide fingerprint pass stays allocation-free.
  * Semantics are identical (same mod-1e9+7 fold over codepoints; ASCII
  * codepoint == `ascii()` value), pinned by the d09 DuckDB oracle and
  * an equivalence spec.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_rolling_hash expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftHash.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_hash"
}

/** Session extensions: registers engine-native SQL functions.
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => RollingHashExpr(exprs.head)))
  }
}

/** Per-session registration fallback for sessions built without
  * extensions (e.g. the driver's own Verify session). Idempotent. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHashExpr(exprs.head), "built-in")
}
