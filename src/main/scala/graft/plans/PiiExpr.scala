package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PII scrub patterns + single-kernel stats (d20).
  *
  * The patterns are the single source of truth for
  * `operators.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}` and the SQL
  * mirror: lookaround- and backreference-free so Java regex
  * (backtracking) and RE2-family engines (leftmost-longest) match the
  * same spans — for pure greedy quantifiers with no ambiguous
  * alternation the two agree.
  *
  * Count semantics match `size(regexp_extract_all(t, re, 0))` — every
  * count runs over the ORIGINAL text; replacement is sequential
  * email → IP → phone (emails first so digit-bearing local parts are
  * not chewed by the phone pass; dotted quads before phones so they
  * are not half-eaten as digit runs). Replacement strings contain no
  * `$`/`\` so `Matcher.appendReplacement` is literal, exactly like
  * Spark's `RegExpReplace`.
  */
object GraftPii {
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\+\\d[\\d ]{7,}\\d"

  private val email = Pattern.compile(EmailRe)
  private val ipv4 = Pattern.compile(Ipv4Re)
  private val phone = Pattern.compile(PhoneRe)

  /** (n_emails, n_ips, n_phones, redacted) in 5 regex passes instead
    * of the declarative plan's 6 (3 array-building extract_all + a
    * 3-step replace chain): the email pass counts and replaces in one
    * scan (both run over the original text); IP and phone counts also
    * scan the original, so only their replacements (which run over the
    * partially-redacted string) need separate passes. No per-match
    * array allocation, one UTF8String→String conversion. */
  def piiStats(s: UTF8String): InternalRow = {
    val t = s.toString

    var nEmails = 0L
    val m1 = email.matcher(t)
    val sb1 = new java.lang.StringBuilder(t.length)
    while (m1.find()) { nEmails += 1; m1.appendReplacement(sb1, "<EMAIL>") }
    m1.appendTail(sb1)
    val r1 = sb1.toString

    var nIps = 0L
    val mc2 = ipv4.matcher(t)
    while (mc2.find()) nIps += 1
    val m2 = ipv4.matcher(r1)
    val sb2 = new java.lang.StringBuilder(r1.length)
    while (m2.find()) m2.appendReplacement(sb2, "<IP>")
    m2.appendTail(sb2)
    val r2 = sb2.toString

    var nPhones = 0L
    val mc3 = phone.matcher(t)
    while (mc3.find()) nPhones += 1
    val m3 = phone.matcher(r2)
    val sb3 = new java.lang.StringBuilder(r2.length)
    while (m3.find()) m3.appendReplacement(sb3, "<PHONE>")
    m3.appendTail(sb3)

    new GenericInternalRow(Array[Any](nEmails, nIps, nPhones,
      UTF8String.fromString(sb3.toString)))
  }
}

/** Native PII scrub stats (d20): struct(n_emails, n_ips, n_phones,
  * redacted) in one kernel call per row.
  *
  * Why native: the declarative form ran 3 `regexp_extract_all` (each
  * materializing an array of matched UTF8Strings just to take its
  * size) plus the redact chain — and referenced `redactPii` twice
  * (md5 + length), leaving correctness of the constant factor to
  * codegen subexpression elimination. One struct per row makes the
  * single evaluation structural, drops the match arrays, and shares
  * the email scan between count and replace. Equivalence with the
  * declarative form is property-pinned in PiiRedactionSpec; the SQL
  * mirror is unchanged. */
case class PiiStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pii_stats expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    GraftPii.piiStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftPii.piiStats($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_pii_stats"
}
