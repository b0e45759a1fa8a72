package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RegexpCount

/** Catalyst optimizer rule: fuse `size(regexp_extract_all(s, p, 0))`
  * into the native [[graft.functions.RegexpCount]] — counting matches
  * without materializing a per-row array of UTF8Strings. Fires on the
  * token-count / punctuation-ratio / PII-audit expressions
  * (`TextStats.bpeishCount/punctCount`, `Redact.*Count`) wherever
  * they appear, including user-authored SQL, once the extension is
  * installed (`spark.sql.extensions=graft.GraftExtensions`).
  *
  * Guards: the pattern and group index must be literals, group 0
  * (full match) only; a null pattern literal never matches the
  * guard, so the rule cannot change error behavior. `size`'s
  * legacySizeOfNull flag (the ansi-off default is legacy -1) is
  * forwarded so null-subject semantics are preserved exactly.
  */
object RewriteRegexpCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject,
            pat @ Literal(p: UTF8String, StringType),
            Literal(0, IntegerType)), legacy) if p != null =>
        RegexpCount(subject, pat, legacy)
    }
}
