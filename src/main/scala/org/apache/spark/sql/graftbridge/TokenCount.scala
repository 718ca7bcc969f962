package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace-token counter: the number of maximal `\S+` runs in a
  * string, computed as a single pass over the raw UTF-8 bytes — no regex
  * engine, no token-array materialization, no per-token UTF8String
  * allocation.
  *
  * Byte-level is exact here: Java's `\s` (non-UNICODE_CHARACTER_CLASS, as
  * Spark's regexp functions use) matches only ASCII ` \t\n\x0B\f\r`, and
  * UTF-8 continuation/lead bytes are all >= 0x80 — never whitespace — so a
  * token starts exactly where a non-whitespace byte follows a whitespace
  * byte (or the string start). A property test asserts equivalence with
  * `size(regexp_extract_all(x, "\\S+", 0))` on adversarial inputs.
  *
  * Cross-engine caveat: exactness is relative to JAVA regex `\s`, which
  * includes vertical tab 0x0B. RE2-based engines (DuckDB, Go) EXCLUDE 0x0B
  * from `\s`, so counts diverge on text containing vertical tabs; use an
  * explicit class like `[ \t\n\f\r]` on both sides when that matters.
  */
case class TokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0
    var prevWs = true
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == 32 || (b >= 9 && b <= 13)
      if (!ws && prevWs) cnt += 1
      prevWs = ws
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val prevWs = ctx.freshName("prevWs")
      val b = ctx.freshName("b")
      val ws = ctx.freshName("ws")
      s"""
         |int $n = $c.numBytes();
         |int $cnt = 0;
         |boolean $prevWs = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $c.getByte($i);
         |  boolean $ws = $b == 32 || ($b >= 9 && $b <= 13);
         |  if (!$ws && $prevWs) $cnt++;
         |  $prevWs = $ws;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Optimizer rule (installed by [[GraftExtensions]]): rewrites the common
  * token-count idiom `size(regexp_extract_all(x, '\S+', 0))` into the
  * single-pass [[TokenCount]] — same result (property-tested), but no
  * regex machinery and no intermediate array. The declarative idiom stays
  * in user code; the session makes it fast. (Spark's own `regexp_count`
  * is RuntimeReplaceable to exactly the idiom on the left, so this also
  * accelerates `regexp_count(x, '\S+')`.)
  */
object RewriteTokenCount extends Rule[LogicalPlan] {
  private val TokenPattern = UTF8String.fromString("\\S+")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(
          org.apache.spark.sql.catalyst.expressions.RegExpExtractAll(
            subject, Literal(p: UTF8String, StringType), Literal(0, IntegerType)),
          false) if p == TokenPattern =>
      TokenCount(subject)
  }
}
