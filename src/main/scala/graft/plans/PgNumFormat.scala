package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG `to_char(numeric, template)` rendering — the numeric half of the
  * dialect's to_char story (the datetime half rewrites to DATE_FORMAT,
  * SqlDialect.rewriteToChar). Spark ships its own `to_char` number
  * grammar, but its semantics diverge from PostgreSQL's in exactly the
  * places real configs notice: PG reserves a leading sign column (positive
  * values get a blank), blanks out group separators left of the first
  * printed digit, floats the minus against the digits, suppresses a lone
  * integer zero when a decimal point follows (`' -.10'`), and `FM` drops
  * padding and trailing `9`-position zeros while famously KEEPING the
  * decimal point (`FM9.99` of 1 → `'1.'`).
  *
  * Supported template subset (anything else → no rewrite, the statement
  * falls back to live JDBC pushdown like every untranslatable PG-ism):
  * `FM` prefix, digits `9`/`0`, group `,`, decimal `.`, and one sign
  * mode — leading `S`, trailing `S`, `MI`, or `PR`. Unsupported: `V`,
  * `EEEE`, `RN`, `TH`/`th`, `L`/`$`, `G`/`D` locale forms, `PL`/`SG`/`B`,
  * quoted literal text.
  *
  * Semantics restate the PostgreSQL documentation (Data Type Formatting
  * Functions, Table "to_char examples") and are pinned two ways: the
  * doc's own examples verbatim plus a generated corpus against an
  * independent interpreter (PropertySpec), and the `tap_to_char_numeric`
  * gate entry against a DuckDB replay. Rounding is HALF_UP (away from
  * zero on ties) — PG `numeric` rounding. Reference context:
  * /root/reference/tap_rawpostgresql/client.py:66-101 executes arbitrary
  * config SQL server-side; formatting parity is what lets this engine
  * run the same SQL locally.
  *
  * 100 TB shape: scalar projection, one static call in generated code —
  * stays inside whole-stage codegen like DeflateSizeF.
  */
object PgNumFormat {

  sealed trait SignMode
  case object SignDefault extends SignMode
  case object SignLead extends SignMode     // 'S' prefix: +/- floats left
  case object SignTrail extends SignMode    // 'S' suffix: +/- appended
  case object SignMI extends SignMode       // '-' or ' ' appended
  case object SignPR extends SignMode       // <...> for negatives

  final case class Tpl(fm: Boolean, intPart: String, fracPart: String,
                       hasPoint: Boolean, sign: SignMode) {
    val nInt: Int = intPart.count(c => c == '9' || c == '0')
    val nFrac: Int = fracPart.length
    /** digit positions from the right that MUST print due to '0'. */
    val forcedInt: Int = {
      var seen = 0; var forced = 0
      var i = intPart.length - 1
      while (i >= 0) {
        val c = intPart.charAt(i)
        if (c == '9' || c == '0') { seen += 1; if (c == '0') forced = seen }
        i -= 1
      }
      forced
    }
  }

  /** Parse a PG numeric template; None = unsupported (caller must NOT
    * rewrite). Case-insensitive for FM/S/MI/PR like PG.
    */
  def parse(tpl: String): Option[Tpl] = {
    var t = tpl
    val fm = t.length >= 2 && t.substring(0, 2).equalsIgnoreCase("FM")
    if (fm) t = t.substring(2)
    var sign: SignMode = SignDefault
    if (t.nonEmpty && (t.head == 'S' || t.head == 's')) {
      sign = SignLead; t = t.substring(1)
    } else if (t.length >= 2 && t.substring(t.length - 2)
        .equalsIgnoreCase("MI")) {
      sign = SignMI; t = t.substring(0, t.length - 2)
    } else if (t.length >= 2 && t.substring(t.length - 2)
        .equalsIgnoreCase("PR")) {
      sign = SignPR; t = t.substring(0, t.length - 2)
    } else if (t.nonEmpty && (t.last == 'S' || t.last == 's')) {
      sign = SignTrail; t = t.substring(0, t.length - 1)
    }
    val dot = t.indexOf('.')
    if (dot >= 0 && t.indexOf('.', dot + 1) >= 0) return None
    val intPart = if (dot >= 0) t.substring(0, dot) else t
    val fracPart = if (dot >= 0) t.substring(dot + 1) else ""
    if (!intPart.forall(c => c == '9' || c == '0' || c == ',')) return None
    if (!fracPart.forall(c => c == '9' || c == '0')) return None
    val tp = Tpl(fm, intPart, fracPart, dot >= 0, sign)
    // at least one digit somewhere; a bare ',' template is meaningless
    if (tp.nInt + tp.nFrac == 0) return None
    Some(tp)
  }

  /** Render per PG rules. */
  def render(v: JBigDecimal, tp: Tpl): String = {
    val r = v.setScale(tp.nFrac, RoundingMode.HALF_UP)
    val neg = r.signum() < 0
    val a = r.abs()
    val intStrFull = a.toBigInteger.toString
    val intDigits =
      if (a.toBigInteger.signum() == 0) {
        // PG prints the units zero only when no decimal point follows
        // (doc: to_char(-0.1,'99.99') → ' -.10') — unless a '0' position
        // forces it, which forcedInt handles below.
        if (tp.hasPoint) "" else "0"
      } else intStrFull
    if (intDigits.length > tp.nInt) return overflow(tp)

    val printedCount = math.max(intDigits.length, tp.forcedInt)
    // walk the int template right→left, filling digits / forced zeros /
    // printable separators; blanks elsewhere
    val core = new Array[Char](tp.intPart.length)
    var digitIdx = 0 // digit positions consumed, from the right
    var i = tp.intPart.length - 1
    while (i >= 0) {
      val c = tp.intPart.charAt(i)
      if (c == '9' || c == '0') {
        core(i) =
          if (digitIdx < intDigits.length)
            intDigits.charAt(intDigits.length - 1 - digitIdx)
          else if (digitIdx < printedCount) '0'
          else ' '
        digitIdx += 1
      } else { // ','  — prints iff the digit position to its LEFT prints
        core(i) = if (printedCount > digitIdx) ',' else ' '
      }
      i -= 1
    }
    val intRendered = new String(core)

    val fracRendered =
      if (!tp.hasPoint) ""
      else {
        val plain = a.toPlainString
        val dotAt = plain.indexOf('.')
        var digits = if (dotAt < 0) "" else plain.substring(dotAt + 1)
        while (digits.length < tp.nFrac) digits += "0"
        if (tp.fm) {
          // drop trailing zeros sitting in '9' positions ('0' keeps)
          var keep = digits.length
          while (keep > 0 && digits.charAt(keep - 1) == '0' &&
            tp.fracPart.charAt(keep - 1) == '9') keep -= 1
          digits = digits.substring(0, keep)
        }
        "." + digits // FM keeps the point even with no digits (PG quirk)
      }

    assemble(tp, neg, intRendered, fracRendered)
  }

  /** Integer part wider than the template: PG fills digit positions with
    * '#' (separators and the point survive); the sign slot renders as
    * for a positive value.
    */
  private def overflow(tp: Tpl): String = {
    val intR = tp.intPart.map(c => if (c == ',') ',' else '#')
    val fracR = if (tp.hasPoint) "." + "#" * tp.nFrac else ""
    assemble(tp, neg = false, intR, fracR)
  }

  /** Compose sign slot + int + frac + trailing sign per mode; FM strips
    * the padding blanks instead of emitting them.
    */
  private def assemble(tp: Tpl, neg: Boolean, intR: String,
                       fracR: String): String = {
    val body = intR + fracR
    def floated(mark: Char): String = {
      // one extra leading slot; the mark floats to just before the first
      // non-blank char (which may be the decimal point: ' -.10')
      val sb = new StringBuilder(" ").append(body)
      var first = 0
      while (first < sb.length && sb.charAt(first) == ' ') first += 1
      if (first == sb.length) first = sb.length // all blank: mark at end-1
      sb.setCharAt(math.max(first - 1, 0), mark)
      sb.toString
    }
    val out = tp.sign match {
      case SignDefault =>
        if (tp.fm) (if (neg) "-" else "") + body.replace(" ", "")
        else if (neg) floated('-') else " " + body
      case SignLead =>
        val m = if (neg) '-' else '+'
        if (tp.fm) m.toString + body.replace(" ", "") else floated(m)
      case SignTrail =>
        val m = if (neg) "-" else "+"
        (if (tp.fm) body.replace(" ", "") else body) + m
      case SignMI =>
        val m = if (neg) "-" else if (tp.fm) "" else " "
        (if (tp.fm) body.replace(" ", "") else body) + m
      case SignPR =>
        if (tp.fm) {
          val b = body.replace(" ", "")
          if (neg) "<" + b + ">" else b
        } else {
          val lead = if (neg) floated('<') else " " + body
          lead + (if (neg) ">" else " ")
        }
    }
    out
  }

  /** Static bridge for generated code. */
  def eval(v: JBigDecimal, tpl: Tpl): UTF8String =
    UTF8String.fromString(render(v, tpl))
}

/** `pg_to_char_num(expr, 'template')` — registered into the session's
  * FunctionRegistry (PgFunctions) so SqlDialect-rewritten SQL can call
  * it; the template parses once at expression construction.
  */
case class PgToCharNum(child: Expression, template: String)
    extends UnaryExpression {

  private val tpl: PgNumFormat.Tpl = PgNumFormat.parse(template).getOrElse(
    throw new IllegalArgumentException(
      s"unsupported pg numeric template: '$template'"))

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType | DoubleType | FloatType | LongType | IntegerType |
         ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pg_to_char_num requires a numeric argument, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PgNumFormat.eval(PgToCharNum.toJBD(v), tpl)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tplRef = ctx.addReferenceObj("pgNumTpl", tpl,
      classOf[PgNumFormat.Tpl].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PgNumFormat.eval(graft.plans.PgToCharNum.toJBD($c), $tplRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PgToCharNum =
    copy(child = newChild)
  override def prettyName: String = "pg_to_char_num"
}

object PgToCharNum {
  /** Any Spark numeric runtime value → java BigDecimal. */
  def toJBD(v: Any): JBigDecimal = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case d: java.lang.Double => JBigDecimal.valueOf(d.doubleValue())
    case f: java.lang.Float => new JBigDecimal(f.toString)
    case n: java.lang.Number => JBigDecimal.valueOf(n.longValue())
  }
}
