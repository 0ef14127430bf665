package graft.sources

import graft.types.TypeMapper
import org.apache.spark.sql.types._

/** PostgreSQL → Spark SQL dialect preprocessing.
  *
  * The reference ships stream SQL verbatim to PostgreSQL
  * (reference: tap_rawpostgresql/client.py:300-302); our native path runs the
  * same text through Spark's parser, so the PG-isms that appear in real
  * configs are rewritten at the string level (SURVEY §7.3):
  *   - `expr::type` casts  → `CAST(expr AS TYPE)`  (e.g. `'…'::uuid`)
  *   - `timestamptz '…'` literals → `TIMESTAMP '…'`
  *   - `:rep_key_val` bind parameter → typed literal (Spark SQL has no bind
  *     parameters; the literal is rendered through the declared column type,
  *     which also guards against injection — reference: client.py:283,298)
  */
object SqlDialect {

  // operand: a quoted string literal (with '' escapes) or a (qualified) identifier
  // operand: quoted literal, identifier, or an UNSIGNED numeric literal
  // (PG allows `1::numeric/3`; the sign is excluded so `a -1::int` keeps
  // its binary minus). Type: optional (p[,s]) args ride along so
  // `::numeric(10,2)` / `::varchar(255)` map through TypeMapper instead
  // of leaving the parenthesized args dangling after the CAST.
  private val castRe =
    """('(?:[^']|'')*'|[A-Za-z_][A-Za-z0-9_\.]*|(?<![A-Za-z0-9_.'])\d+(?:\.\d+)?)\s*::\s*([A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?(?:\s+with(?:out)?\s+time\s+zone)?)""".r
  private val tstzLitRe = """(?i)\btimestamptz\s*(')""".r
  private val tsLitRe = """(?i)\btimestamp\s+with(?:out)?\s+time\s+zone\s*(')""".r

  private val parenCastRe =
    """\)\s*::\s*([A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)""".r

  // posix-regex match operators; the case-insensitive forms fold the
  // (?i) flag into the pattern literal
  private val ciNotMatchRe = """!~\*\s*('(?:[^']|'')*')""".r
  private val ciMatchRe = """~\*\s*('(?:[^']|'')*')""".r
  private val dquoteIdentRe = """"([A-Za-z_][A-Za-z0-9_$]*)"""".r

  /** True iff position `idx` falls inside a single-quoted string literal
    * ('' escapes toggle twice, netting out correctly).
    */
  private def inLiteral(sql: String, idx: Int): Boolean = {
    var inStr = false
    var i = 0
    while (i < idx) {
      if (sql.charAt(i) == '\'') inStr = !inStr
      i += 1
    }
    inStr
  }

  /** Apply `f` to the spans of `sql` OUTSIDE single-quoted string literals
    * ('' escapes respected) — rewrites that must not touch literal text.
    */
  private def mapOutsideStrings(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val code = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '\'') {
        out.append(f(code.toString())); code.clear()
        out.append(c); inStr = true
      } else if (inStr && c == '\'') {
        out.append(c)
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          out.append('\''); i += 1 // escaped quote stays inside the literal
        } else inStr = false
      } else if (inStr) out.append(c)
      else code.append(c)
      i += 1
    }
    out.append(f(code.toString()))
    out.toString()
  }

  private val stringAggRe = """(?i)\bstring_agg\s*\(""".r

  // operand AT TIME ZONE 'zone' — typed literal (timestamp '…'),
  // identifier/qualified name, or parenthesized expression; literal zone
  private val atTimeZoneRe =
    ("""(?i)((?:[A-Za-z_][A-Za-z0-9_]*\s*)?'(?:[^']|'')*'""" +
      """|[A-Za-z_][A-Za-z0-9_\.]*|\([^()]*\))\s+at\s+time\s+zone\s+('(?:[^']|'')*')""").r

  /** Rewrite PG `ts AT TIME ZONE 'Zone'`, honoring PG's double meaning:
    *
    *  - `timestamptz` operand (typed `timestamptz '…'` literal, or any
    *    identifier/parenthesized expression — the engine stores instants
    *    UTC, the reference's convention): render the instant in the zone →
    *    `from_utc_timestamp(ts, 'Zone')`.
    *  - NAIVE operand (typed `timestamp '…'` literal): PG interprets the
    *    wall-clock value as zone-local and yields the UTC instant — the
    *    inverse direction → `to_utc_timestamp(ts, 'Zone')`.
    *
    * Naive-typed COLUMNS cannot be detected from the SQL text alone and
    * keep the timestamptz reading; configs needing the naive-column form
    * should call to_utc_timestamp explicitly.
    */
  def rewriteAtTimeZone(sql: String): String = {
    val s = sql
    atTimeZoneRe.replaceSomeIn(s, m =>
      if (inLiteral(s, m.start)) None
      else {
        val operand = m.group(1)
        val naiveLiteral =
          "(?is)^timestamp\\s*'.*".r.matches(operand.trim)
        val fn = if (naiveLiteral) "TO_UTC_TIMESTAMP" else "FROM_UTC_TIMESTAMP"
        Some(java.util.regex.Matcher.quoteReplacement(
          s"$fn($operand, ${m.group(2)})"))
      })
  }

  /** Rewrite PG `string_agg(expr, delim [ORDER BY …])` to Spark 4's
    * `listagg(expr, delim) [WITHIN GROUP (ORDER BY …)]`. Iterates over
    * every occurrence; arguments found by balanced-paren scan, the
    * optional ORDER BY located at the argument top level.
    */
  def rewriteStringAgg(sql: String): String = {
    val m = stringAggRe.findAllMatchIn(sql)
      .find(mm => !inLiteral(sql, mm.start)).getOrElse(return sql)
    val openIdx = m.end - 1
    var depth = 0
    var i = openIdx
    var close = -1
    var inStr = false
    while (i < sql.length && close < 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return sql
    val args = sql.substring(openIdx + 1, close)
    val orderIdx = topLevelIndexOf(args, "ORDER")
    val replaced =
      if (orderIdx < 0) s"listagg($args)"
      else {
        val core = args.substring(0, orderIdx).trim.stripSuffix(",").trim
        val orderBy = args.substring(orderIdx).trim
        s"listagg($core) WITHIN GROUP ($orderBy)"
      }
    rewriteStringAgg(
      sql.substring(0, m.start) + replaced + sql.substring(close + 1))
  }

  private val arrayAggRe = """(?i)\barray_agg\s*\(""".r
  private val arrayToStringRe = """(?i)\barray_to_string\s*\(""".r

  /** Rewrite PG `array_agg(expr ORDER BY key [ASC|DESC])` — Spark's
    * `array_agg` exists but takes no ORDER BY — to the struct-sort form
    * `transform(array_sort(array_agg(named_struct('o', key, 'v', expr))),
    * s -> s.v)` (wrapped in `reverse` for DESC). Only the single-key
    * form rewrites (equal keys additionally tie-break on the value,
    * which PG leaves unspecified anyway); multi-key ORDER BY is left
    * untouched and rides the `auto` pushdown fallback. Plain
    * `array_agg(x)` passes through — Spark has it natively.
    */
  def rewriteArrayAgg(sql: String): String = {
    val m = arrayAggRe.findAllMatchIn(sql)
      .find { mm =>
        if (inLiteral(sql, mm.start)) false
        else {
          val close = matchParen(sql, mm.end - 1)
          close > 0 && {
            val args = sql.substring(mm.end, close)
            topLevelIndexOf(args, "ORDER") >= 0 &&
              !args.trim.toUpperCase.startsWith("DISTINCT") &&
              !args.substring(topLevelIndexOf(args, "ORDER"))
                .split("""(?i)\bORDER\s+BY\b""").last.contains(",")
          }
        }
      }
      .getOrElse(return sql)
    val openIdx = m.end - 1
    val close = matchParen(sql, openIdx)
    val args = sql.substring(openIdx + 1, close)
    val orderIdx = topLevelIndexOf(args, "ORDER")
    val core = args.substring(0, orderIdx).trim.stripSuffix(",").trim
    var key = args.substring(orderIdx).trim
      .replaceFirst("""(?i)^ORDER\s+BY\s+""", "").trim
    val desc = key.toUpperCase.endsWith(" DESC")
    key = key.replaceFirst("""(?i)\s+(ASC|DESC)$""", "").trim
    val sorted =
      s"transform(array_sort(array_agg(named_struct('o', $key, 'v', $core))), s -> s.v)"
    val replaced = if (desc) s"reverse($sorted)" else sorted
    rewriteArrayAgg(
      sql.substring(0, m.start) + replaced + sql.substring(close + 1))
  }

  /** PG `array_to_string(arr, delim)` → Spark
    * `array_join(transform(arr, __x -> CAST(__x AS STRING)), delim)` —
    * PG casts elements implicitly, Spark's array_join demands strings,
    * so the rewrite injects the element cast. Both skip NULL elements.
    * The 3-argument form (explicit null replacement) is left untouched
    * for the pushdown fallback.
    */
  def rewriteArrayToString(sql: String): String = {
    val m = arrayToStringRe.findAllMatchIn(sql)
      .find { mm =>
        !inLiteral(sql, mm.start) && {
          val close = matchParen(sql, mm.end - 1)
          close > 0 &&
            topLevelCommas(sql.substring(mm.end, close)).length == 1
        }
      }
      .getOrElse(return sql)
    val openIdx = m.end - 1
    val close = matchParen(sql, openIdx)
    val args = sql.substring(openIdx + 1, close)
    val cut = topLevelCommas(args).head
    val arr = args.substring(0, cut).trim
    val delim = args.substring(cut + 1).trim
    val replaced =
      s"array_join(transform($arr, __x -> CAST(__x AS STRING)), $delim)"
    rewriteArrayToString(
      sql.substring(0, m.start) + replaced + sql.substring(close + 1))
  }

  /** Positions of top-level (depth-0, non-literal) commas in `args`. */
  private def topLevelCommas(args: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var depth = 0
    var inStr = false
    var i = 0
    while (i < args.length) {
      val c = args.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += i
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  /** Index of the `)` balancing the `(` at `openIdx` (literal-aware),
    * or -1.
    */
  private def matchParen(sql: String, openIdx: Int): Int = {
    var depth = 0
    var i = openIdx
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Rewrite PostgreSQL-flavored SQL into Spark-parseable SQL. */
  // ---- `OPERATOR(pg_catalog.op)` explicit-operator syntax + the LIKE
  // operator family (`~~` = LIKE, `~~*` = ILIKE, negations) + COLLATE ----

  private val operatorSynRe =
    """(?i)\s*OPERATOR\s*\(\s*(?:pg_catalog\s*\.\s*)?([~!<>=#@^|&+*/%-]+)\s*\)\s*""".r
  // an expression COLLATE "en_US.utf8" / COLLATE c — collation is a PG
  // comparison detail with no Spark counterpart; dropping it preserves
  // semantics for the byte-wise collations real stream SQL pins ("C")
  private val collateRe =
    """(?i)\s+COLLATE\s+("[^"]*"|[A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)?)""".r

  /** Unwrap PG's explicit-operator syntax (`x OPERATOR(pg_catalog.~~) y`
    * → `x ~~ y`), rewrite the LIKE-family operators to keywords, and
    * strip COLLATE clauses — all outside string literals, BEFORE the
    * regex-operator rewrites (whose guards would otherwise misread the
    * multi-char `~~` forms).
    */
  def rewriteOperatorSyntax(sql: String): String = mapOutsideStrings(sql) { c0 =>
    var c = operatorSynRe.replaceAllIn(c0, m =>
      java.util.regex.Matcher.quoteReplacement(" " + m.group(1) + " "))
    c = collateRe.replaceAllIn(c, "")
    // longest first so !~~* is not eaten by its prefixes; surrounding
    // whitespace is consumed so insertions never double spaces
    c = c.replaceAll("""\s*!~~\*\s*""", " NOT ILIKE ")
    c = c.replaceAll("""\s*!~~(?!\*)\s*""", " NOT LIKE ")
    c = c.replaceAll("""\s*(?<!!)~~\*\s*""", " ILIKE ")
    c = c.replaceAll("""\s*(?<![!~])~~(?![~*])\s*""", " LIKE ")
    c
  }

  def rewrite(sql: String): String = {
    var out = rewriteOperatorSyntax(rewriteAtTimeZone(rewriteStringAgg(
      rewriteArrayAgg(rewriteArrayToString(
        rewriteNestedDistinctOn(rewriteDistinctOn(sql)))))))
    // ANY/ALL first (its pattern consumes an optional ::type[] suffix),
    // then standalone array-literal casts — both BEFORE the scalar-cast
    // loop, which would otherwise mangle `'{a,b}'::text[]` into
    // `CAST('{a,b}' AS STRING)[]`
    out = rewriteAnyAll(out)
    out = rewriteArrayCast(out)
    out = rewriteSimilarTo(out)
    out = rewriteOverlaps(out)
    out = rewriteIntervalCast(out)
    out = tstzLitRe.replaceAllIn(out, m => "TIMESTAMP " + m.group(1))
    out = tsLitRe.replaceAllIn(out, m => "TIMESTAMP " + m.group(1))
    // case-insensitive regex matches first (their patterns absorb (?i)),
    // longest operator first so !~* is not eaten by ~*; trigger positions
    // inside string literals are left untouched
    locally {
      val s1 = out
      out = ciNotMatchRe.replaceSomeIn(s1, m =>
        if (inLiteral(s1, m.start)) None
        else Some(java.util.regex.Matcher.quoteReplacement(
          "NOT RLIKE " + foldCaseFlag(m.group(1)))))
    }
    locally {
      val s2 = out
      out = ciMatchRe.replaceSomeIn(s2, m =>
        if (inLiteral(s2, m.start)) None
        else Some(java.util.regex.Matcher.quoteReplacement(
          "RLIKE " + foldCaseFlag(m.group(1)))))
    }
    out = mapOutsideStrings(out) { code =>
      var c = code
      // PG quotes identifiers with "…"; Spark uses backticks
      c = dquoteIdentRe.replaceAllIn(c, m =>
        java.util.regex.Matcher.quoteReplacement("`" + m.group(1) + "`"))
      c = c.replaceAll("""!~(?![\*~])""", " NOT RLIKE ")
      c = c.replaceAll("""(?<![!<>=~])~(?![~*=])""", " RLIKE ")
      c
    }
    out = rewriteDateTrunc(rewriteExtract(out))
    out = rewriteToChar(out)
    out = rewriteNumericTrunc(out)
    // iterate to handle chained casts like x::text::int
    var prev: String = null
    while (prev != out) {
      prev = out
      out = castRe.replaceAllIn(out, m => {
        val operand = m.group(1)
        val tpe = sparkTypeName(m.group(2))
        java.util.regex.Matcher.quoteReplacement(s"CAST($operand AS $tpe)")
      })
      out = rewriteParenCast(out)
    }
    rewriteJsonOps(out)
  }

  // ---- PG JSON extraction operators (`->`, `->>`, `#>`, `#>>`) ----------

  private val jsonOpRe = """#>>|#>|->>|->""".r
  // right operand: string literal (key or '{a,b}' path) or array index
  private val jsonRightRe = """\s*('(?:[^']|'')*'|-?\d+)""".r

  /** Char-indexed flags: true where `s(i)` belongs to a single-quoted
    * string literal (quotes included, '' escapes handled) — for scans
    * that walk BACKWARDS and cannot replay the forward literal state.
    */
  private def literalFlags(s: String): Array[Boolean] = {
    val f = new Array[Boolean](s.length)
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inStr && c == '\'') { inStr = true; f(i) = true }
      else if (inStr && c == '\'') {
        f(i) = true
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') { f(i + 1) = true; i += 1 }
        else inStr = false
      } else f(i) = inStr
      i += 1
    }
    f
  }

  /** `[start, end]` quote positions (inclusive) of every string literal. */
  private def literalSpans(s: String): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var inStr = false
    var start = -1
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inStr && c == '\'') { inStr = true; start = i }
      else if (inStr && c == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
        else { inStr = false; spans += ((start, i)) }
      }
      i += 1
    }
    spans.toSeq
  }

  /** `[start, endExclusive)` of the expression ending just left of
    * `opStart`: a parenthesized/function-call span, string literal,
    * backtick identifier, or (qualified) identifier.
    */
  private def scanLeftOperand(s: String, opStart: Int): Option[(Int, Int)] = {
    var i = opStart - 1
    while (i >= 0 && s.charAt(i).isWhitespace) i -= 1
    if (i < 0) return None
    val end = i + 1
    s.charAt(i) match {
      case ')' =>
        val lit = literalFlags(s)
        var depth = 0
        var j = i
        while (j >= 0) {
          if (!lit(j)) s.charAt(j) match {
            case ')' => depth += 1
            case '(' =>
              depth -= 1
              if (depth == 0) {
                var k = j - 1 // include a preceding function name
                while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')) k -= 1
                return Some((k + 1, end))
              }
            case _ =>
          }
          j -= 1
        }
        None
      case '\'' =>
        literalSpans(s).find(_._2 == i).map(sp => (sp._1, end))
      case '`' =>
        var j = i - 1
        while (j >= 0 && s.charAt(j) != '`') j -= 1
        if (j >= 0) Some((j, end)) else None
      case c if c.isLetterOrDigit || c == '_' =>
        var j = i
        while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' ||
          s.charAt(j) == '.')) j -= 1
        Some((j + 1, end))
      case _ => None
    }
  }

  private def unquoteSqlLiteral(lit: String): String =
    lit.substring(1, lit.length - 1).replace("''", "'")

  /** One JSON-path segment for a PG key/index token. `quoted` preserves
    * PG's operand-type distinction: `-> 0` (integer) indexes an array,
    * `-> '0'` (text) looks up the KEY "0" — a quoted numeric token must
    * emit the bracket-quoted key form, never an index (divergence found
    * by the r10 JSON-op property corpus).
    */
  private def jsonPathSegment(tok: String, quoted: Boolean): String =
    if (!quoted && tok.matches("""\d+""")) s"[$tok]"
    else if (!quoted && tok.matches("""-\d+"""))
      throw new IllegalArgumentException(
        s"JSON rewrite: negative array index '$tok' (PG from-the-end " +
          "indexing) has no Spark get_json_object equivalent")
    else if (tok.matches("""[A-Za-z_][A-Za-z0-9_]*""")) s".$tok"
    else s"['$tok']"

  /** Spark JSON path for one PG operator application. `->`/`->>` take a
    * key literal or array index; `#>`/`#>>` take a `'{a,b,0}'` path,
    * whose elements PG resolves polymorphically at runtime (object key
    * vs array index by node type) — the static translation maps digit
    * elements to indexes, the overwhelmingly common reading.
    */
  private def jsonPathFor(op: String, right: String): String = {
    val toks: Seq[(String, Boolean)] =
      if (op.startsWith("#")) {
        val body = unquoteSqlLiteral(right).trim
          .stripPrefix("{").stripSuffix("}")
        pgArrayElements(body).map(_.getOrElse(throw
          new IllegalArgumentException("JSON rewrite: NULL in a #> path")))
          .map(t => (t, false))
      } else if (right.startsWith("'")) Seq((unquoteSqlLiteral(right), true))
      else Seq((right, false))
    "$" + toks.map { case (t, q) => jsonPathSegment(t, q) }.mkString
  }

  /** Rewrite PG JSON extraction operators to `get_json_object` calls:
    * `x -> 'k'`, `x ->> 'k'`, `x -> 0`, `x #> '{a,b}'`, `x #>> '{a,0,b}'`.
    * Chains nest naturally — the rewritten call becomes the next
    * operator's left operand, and `get_json_object` returns the JSON text
    * of object/array results, which the outer call re-parses (PG:
    * https://www.postgresql.org/docs/current/functions-json.html).
    *
    * `->` and `->>` both map to text extraction. For objects and arrays
    * the extracted JSON text matches PG's `->`; for SCALAR STRING results
    * PG's `->` keeps the JSON quotes while Spark strips them — terminal
    * `->` on string scalars is the one documented divergence (PG style
    * already prescribes `->>` for text access). Literal keys/indexes
    * only; occurrences whose operands don't parse are left for Spark's
    * parser to reject loudly.
    */
  def rewriteJsonOps(sql: String): String = {
    var out = sql
    var changed = true
    while (changed) {
      changed = false
      val s = out
      val it = jsonOpRe.findAllMatchIn(s).filterNot(m => inLiteral(s, m.start))
      while (!changed && it.hasNext) {
        val m = it.next()
        val op = m.matched
        val rightM = jsonRightRe.findPrefixMatchOf(s.subSequence(m.end, s.length))
        val left = scanLeftOperand(s, m.start)
        (left, rightM) match {
          case (Some((ls, le)), Some(r))
            if !(op.startsWith("#") && !r.group(1).startsWith("'")) =>
            val path = jsonPathFor(op, r.group(1))
            val operand = s.substring(ls, le)
            out = s.substring(0, ls) +
              s"get_json_object($operand, '${path.replace("'", "''")}')" +
              s.substring(m.end + r.end)
            changed = true
          case _ => // unparseable occurrence: skip, let Spark's parser report
        }
      }
    }
    out
  }

  // ---- PG array literals and ANY/ALL ------------------------------------

  /** Elements of a PG array-literal BODY (`a,"b,c",NULL`): double-quote
    * unwrapping with backslash escapes, unquoted `NULL` → None.
    */
  private def pgArrayElements(body: String): Seq[Option[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Option[String]]()
    val cur = new StringBuilder
    var quoted = false
    var wasQuoted = false
    var i = 0
    def flush(): Unit = {
      val raw = if (wasQuoted) cur.toString else cur.toString.trim
      out += (if (!wasQuoted && raw.equalsIgnoreCase("null")) None else Some(raw))
      cur.clear(); wasQuoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted) {
        if (c == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 1 }
        else if (c == '"') quoted = false
        else cur.append(c)
      } else c match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => flush()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty || wasQuoted || out.nonEmpty) flush()
    out.toSeq
  }

  // `'{…}'::type[]` — a PG array literal with an element-type cast
  private val arrayCastRe =
    """'((?:[^']|'')*)'\s*::\s*([A-Za-z_][A-Za-z0-9_ ]*?)\s*\[\s*\]""".r

  /** Rewrite PG array-literal casts `'{a,b}'::text[]` to
    * `array(CAST('a' AS STRING), CAST('b' AS STRING))`; `'{}'::int[]` to
    * a typed empty array. Column-valued `col::type[]` casts (runtime
    * array-literal parsing) have no static Spark equivalent and are left
    * unchanged.
    */
  def rewriteArrayCast(sql: String): String = {
    val s = sql
    arrayCastRe.replaceSomeIn(s, m =>
      if (inLiteral(s, m.start)) None
      else {
        val content = m.group(1).replace("''", "'").trim
        if (!(content.startsWith("{") && content.endsWith("}"))) None
        else {
          val tpe = sparkTypeName(m.group(2))
          val elems = pgArrayElements(content.substring(1, content.length - 1))
          val rendered =
            if (elems.isEmpty) s"CAST(array() AS ARRAY<$tpe>)"
            else elems.map {
              case Some(e) => s"CAST('${e.replace("'", "''")}' AS $tpe)"
              case None => s"CAST(NULL AS $tpe)"
            }.mkString("array(", ", ", ")")
          Some(java.util.regex.Matcher.quoteReplacement(rendered))
        }
      })
  }

  // ---- PG SIMILAR TO ------------------------------------------------------

  private val similarToRe =
    """(?i)\b(NOT\s+)?SIMILAR\s+TO\s+('(?:[^']|'')*')""".r

  /** Translate a PG `SIMILAR TO` pattern body into a Java/Spark regex:
    * `%` → `.*`, `_` → `.` (both literal inside `[...]` classes and when
    * backslash-escaped); `.` `^` `$` are NOT metacharacters in SIMILAR TO
    * (PG docs §9.7.2) so they're escaped outside classes (inside `[...]`
    * Java already treats `.`/`$` literally and `^` keeps its POSIX
    * negation role). Everything else — the SQL-regex metacharacters
    * `| * + ? ( ) { } [ ]` PG shares with POSIX — passes through. The
    * result is wrapped `^(?:…)$` because SIMILAR TO matches the ENTIRE
    * string, unlike RLIKE's substring search.
    */
  def similarToRegex(pat: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < pat.length) {
      val c = pat.charAt(i)
      c match {
        case '\\' if i + 1 < pat.length =>
          val n = pat.charAt(i + 1)
          // escaped wildcard → literal char; anything else keeps its escape
          if (n == '%' || n == '_') sb.append(n)
          else sb.append('\\').append(n)
          i += 1
        case '[' if !inClass => inClass = true; sb.append(c)
        case ']' if inClass => inClass = false; sb.append(c)
        case '%' if !inClass => sb.append(".*")
        case '_' if !inClass => sb.append('.')
        case '.' | '^' | '$' if !inClass => sb.append('\\').append(c)
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Rewrite `x [NOT] SIMILAR TO '<pattern>'` (literal patterns — the
    * config-SQL case) to `x [NOT] RLIKE '^(?:<regex>)$'`. Column-valued
    * patterns are left unchanged (no static translation).
    */
  def rewriteSimilarTo(sql: String): String = {
    val s = sql
    similarToRe.replaceSomeIn(s, m =>
      if (inLiteral(s, m.start)) None
      else {
        val neg = Option(m.group(1)).map(_ => "NOT ").getOrElse("")
        val lit = m.group(2)
        val body = lit.substring(1, lit.length - 1) // keep '' escapes as-is
        Some(java.util.regex.Matcher.quoteReplacement(
          s"${neg}RLIKE '^(?:${similarToRegex(body)})$$'"))
      })
  }

  // ---- PG interval casts and OVERLAPS ----------------------------------

  /** `'30 days'::interval` → `INTERVAL '30 days'` — Spark parses the
    * multi-unit interval STRING literal natively, so only the PG cast
    * spelling needs translating (before the scalar-cast loop would turn
    * it into an unresolvable CAST). Non-literal `::interval` operands
    * have no static Spark translation and are left for the `auto`
    * pushdown fallback.
    */
  private val intervalCastRe =
    """('(?:[^']|'')*')\s*::\s*[Ii][Nn][Tt][Ee][Rr][Vv][Aa][Ll]\b""".r

  def rewriteIntervalCast(sql: String): String = {
    val s = sql
    intervalCastRe.replaceSomeIn(s, m =>
      if (inLiteral(s, m.start)) None
      else Some(java.util.regex.Matcher.quoteReplacement(
        s"INTERVAL ${m.group(1)}")))
  }

  private val overlapsRe = """(?i)\boverlaps\b""".r

  /** Split `a, b` at the single top-level comma of a paren-group body. */
  private def topLevelComma(body: String): Option[Int] = {
    val lit = literalFlags(body)
    var depth = 0
    var i = 0
    while (i < body.length) {
      if (!lit(i)) body.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Forward scan of the `(...)` group starting at/after `from`
    * (whitespace-skipping); returns (openIdx, closeIdx) inclusive.
    */
  private def scanParenGroup(s: String, from: Int): Option[(Int, Int)] = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length || s.charAt(i) != '(') return None
    val lit = literalFlags(s)
    var depth = 0
    var j = i
    while (j < s.length) {
      if (!lit(j)) s.charAt(j) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some((i, j))
        case _ =>
      }
      j += 1
    }
    None
  }

  /** Rewrite `(s1, e1) OVERLAPS (s2, e2)` into the SQL-standard
    * expansion over NORMALIZED bounds (PG swaps each pair so start <=
    * end, and treats start = end as a single instant — PG docs §9.9.3):
    *
    *   (S1 > S2 AND NOT (S1 >= E2 AND E1 >= E2)) OR
    *   (S2 > S1 AND NOT (S2 >= E1 AND E2 >= E1)) OR (S1 = S2)
    *
    * with S_i = LEAST(s_i, e_i), E_i = GREATEST(s_i, e_i). This stays on
    * the native Catalyst path (plain comparisons — pushable, codegen'd);
    * the repeated subexpressions are collapsed by Catalyst CSE.
    */
  def rewriteOverlaps(sql: String): String = {
    val s = sql
    // rightmost-first so earlier spans stay valid across replacements
    val ms = overlapsRe.findAllMatchIn(s).toList.reverse
    var out = s
    for (m <- ms if !inLiteral(s, m.start)) {
      val left = scanLeftOperand(out, m.start)
      val right = scanParenGroup(out, m.end)
      (left, right) match {
        case (Some((ls, le)), Some((ro, rc)))
            if out.charAt(ls) == '(' =>
          val lBody = out.substring(ls + 1, le - 1)
          val rBody = out.substring(ro + 1, rc)
          (topLevelComma(lBody), topLevelComma(rBody)) match {
            case (Some(lc), Some(rcm)) =>
              val (a, b) = (lBody.substring(0, lc).trim, lBody.substring(lc + 1).trim)
              val (c, d) = (rBody.substring(0, rcm).trim, rBody.substring(rcm + 1).trim)
              val (s1, e1) = (s"LEAST($a, $b)", s"GREATEST($a, $b)")
              val (s2, e2) = (s"LEAST($c, $d)", s"GREATEST($c, $d)")
              val repl = s"(($s1 > $s2 AND NOT ($s1 >= $e2 AND $e1 >= $e2))" +
                s" OR ($s2 > $s1 AND NOT ($s2 >= $e1 AND $e2 >= $e1))" +
                s" OR $s1 = $s2)"
              out = out.substring(0, ls) + repl + out.substring(rc + 1)
            case _ => // not a 2-element row constructor: leave for fallback
          }
        case _ => // no paren row constructor on both sides: leave as-is
      }
    }
    out
  }

  private val anyAllRe =
    ("""(?i)(=|<>|!=)\s*(ANY|ALL)\s*\(\s*(?:'((?:[^']|'')*)'""" +
      """(?:\s*::\s*([A-Za-z_][A-Za-z0-9_ ]*?)\s*\[\s*\])?""" +
      """|ARRAY\s*\[([^\[\]]*)\])\s*\)""").r

  private val numericTokRe = """-?\d+(?:\.\d+)?""".r

  /** Rewrite PG quantified comparisons over array literals to IN lists:
    * `x = ANY('{a,b}')` / `x = ANY('{1,2}'::int[])` / `x = ANY(ARRAY[…])`
    * → `x IN (…)`, and `x <> ALL(…)` / `x != ALL(…)` → `x NOT IN (…)`.
    * Untyped `'{…}'` elements render numeric tokens bare and everything
    * else as string literals (PG coerces against the left operand; the
    * IN list lets Spark do the same). Other operator/quantifier combos
    * (`<> ANY`, `= ALL`) have no IN equivalent and are left unchanged, as
    * are subquery forms (`ANY(SELECT …)` doesn't match the pattern).
    */
  def rewriteAnyAll(sql: String): String = {
    val s = sql
    anyAllRe.replaceSomeIn(s, m =>
      if (inLiteral(s, m.start)) None
      else {
        val op = m.group(1)
        val quant = m.group(2).toUpperCase
        val neg = op == "<>" || op == "!="
        // only = ANY (membership) and <>/!= ALL (non-membership) map to IN
        if ((quant == "ANY" && neg) || (quant == "ALL" && !neg)) None
        else {
          val kw = if (neg) "NOT IN" else "IN"
          val listed: Option[String] =
            if (m.group(5) != null) // ARRAY[…] splice; empty list → leave
              Some(m.group(5).trim).filter(_.nonEmpty)
            else {
              val content = m.group(3).replace("''", "'").trim
              if (!(content.startsWith("{") && content.endsWith("}"))) None
              else {
                val tpe = Option(m.group(4)).map(sparkTypeName)
                val elems = pgArrayElements(content.substring(1, content.length - 1))
                if (elems.isEmpty) None // empty IN list is a parse error; leave
                else Some(elems.map {
                  case Some(e) => tpe match {
                    case Some(t) => s"CAST('${e.replace("'", "''")}' AS $t)"
                    case None if numericTokRe.matches(e) => e
                    case None => s"'${e.replace("'", "''")}'"
                  }
                  case None => "NULL"
                }.mkString(", "))
              }
            }
          listed.map(l => java.util.regex.Matcher.quoteReplacement(s"$kw ($l)"))
        }
      })
  }

  /** `'pat'` → `'(?i)pat'` (single-quoted literal in, literal out). */
  private def foldCaseFlag(lit: String): String =
    "'(?i)" + lit.substring(1)

  private val distinctOnRe = """(?is)^\s*select\s+distinct\s+on\s*\(""".r

  /** First top-level (outside parens and string literals) occurrence of
    * keyword `kw` (upper-case) in `s` as a whole word, or -1.
    */
  private def topLevelIndexOf(s: String, kw: String): Int = {
    val upper = s.toUpperCase
    var d = 0
    var j = 0
    var inStr = false
    while (j < s.length) {
      val c = s.charAt(j)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && upper.startsWith(kw, j) &&
            (j == 0 || !s.charAt(j - 1).isLetterOrDigit) &&
            (j + kw.length >= s.length || !s.charAt(j + kw.length).isLetterOrDigit))
            return j
      }
      j += 1
    }
    -1
  }

  /** Rewrite PostgreSQL `SELECT DISTINCT ON (keys) cols FROM … ORDER BY
    * keys, tiebreak` — keep the first row per key group under the ORDER BY
    * — into the Spark/ANSI row_number-window form:
    * `SELECT cols FROM (SELECT cols, row_number() OVER (PARTITION BY keys
    * ORDER BY full-order) AS __rn FROM …) WHERE __rn = 1`.
    *
    * Handles the common top-level single-SELECT form (the shape stream
    * configs use); statements where DISTINCT ON is nested in a subquery
    * are left unchanged. Called from [[rewrite]] before the cast passes.
    */
  def rewriteDistinctOn(sql: String): String = {
    val m = distinctOnRe.findFirstMatchIn(sql).getOrElse(return sql)
    // balanced-paren scan for the ON (…) key list
    val openIdx = m.end - 1
    var depth = 0
    var i = openIdx
    var close = -1
    while (i < sql.length && close < 0) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return sql
    val keys = sql.substring(openIdx + 1, close).trim
    val rest = sql.substring(close + 1)

    val fromIdx = topLevelIndexOf(rest, "FROM")
    if (fromIdx < 0) return sql
    val selectList = rest.substring(0, fromIdx).trim
    val afterSelect = rest.substring(fromIdx)
    val orderIdx = topLevelIndexOf(afterSelect, "ORDER")
    val (body0, orderClause) =
      if (orderIdx < 0) (afterSelect, "")
      else (afterSelect.substring(0, orderIdx), afterSelect.substring(orderIdx))
    // LIMIT may live after the ORDER BY or (with no ORDER BY) at the end
    // of the body; PG applies it AFTER dedup either way, so hoist it out
    val (body, limit) = {
      val inOrder = topLevelIndexOf(orderClause, "LIMIT")
      if (inOrder >= 0) (body0, orderClause.substring(inOrder))
      else {
        val inBody = topLevelIndexOf(body0, "LIMIT")
        if (inBody >= 0) (body0.substring(0, inBody), body0.substring(inBody))
        else (body0, "")
      }
    }
    val orderBy = {
      val inOrder = topLevelIndexOf(orderClause, "LIMIT")
      if (inOrder >= 0) orderClause.substring(0, inOrder) else orderClause
    }
    // PG requires ORDER BY to start with the DISTINCT ON keys; with no
    // ORDER BY the keys themselves give a deterministic (arbitrary-pick
    // replaced by first-by-key) order
    val windowOrder =
      if (orderBy.isEmpty) keys
      else orderBy.trim.replaceFirst("(?is)^order\\s+by\\s+", "")
    // The hoist moves FROM into a subquery, so a table alias or the table
    // name itself (SELECT DISTINCT ON (t.id) t.id … FROM tbl t ORDER BY
    // t.id — the common PG idiom) is out of scope in the OUTER select
    // list / ORDER BY. For the single-table form, strip those qualifiers
    // there (the inner window still sees them); multi-table statements
    // with qualified outer references would silently mis-resolve, so
    // reject those loudly.
    val quals = singleTableQualifiers(body)
    def stripAlias(fragment: String): String =
      quals.foldLeft(fragment) { (f, a) =>
        mapOutsideStrings(f)(
          _.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(a)}\\.", ""))
      }
    val qualifiedRe = """[A-Za-z_]\w*\.[A-Za-z_]""".r
    if (quals.isEmpty &&
        (qualifiedRe.findFirstIn(withoutLiterals(selectList)).isDefined ||
         qualifiedRe.findFirstIn(withoutLiterals(orderBy)).isDefined))
      throw new IllegalArgumentException(
        "DISTINCT ON rewrite: qualified column references with a multi-table " +
          "FROM are not supported — qualify-free the select list/ORDER BY or " +
          "rewrite the statement as a row_number() window manually")
    // inner SELECT * keeps every base column visible, so the outer select
    // list AND an outer ORDER BY over non-projected columns (the common
    // PG latest-row-per-key idiom) both resolve
    s"SELECT ${stripAlias(selectList)} FROM (SELECT *, row_number() OVER " +
      s"(PARTITION BY $keys ORDER BY $windowOrder) AS __rn ${body.trim}) " +
      s"WHERE __rn = 1" +
      (if (orderBy.trim.nonEmpty) " " + stripAlias(orderBy.trim) else "") +
      (if (limit.trim.nonEmpty) " " + limit.trim else "")
  }

  /** `s` with single-quoted literal contents blanked to spaces — for
    * scans that must ignore literal text.
    */
  private def withoutLiterals(s: String): String = {
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inStr && c == '\'') { inStr = true; sb.append(' ') }
      else if (inStr && c == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') { sb.append("  "); i += 1 }
        else { inStr = false; sb.append(' ') }
      }
      else sb.append(if (inStr) ' ' else c)
      i += 1
    }
    sb.toString()
  }

  /** The strippable qualifier names of a simple single-table
    * `FROM tbl [AS alias] [WHERE …]` body: the table name's last segment
    * plus the alias when present — empty for multi-table/JOIN bodies.
    */
  private def singleTableQualifiers(body: String): Seq[String] = {
    val code = withoutLiterals(body)
    if ("""(?is)\bjoin\b""".r.findFirstIn(code).isDefined) return Nil
    // top-level comma ⇒ old-style multi-table FROM
    var d = 0
    var i = 0
    while (i < code.length) {
      code.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case ',' if d == 0 => return Nil
        case _ =>
      }
      i += 1
    }
    val kw = Set("where", "group", "having", "order", "limit",
      "window", "qualify")
    """(?is)^\s*FROM\s+([A-Za-z_][\w\.]*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?""".r
      .findFirstMatchIn(body.trim) match {
      case Some(m) =>
        val tableLast = m.group(1).split('.').last
        val alias = Option(m.group(2)).filterNot(a => kw(a.toLowerCase))
        (tableLast +: alias.toSeq).distinct
      case None => Nil
    }
  }

  private val nestedDistinctOnRe = """(?is)select\s+distinct\s+on\s*\(""".r

  /** Rewrite DISTINCT ON occurrences NESTED inside parentheses — derived
    * tables and CTE bodies, e.g.
    * `WITH latest AS (SELECT DISTINCT ON (k) … ) SELECT …` or
    * `SELECT … FROM (SELECT DISTINCT ON (k) …) t`. Each parenthesized
    * span whose content starts with the DISTINCT ON select is itself a
    * complete single-SELECT statement, so the top-level
    * [[rewriteDistinctOn]] applies to it verbatim; spans are rewritten
    * innermost-occurrence-first until none remain.
    */
  def rewriteNestedDistinctOn(sql: String): String = {
    var out = sql
    var progressed = true
    while (progressed) {
      progressed = false
      val candidates = nestedDistinctOnRe.findAllMatchIn(out)
        .map(_.start).filterNot(inLiteral(out, _)).toList
      val it = candidates.iterator
      while (!progressed && it.hasNext) {
        val p = it.next()
        // the subquery form: '(' immediately (mod whitespace) before SELECT
        var i = p - 1
        while (i >= 0 && out.charAt(i).isWhitespace) i -= 1
        if (i >= 0 && out.charAt(i) == '(') {
          // matching close paren, literal-aware
          var depth = 0
          var j = i
          var close = -1
          var inStr = false
          while (j < out.length && close < 0) {
            val c = out.charAt(j)
            if (inStr) { if (c == '\'') inStr = false }
            else c match {
              case '\'' => inStr = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          if (close > 0) {
            val inner = out.substring(i + 1, close)
            val rewritten = rewriteDistinctOn(inner)
            if (rewritten != inner) {
              out = out.substring(0, i + 1) + rewritten + out.substring(close)
              progressed = true
            }
          }
        }
      }
    }
    out
  }

  /** Rewrite one `(...)::type` / `fn(...)::type` cast (balanced-paren scan;
    * regex alone cannot match the operand). Iterated by `rewrite`.
    */
  private def rewriteParenCast(sql: String): String =
    parenCastRe.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        var depth = 0
        var j = m.start // index of ')'
        var open = -1
        while (j >= 0 && open < 0) {
          sql.charAt(j) match {
            case ')' => depth += 1
            case '(' => depth -= 1; if (depth == 0) open = j
            case _ =>
          }
          j -= 1
        }
        if (open < 0) sql // unbalanced; leave untouched
        else {
          var k = open - 1 // include a preceding function name, if any
          while (k >= 0 && (sql.charAt(k).isLetterOrDigit || sql.charAt(k) == '_')) k -= 1
          val start = k + 1
          val operand = sql.substring(start, m.start + 1)
          val tpe = sparkTypeName(m.group(1))
          sql.substring(0, start) + s"CAST($operand AS $tpe)" + sql.substring(m.end)
        }
    }

  /** PG `trunc(x[, d])` is NUMERIC truncation toward zero — PG has no
    * bare `trunc` over dates (that is `date_trunc`, which the `\btrunc`
    * boundary never touches) — while Spark's `trunc` is DATE-only, so a
    * pass-through would cast the operand to DATE and NULL out. Rewritten
    * to the floor/ceil pair (Spark's 2-arg scale forms), which IS
    * round-toward-zero: floor for non-negative operands, ceil for
    * negative. One-arg trunc gets scale 0, matching PG.
    */
  def rewriteNumericTrunc(sql: String): String = {
    val re = """(?i)(?<![A-Za-z0-9_])trunc\s*\(""".r
    re.findAllMatchIn(sql).filterNot(m => inLiteral(sql, m.start))
      .toSeq.headOption match {
      case None => sql
      case Some(m) =>
        // balanced scan from the open paren, literal-aware, collecting
        // top-level commas
        var depth = 0
        var i = m.end - 1
        var close = -1
        var inStr = false
        var comma = -1
        while (i < sql.length && close < 0) {
          val c = sql.charAt(i)
          if (inStr) { if (c == '\'') inStr = false } // '' toggles twice, nets out
          else c match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case ',' if depth == 1 && comma < 0 => comma = i
            case _ =>
          }
          i += 1
        }
        if (close < 0) sql // unbalanced; leave untouched
        else {
          val open = m.end - 1
          val (x, d) =
            if (comma >= 0)
              (sql.substring(open + 1, comma), sql.substring(comma + 1, close))
            else (sql.substring(open + 1, close), "0")
          val repl =
            s"(CASE WHEN ($x) >= 0 THEN FLOOR(($x), ($d)) " +
              s"ELSE CEIL(($x), ($d)) END)"
          // recurse: later (or operand-nested) truncs; each pass removes
          // one trunc( token and introduces none, so this terminates
          rewriteNumericTrunc(
            sql.substring(0, m.start) + repl + sql.substring(close + 1))
        }
    }
  }

  private val extractRe = """(?i)\bextract\s*\(""".r
  private val dateTruncRe = """(?i)\bdate_trunc\s*\(\s*'([A-Za-z]+)'\s*,""".r

  /** Balanced close-paren index for the '(' at `openIdx` (literal-aware);
    * -1 when unbalanced.
    */
  private def balancedClose(sql: String, openIdx: Int): Int = {
    var depth = 0
    var i = openIdx
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false } // '' toggles twice, nets out
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** PG `EXTRACT(field FROM expr)` fields Spark lacks or spells
    * differently (PG functions-datetime §9.9 vs Spark's DatePart):
    *   - `epoch`        → `UNIX_MICROS(CAST(x AS TIMESTAMP)) / 1e6`
    *     (PG returns numeric WITH the fractional seconds; the previous
    *     UNIX_TIMESTAMP form silently truncated microseconds, and a
    *     direct `CAST(ts AS DOUBLE)` is forbidden under ANSI)
    *   - `dow`          → `DAYOFWEEK - 1` (PG counts Sun=0…Sat=6; Spark's
    *     DOW field is dayofweek's Sun=1…Sat=7, NOT PG's — found by the
    *     PropertySpec corpus)
    *   - `isodow`       → `DAYOFWEEK_ISO` (Mon=1…Sun=7 in both)
    *   - `isoyear`      → `YEAROFWEEK`
    *   - `decade`       → `FLOOR(YEAR(x) / 10)`
    *   - `century`      → `CEIL(YEAR(x) / 100.0)` (AD years: 2000→20, 2001→21)
    *   - `millennium`   → `CEIL(YEAR(x) / 1000.0)`
    *   - `milliseconds` → `SECOND × 1000` (PG: seconds incl. fraction × 10³)
    *   - `microseconds` → `SECOND × 10⁶` cast to BIGINT
    * Every other field passes through — Spark's semantics match PG
    * (`week` = ISO week number, `second` carries the fraction as
    * DECIMAL), pinned by PropertySpec's generated corpus
    * against an independent java.time PG-rules interpreter. The
    * century/decade/millennium arithmetic assumes AD years (PG counts
    * BC centuries differently; stream configs never carry BC dates).
    * PG also allows `epoch` over INTERVAL values (total seconds) —
    * not supported here; such statements ride the pushdown fallback.
    */
  def rewriteExtract(sql: String): String = {
    val m = extractRe.findAllMatchIn(sql)
      .find(mm => !inLiteral(sql, mm.start)).getOrElse(return sql)
    val openIdx = m.end - 1
    val close = balancedClose(sql, openIdx)
    if (close < 0) return sql
    val args = sql.substring(openIdx + 1, close)
    val fromIdx = topLevelIndexOf(args, "FROM")
    if (fromIdx < 0) return sql
    val field = args.substring(0, fromIdx).trim.toLowerCase
    val op = args.substring(fromIdx + 4).trim
    val replaced = field match {
      case "epoch" => s"(UNIX_MICROS(CAST($op AS TIMESTAMP)) / 1000000.0D)"
      case "dow" => s"(EXTRACT(DAYOFWEEK FROM $op) - 1)"
      case "isodow" => s"EXTRACT(DAYOFWEEK_ISO FROM $op)"
      case "isoyear" => s"EXTRACT(YEAROFWEEK FROM $op)"
      case "decade" => s"FLOOR(YEAR($op) / 10)"
      case "century" => s"CEIL(YEAR($op) / 100.0)"
      case "millennium" => s"CEIL(YEAR($op) / 1000.0)"
      case "milliseconds" => s"(EXTRACT(SECOND FROM $op) * 1000)"
      case "microseconds" =>
        s"CAST(EXTRACT(SECOND FROM $op) * 1000000 AS BIGINT)"
      case _ => null
    }
    if (replaced == null)
      // pass-through field: recurse into the operand (a nested extract
      // may hide inside) and the remainder
      sql.substring(0, openIdx + 1) + rewriteExtract(args) + ")" +
        rewriteExtract(sql.substring(close + 1))
    else
      // each pass eliminates one rewritable extract( and introduces at
      // most pass-through ones, so this terminates
      rewriteExtract(
        sql.substring(0, m.start) + replaced + sql.substring(close + 1))
  }

  /** PG `date_trunc('field', expr)` fields Spark's `date_trunc` lacks:
    * `decade`/`century`/`millennium` become a MAKE_TIMESTAMP on the
    * period-start year (PG: decades start at y0, centuries/millennia at
    * y1 — `date_trunc('century', 2000-05-01)` → 1901-01-01), and PG's
    * plural sub-second spellings (`milliseconds`/`microseconds`, the
    * canonical PG field names) fold to Spark's singular. All other
    * fields pass through unchanged — Spark's `week` (Monday), `quarter`,
    * etc. match PG, pinned by the PropertySpec corpus.
    */
  def rewriteDateTrunc(sql: String): String = {
    val candidates = dateTruncRe.findAllMatchIn(sql)
      .filterNot(mm => inLiteral(sql, mm.start))
    val m = candidates.find { mm =>
      val f = mm.group(1).toLowerCase
      f == "decade" || f == "century" || f == "millennium" ||
        f == "milliseconds" || f == "microseconds"
    }.getOrElse(return sql)
    val openIdx = sql.indexOf('(', m.start)
    val close = balancedClose(sql, openIdx)
    if (close < 0) return sql
    val op = sql.substring(m.end, close).trim
    val y = s"YEAR($op)"
    val replaced = m.group(1).toLowerCase match {
      case "decade" =>
        s"MAKE_TIMESTAMP(CAST(FLOOR($y / 10) * 10 AS INT), 1, 1, 0, 0, 0)"
      case "century" =>
        s"MAKE_TIMESTAMP(CAST((CEIL($y / 100.0) - 1) * 100 + 1 AS INT), 1, 1, 0, 0, 0)"
      case "millennium" =>
        s"MAKE_TIMESTAMP(CAST((CEIL($y / 1000.0) - 1) * 1000 + 1 AS INT), 1, 1, 0, 0, 0)"
      case "milliseconds" => s"date_trunc('MILLISECOND', $op)"
      case "microseconds" => s"date_trunc('MICROSECOND', $op)"
    }
    rewriteDateTrunc(
      sql.substring(0, m.start) + replaced + sql.substring(close + 1))
  }

  private val toCharRe = """(?i)\bto_char\s*\(""".r

  // PG → DateTimeFormatter tokens with EXACT output parity (longest
  // first so HH24 is not eaten by HH). Word tokens are case-sensitive
  // in PG (template case controls output case: Mon/MON/mon) — only the
  // capitalized forms map, because Java's en-US locale prints "Jan"/
  // "Mon"; numeric tokens are case-insensitive in PG, so the common
  // lowercase spellings map too.
  private val toCharTokens: Seq[(String, String)] = Seq(
    "HH24" -> "HH", "hh24" -> "HH", "HH12" -> "hh", "hh12" -> "hh",
    "YYYY" -> "yyyy", "yyyy" -> "yyyy", "DDD" -> "DDD", "ddd" -> "DDD",
    "MS" -> "SSS", "ms" -> "SSS", "US" -> "SSSSSS", "us" -> "SSSSSS",
    "Mon" -> "MMM", "Dy" -> "EEE", "AM" -> "a", "PM" -> "a",
    "YY" -> "yy", "yy" -> "yy", "MM" -> "MM", "mm" -> "MM",
    "DD" -> "dd", "dd" -> "dd", "HH" -> "hh", "hh" -> "hh",
    "MI" -> "mm", "mi" -> "mm", "SS" -> "ss", "ss" -> "ss",
    "Q" -> "Q", "q" -> "Q")

  // Template constructs with NO exact Spark equivalent: blank-padded
  // word forms (Month/Day pad to 9 chars in PG), FM/FX/TH modifiers,
  // seconds-past-midnight, ISO week/day-of-week numbers, eras, Julian
  // days, lowercase meridiem (Java prints "AM" only). A template
  // containing any of these is left untouched → execution="auto"
  // streams push the ORIGINAL SQL down to the remote.
  private val toCharUnsupported: Seq[String] = Seq(
    "SSSSS", "SSSS", "sssss", "ssss", "MONTH", "Month", "month",
    "MON", "mon", "DAY", "Day", "day", "DY", "dy", "IYYY", "IYY",
    "IY", "IW", "iw", "WW", "ww", "CC", "cc", "TZ", "tz", "OF",
    "FM", "fm", "FX", "fx", "TH", "th", "SP", "sp", "RM", "rm",
    "A.M.", "P.M.", "a.m.", "p.m.", "am", "pm", "AD", "BC", "ad",
    "bc", "A.D.", "B.C.", "J", "W", "w", "Y,YYY", "EPOCH", "FF")

  /** PG `to_char` datetime template → Spark DateTimeFormatter pattern,
    * or None when any token lacks an exact-parity translation.
    * Double-quoted template text becomes a single-quoted pattern
    * literal; plain punctuation/space separators pass through.
    */
  private[sources] def toCharPattern(tpl: String): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    while (i < tpl.length) {
      if (tpl.charAt(i) == '"') {
        val end = tpl.indexOf('"', i + 1)
        if (end < 0) return None
        val text = tpl.substring(i + 1, end)
        if (text.nonEmpty)
          sb.append('\'').append(text.replace("'", "''")).append('\'')
        i = end + 1
      } else {
        val rest = tpl.substring(i)
        if (toCharUnsupported.exists(rest.startsWith)) return None
        toCharTokens.find { case (pg, _) => rest.startsWith(pg) } match {
          case Some((pg, j)) => sb.append(j); i += pg.length
          case None =>
            val c = rest.head
            if (" -/:.,;()".indexOf(c.toInt) >= 0) { sb.append(c); i += 1 }
            else return None
        }
      }
    }
    Some(sb.toString)
  }

  /** Rewrite PG `to_char(expr, template)`: datetime templates translate
    * to Spark `DATE_FORMAT(expr, '<pattern>')` when exact parity holds
    * ([[toCharPattern]]); numeric templates (disjoint token set) go to
    * the native PG-rules renderer `pg_to_char_num`
    * ([[graft.plans.PgNumFormat]], session-registered by
    * [[PgFunctions]]) — Spark's own `to_char` number grammar diverges
    * from PG on sign columns, separator blanking and FM. Everything
    * else is left untouched and surfaces as an AnalysisException that
    * the `auto` execution mode turns into remote pushdown. Semantics
    * pinned by PropertySpec's generated template corpora vs independent
    * PG-rules renderers (datetime AND numeric).
    */
  def rewriteToChar(sql: String): String = {
    val m = toCharRe.findAllMatchIn(sql)
      .find(mm => !inLiteral(sql, mm.start)).getOrElse(return sql)
    val openIdx = m.end - 1
    val close = balancedClose(sql, openIdx)
    if (close < 0) return sql
    def skipRest(): String =
      sql.substring(0, close + 1) + rewriteToChar(sql.substring(close + 1))
    val args = sql.substring(openIdx + 1, close)
    val commaIdx = {
      // first top-level comma, literal-aware
      var d = 0; var j = 0; var inStr = false; var at = -1
      while (j < args.length && at < 0) {
        val c = args.charAt(j)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => d += 1
          case ')' => d -= 1
          case ',' if d == 0 => at = j
          case _ =>
        }
        j += 1
      }
      at
    }
    if (commaIdx < 0) return skipRest()
    val arg1 = args.substring(0, commaIdx).trim
    val tplLit = args.substring(commaIdx + 1).trim
    if (tplLit.length < 2 || tplLit.head != '\'' || tplLit.last != '\'')
      return skipRest()
    val tpl = tplLit.substring(1, tplLit.length - 1).replace("''", "'")
    toCharPattern(tpl) match {
      case None =>
        // not a datetime template — numeric? PG numeric templates and
        // datetime ones are disjoint (9/0/./,/S/MI/PR vs YYYY/MM/…), so
        // a successful numeric parse is unambiguous. Rewrites to the
        // registered native renderer (PgFunctions.ensureRegistered).
        graft.plans.PgNumFormat.parse(tpl) match {
          case Some(_) =>
            rewriteToChar(sql.substring(0, m.start) +
              s"pg_to_char_num($arg1, '${tpl.replace("'", "''")}')" +
              sql.substring(close + 1))
          case None => skipRest()
        }
      case Some(p) =>
        rewriteToChar(sql.substring(0, m.start) +
          s"DATE_FORMAT($arg1, '${p.replace("'", "''")}')" +
          sql.substring(close + 1))
    }
  }

  /** Spark SQL name for a PG type string (uuid → STRING, etc.). */
  def sparkTypeName(pgType: String): String =
    TypeMapper.toDataType(pgType).sql

  /** Render a value as a typed SQL literal for the given target type.
    * Strings are single-quote escaped; timestamps/dates become typed
    * literals so comparison semantics match the declared column.
    */
  def renderLiteral(value: String, dataType: DataType): String = dataType match {
    case IntegerType | LongType | ShortType => value.trim.toLong.toString
    case FloatType | DoubleType => value.trim.toDouble.toString
    case _: DecimalType => BigDecimal(value.trim).toString
    case BooleanType => value.trim.toBoolean.toString
    case TimestampType => s"TIMESTAMP '${escape(value)}'"
    case DateType => s"DATE '${escape(value)}'"
    case _ => s"'${escape(value)}'"
  }

  private def escape(s: String): String = s.replace("'", "''")

  /** Substitute the `:rep_key_val` bind parameter with a typed literal.
    * Errors if the SQL references the parameter but no value is supplied
    * (mirrors reference: client.py:278-281 / 287-298).
    */
  def bindRepKeyVal(sql: String, value: Option[String], dataType: DataType): String = {
    val param = ":rep_key_val"
    if (!sql.contains(param)) sql
    else value match {
      case Some(v) => sql.replace(param, renderLiteral(v, dataType))
      case None =>
        throw new IllegalStateException(
          "SQL references :rep_key_val but no replication-key value is available " +
            "(no state bookmark and no replication_key_value_start)")
    }
  }
}
