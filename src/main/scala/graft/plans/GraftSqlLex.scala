package graft.plans

/** THE one lexer the SQL prefix intercepts share (VERDICT r11 watch item:
  * three quote/paren fix waves in one round, each patching a private scan
  * — the class of bug retires by having exactly one scanner and one
  * emitter that are exact inverses, property-tested as a pair in
  * `SqlRoundTripProperties`).
  *
  * The contract, mirroring Spark's own lexer where the scanned text is
  * later handed to it (`parseTableSchema`, `parseExpression`):
  *  - single-quoted literals escape by ANSI `''` doubling AND by
  *    backslash (`\'`, `\\`) — both spellings legal on input; the
  *    emitter [[q]] produces `''` for quotes and `\\` for backslashes,
  *    so emission ∘ parse is the identity on every string;
  *  - `--` line comments and slash-star block comments are skipped
  *    outside quotes (an apostrophe inside a remark is legal DDL and
  *    must not flip quote state);
  *  - parens balance only outside quotes and comments.
  */
private[graft] object GraftSqlLex {

  /** Emitter: quote-double and backslash-double — the exact inverse of
    * [[quotedLiteral]]'s unescaping, so DDL emitted with `'${q(v)}'`
    * replays to the identical stored value. */
  def q(s: String): String = s.replace("\\", "\\\\").replace("'", "''")

  /** Index of the `)` balancing the `(` at `open`; −1 if unbalanced (or
    * an unterminated quote/block comment swallows the close). */
  def balancedClose(s: String, open: Int): Int = {
    var depth = 0; var i = open; var inQuote = false
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQuote && ch == '\\' && i + 1 < s.length) i += 1 // skip escaped char
      else if (ch == '\'') inQuote = !inQuote
      else if (!inQuote && ch == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        // line comment: skip to end of line (or end of input)
        while (i < s.length && s.charAt(i) != '\n') i += 1
        i -= 1 // the loop's own increment lands on the newline itself
      }
      else if (!inQuote && ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        if (end < 0) return -1 // unterminated block comment: unbalanced
        i = end + 1 // loop increment lands past the closing '/'
      }
      else if (!inQuote && ch == '(') depth += 1
      else if (!inQuote && ch == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** Scan one single-quoted SQL string literal starting at `from` (which
    * must point at the opening `'`). Returns (unescaped value, index just
    * past the closing quote). Only `\'` and `\\` unescape — [[q]] emits
    * exactly these two, so any other `\x` passes through verbatim (a
    * regex inside a CHECK predicate keeps its backslashes). */
  def quotedLiteral(s: String, from: Int): (String, Int) = {
    require(from < s.length && s.charAt(from) == '\'',
      s"expected a quoted literal at '${s.drop(from).take(20)}'")
    var i = from + 1
    val b = new StringBuilder
    while (true) {
      require(i < s.length, "unterminated string literal")
      val ch = s.charAt(i)
      if (ch == '\\' && i + 1 < s.length &&
          (s.charAt(i + 1) == '\'' || s.charAt(i + 1) == '\\')) {
        b.append(s.charAt(i + 1)); i += 2
      } else if (ch == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') { b.append('\''); i += 2 }
        else return (b.toString, i + 1)
      } else { b.append(ch); i += 1 }
    }
    sys.error("unreachable")
  }

  /** Blank out quoted literals and SQL comments (same quote/comment rules
    * as [[balancedClose]]), for KEYWORD PEEKS that must not match text
    * inside a literal — e.g. deciding whether a CREATE TABLE says
    * `USING graft` when a property value or remark could carry those
    * words. Lengths are not preserved; only keyword visibility is. */
  def stripLiteralsAndComments(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') {
        // best-effort: an unterminated literal swallows the rest, which
        // is exactly what a peek should see (nothing after it is code)
        try { val (_, next) = quotedLiteral(s, i); b.append("''"); i = next }
        catch { case _: IllegalArgumentException => i = s.length }
      } else if (ch == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        i = if (end < 0) s.length else end + 2
      } else { b.append(ch); i += 1 }
    }
    b.toString
  }

  /** LENGTH-PRESERVING mask: literal CONTENTS and comments become spaces
    * (the quote delimiters themselves are kept, so `KEYWORD\s*'` shapes
    * still anchor), for keyword scans that must SPLICE the original text
    * by the match offsets — [[stripLiteralsAndComments]] changes lengths
    * and can only answer is-the-keyword-present, not where. A scan over
    * the mask can never anchor inside a quoted literal, which retires the
    * clause-order hazard class (ADVICE r12: a LOCATION path containing
    * "TBLPROPERTIES (" anchored the props scan mid-literal).
    * `keepComments = true` leaves comment TEXT visible (literals still
    * blanked) — for the one scan that must match a commented keyword:
    * the `-- STATS (…)` line SHOW CREATE emits for verbatim replay. */
  def mask(s: String, keepComments: Boolean = false): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') {
        val end =
          try Some(quotedLiteral(s, i)._2)
          catch { case _: IllegalArgumentException => None } // unterminated
        b.append('\'')
        end match {
          case Some(e) => // e points just past the closing quote
            (i + 1 until e - 1).foreach(_ => b.append(' '))
            b.append('\'')
            i = e
          case None => // unterminated: the rest is literal — all spaces
            (i + 1 until s.length).foreach(_ => b.append(' '))
            i = s.length
        }
      } else if (!keepComments && ch == '-' && i + 1 < s.length &&
          s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') { b.append(' '); i += 1 }
      } else if (!keepComments && ch == '/' && i + 1 < s.length &&
          s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        val stop = if (end < 0) s.length else end + 2
        while (i < stop) { b.append(' '); i += 1 }
      } else { b.append(ch); i += 1 }
    }
    b.toString
  }

  /** Parse a `'k' = 'v', …` literal list (TBLPROPERTIES bodies) — both
    * sides through [[quotedLiteral]], so values carrying quoted SQL
    * (CHECK predicates with string literals, regexes with backslashes)
    * survive exactly. */
  def parsePropPairs(inner: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    def skipWs(): Unit = while (i < inner.length && inner.charAt(i).isWhitespace) i += 1
    def lit(what: String): String = {
      require(i < inner.length && inner.charAt(i) == '\'',
        s"TBLPROPERTIES: expected a quoted $what at '${inner.drop(i).take(20)}'")
      val (v, next) = quotedLiteral(inner, i)
      i = next
      v
    }
    skipWs()
    while (i < inner.length) {
      val k = lit("key")
      skipWs()
      require(i < inner.length && inner.charAt(i) == '=',
        s"TBLPROPERTIES: expected '=' after '$k'")
      i += 1; skipWs()
      out += k -> lit("value")
      skipWs()
      if (i < inner.length) {
        require(inner.charAt(i) == ',', s"TBLPROPERTIES: expected ',' at " +
          s"'${inner.drop(i).take(20)}'")
        i += 1; skipWs()
      }
    }
    out.result()
  }
}
