package graft.sqlfront

/** Quote-aware SQL text utilities.
  *
  * Behavior mirrors the reference engine's char-scanners (see
  * /root/reference/server/util/util.go:21-165): `--` comments stripped
  * outside quotes, statements split on `;` outside quotes with escaped
  * (`''` / `""`) quotes honored, and literal/identifier escaping that
  * drops NUL/ctrl-Z and flattens newlines.
  */
object SqlText {

  def escapeSQLString(str: String): String =
    str.replace("'", "''")
      .replace("\u0000", "")   // remove NUL bytes
      .replace("\n", " ")      // newlines -> space
      .replace("\r", " ")      // carriage returns -> space
      .replace("\u001a", "")   // remove ctrl+Z

  def escapeSQLIdentifier(str: String): String =
    str.replace("\"", "\"\"")
      .replace("\u0000", "")
      .replace("\n", " ")
      .replace("\r", " ")
      .replace("\u001a", "")

  /** Remove `--` line comments, respecting single/double quotes and
    * doubled-quote escapes. (ref: util.go:39-94) */
  def stripComments(sql: String): String = {
    val out = new StringBuilder
    var inSingle = false
    var inDouble = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' && !inDouble) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          out.append(c).append(sql.charAt(i + 1)); i += 2
        } else { inSingle = !inSingle; out.append(c); i += 1 }
      } else if (c == '"' && !inSingle) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '"') {
          out.append(c).append(sql.charAt(i + 1)); i += 2
        } else { inDouble = !inDouble; out.append(c); i += 1 }
      } else if (c == '-' && !inSingle && !inDouble &&
          i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
        if (i < sql.length) { out.append(sql.charAt(i)); i += 1 }
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Split a script into statements on `;` outside quotes. Returns
    * Left(error message) on unclosed quotes, mirroring the reference's
    * line-number diagnostics (ref: util.go:97-165). */
  def splitQueries(sql: String): Either[String, Seq[String]] = {
    val queries = Seq.newBuilder[String]
    val current = new StringBuilder
    var inSingle = false
    var inDouble = false
    var lineNum = 1
    var quoteStartLine = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      current.append(c)
      if (c == '\n') lineNum += 1
      if (c == '\'' && !inDouble) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          current.append(sql.charAt(i + 1)); i += 1
        } else {
          if (!inSingle) quoteStartLine = lineNum
          inSingle = !inSingle
        }
      } else if (c == '"' && !inSingle) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '"') {
          current.append(sql.charAt(i + 1)); i += 1
        } else {
          if (!inDouble) quoteStartLine = lineNum
          inDouble = !inDouble
        }
      } else if (c == ';' && !inSingle && !inDouble) {
        val q = current.toString.trim
        if (q.nonEmpty) queries += q.dropRight(1) // strip the `;`
        current.clear()
      }
      i += 1
    }
    if (inSingle) Left(s"unclosed single quote starting in line ${quoteStartLine + 1}")
    else if (inDouble) Left(s"unclosed double quote starting in line ${quoteStartLine + 1}")
    else {
      val last = current.toString.trim
      if (last.nonEmpty) queries += last
      Right(queries.result())
    }
  }

  private[sqlfront] def isSpaceChar(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\t' || c == '\r'

  /** Index of the `)` matching the `(` at/after startPos, quote-aware.
    * (ref: sql_validation.go:393-427) */
  def findClosingParen(sql: String, startPos: Int): Either[String, Int] = {
    var inSingle = false
    var inDouble = false
    var depth = 0
    var i = startPos
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' && !inDouble) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
        else inSingle = !inSingle
      } else if (c == '"' && !inSingle) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '"') i += 1
        else inDouble = !inDouble
      } else if (!inSingle && !inDouble) {
        if (c == '(') depth += 1
        else if (c == ')') {
          depth -= 1
          if (depth == 0) return Right(i)
        }
      }
      i += 1
    }
    Left("unmatched parenthesis")
  }

  /** End position of the identifier starting at pos (quoted or bare).
    * (ref: sql_validation.go:429-452) */
  def skipIdentifier(sql: String, pos: Int): Either[String, Int] = {
    if (pos >= sql.length) return Right(pos)
    if (sql.charAt(pos) == '"') {
      var i = pos + 1
      while (i < sql.length) {
        if (sql.charAt(i) == '"') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '"') i += 1
          else return Right(i + 1)
        }
        i += 1
      }
      Left("unclosed double quote")
    } else {
      var i = pos
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (isSpaceChar(c) || c == '(' || c == ')' || c == ',' || c == ';' || c == '.')
          return Right(i)
        i += 1
      }
      Right(sql.length)
    }
  }
}
