package graft.sqlfront

import SqlText._

/** Statement gate: classifies SQL statements as side-effect / allowed-read /
  * denied for dashboards, and the wider task variant. Word-prefix matching
  * with recursive WITH-CTE and parenthesized-query descent, matching the
  * reference's admission rules (ref: server/core/sql_validation.go:12-275).
  */
object Gate {

  private val sideEffectStatements: Seq[Seq[String]] = {
    val tempKinds = for {
      orReplace <- Seq(Seq.empty[String], Seq("OR", "REPLACE"))
      temp <- Seq("TEMPORARY", "TEMP")
      kind <- Seq("TABLE", "VIEW")
    } yield Seq("CREATE") ++ orReplace ++ Seq(temp, kind)
    val macroKinds = for {
      prefix <- Seq(Seq.empty[String], Seq("OR", "REPLACE"))
      temp <- Seq("TEMP", "TEMPORARY")
      kind <- Seq("MACRO", "FUNCTION")
      ifNotExists <- Seq(Seq.empty[String], Seq("IF", "NOT", "EXISTS"))
      // reference lists IF NOT EXISTS only for the non-OR-REPLACE forms
      if !(prefix.nonEmpty && ifNotExists.nonEmpty)
    } yield Seq("CREATE") ++ prefix ++ Seq(temp, kind) ++ ifNotExists
    Seq(
      Seq("USE"), Seq("SET", "VARIABLE"), Seq("BEGIN"), Seq("COMMIT"),
      Seq("ROLLBACK"), Seq("ABORT"), Seq("CALL"), Seq("RESET", "VARIABLE")
    ) ++ tempKinds ++ macroKinds
  }

  private val allowedReads: Seq[Seq[String]] = Seq(
    Seq("SELECT"), Seq("FROM"), Seq("VALUES"), Seq("SUMMARIZE"),
    Seq("DESC"), Seq("DESCRIBE"), Seq("SHOW", "TABLES"),
    Seq("SHOW", "ALL", "TABLES"), Seq("PIVOT"), Seq("UNPIVOT"), Seq("EXPLAIN"))

  /** Word-boundary prefix match on an upper-cased statement.
    * (ref: sql_validation.go:77-91) */
  private def matchesPrefix(upperSql: String, prefix: Seq[String]): Boolean = {
    var sub = upperSql
    prefix.foreach { s =>
      if (!sub.startsWith(s)) return false
      val after = sub.substring(s.length)
      if (after.nonEmpty && !isSpaceChar(after.charAt(0)) &&
          after.charAt(0) != '(' && after.charAt(0) != ';' && after.charAt(0) != ',')
        return false
      sub = after.trim
    }
    true
  }

  /** Statements run only for side effects — executed but hidden from
    * dashboard output. `inMemoryAttach` mirrors the reference's
    * :memory:-mode ATTACH special case. */
  def isSideEffect(sql: String, inMemoryAttach: Boolean = true): Boolean = {
    val upper = sql.trim.toUpperCase
    if (inMemoryAttach && upper.startsWith("ATTACH")) return true
    sideEffectStatements.exists(matchesPrefix(upper, _))
  }

  /** Dashboard gate in file-backed mode (ATTACH denied).
    * (ref: sql_validation_test.go:152-158) */
  def isAllowedStatementStrict(sql: String): Boolean =
    isAllowedStatement(sql, inMemory = false)

  /** Dashboard gate. (ref: sql_validation.go:93-177) */
  def isAllowedStatement(sql0: String, inMemory: Boolean = true): Boolean = {
    val sql = sql0.trim
    if (sql.isEmpty) return true
    val upper = sql.toUpperCase

    if (upper.startsWith("WITH")) {
      return splitWithStatement(sql) match {
        case Right((remaining, ctes)) =>
          ctes.forall(isAllowedStatement(_, inMemory)) && isAllowedStatement(remaining, inMemory)
        case Left(_) => false
      }
    }

    if (upper.startsWith("(")) return parenthesizedAllowed(sql, isAllowedStatement(_, inMemory))

    if (isSideEffect(sql, inMemoryAttach = inMemory)) return true

    allowedReads.exists { stmt =>
      matchesPrefix(upper, stmt) && {
        if (stmt.head == "EXPLAIN") {
          var rest = sql.substring("EXPLAIN".length).trim
          if (rest.isEmpty) true
          else {
            if (rest.toUpperCase.startsWith("ANALYZE"))
              rest = rest.substring("ANALYZE".length).trim
            rest.isEmpty || isAllowedStatement(rest)
          }
        } else true
      }
    }
  }

  /** Task gate (wider: DDL/DML allowed, PRAGMA and config SET denied).
    * (ref: sql_validation.go:179-275) */
  def isAllowedTaskStatement(sql0: String): Boolean = {
    val sql = sql0.trim
    if (sql.isEmpty) return true
    val upper = sql.toUpperCase

    if (upper.startsWith("WITH")) {
      return splitWithStatement(sql) match {
        case Right((remaining, ctes)) =>
          ctes.forall(isAllowedTaskStatement) && isAllowedTaskStatement(remaining)
        case Left(_) => false
      }
    }

    if (upper.startsWith("(")) return parenthesizedAllowed(sql, isAllowedTaskStatement)

    if (matchesPrefix(upper, Seq("PRAGMA"))) return false
    if (upper.startsWith("INSTALL") || upper.startsWith("LOAD")) return true
    if (upper.startsWith("ATTACH") || upper.startsWith("DETACH")) return true
    if (upper.startsWith("CREATE") && matchesPrefix(upper, Seq("CREATE", "SECRET"))) return true
    if (upper.startsWith("SET")) return matchesPrefix(upper, Seq("SET", "VARIABLE"))
    if (upper.startsWith("RESET")) return matchesPrefix(upper, Seq("RESET", "VARIABLE"))
    true
  }

  private def parenthesizedAllowed(sql: String, check: String => Boolean): Boolean =
    splitParenthesized(sql) match {
      case Left(_) => false
      case Right((inner, remaining0)) =>
        if (!check(inner)) false
        else {
          val remaining = remaining0.trim
          if (remaining.isEmpty) true
          else {
            val remUpper = remaining.toUpperCase
            val setOp = Seq("UNION", "INTERSECT", "EXCEPT").find(remUpper.startsWith)
            setOp match {
              case Some(op) =>
                var rest = remaining.substring(op.length).trim
                val restUpper = rest.toUpperCase
                if (restUpper.startsWith("ALL")) rest = rest.substring(3).trim
                else if (restUpper.startsWith("DISTINCT")) rest = rest.substring(8).trim
                check(rest)
              case None =>
                remUpper.startsWith("ORDER") || remUpper.startsWith("LIMIT") ||
                remUpper.startsWith("OFFSET") || remUpper.startsWith("FETCH")
            }
          }
        }
    }

  /** Extract CTE bodies and the main query from a WITH statement without a
    * full parse. Returns (remaining main query, cte bodies).
    * (ref: sql_validation.go:277-360) */
  def splitWithStatement(sql: String): Either[String, (String, Seq[String])] = {
    val upper = sql.toUpperCase
    if (!upper.startsWith("WITH")) return Left("not a WITH statement")
    var pos = "WITH".length
    val restUpper = upper.substring(pos).trim
    if (restUpper.startsWith("RECURSIVE"))
      pos += upper.substring(pos).indexOf("RECURSIVE") + "RECURSIVE".length

    val ctes = Seq.newBuilder[String]
    while (true) {
      while (pos < sql.length && isSpaceChar(sql.charAt(pos))) pos += 1
      if (pos >= sql.length) return Left("unexpected end of WITH statement")

      skipIdentifier(sql, pos) match {
        case Left(e) => return Left(e)
        case Right(p) => pos = p
      }
      while (pos < sql.length && isSpaceChar(sql.charAt(pos))) pos += 1
      if (pos < sql.length && sql.charAt(pos) == '(') {
        findClosingParen(sql, pos) match {
          case Left(e) => return Left(e)
          case Right(end) => pos = end + 1
        }
      }
      while (pos < sql.length && isSpaceChar(sql.charAt(pos))) pos += 1
      if (pos >= sql.length || !sql.substring(pos).toUpperCase.startsWith("AS"))
        return Left("missing AS in WITH clause")
      pos += 2
      while (pos < sql.length && isSpaceChar(sql.charAt(pos))) pos += 1
      if (pos >= sql.length || sql.charAt(pos) != '(')
        return Left("missing ( after AS in WITH clause")
      findClosingParen(sql, pos) match {
        case Left(e) => return Left(e)
        case Right(end) =>
          ctes += sql.substring(pos + 1, end)
          pos = end + 1
      }
      while (pos < sql.length && isSpaceChar(sql.charAt(pos))) pos += 1
      if (pos >= sql.length) return Left("unexpected end after CTE")
      if (sql.charAt(pos) == ',') pos += 1
      else return Right((sql.substring(pos), ctes.result()))
    }
    Left("unreachable")
  }

  def splitParenthesized(sql0: String): Either[String, (String, String)] = {
    val sql = sql0.trim
    if (!sql.startsWith("(")) return Left("not a parenthesized statement")
    findClosingParen(sql, 0).map(end => (sql.substring(1, end), sql.substring(end + 1)))
  }
}
