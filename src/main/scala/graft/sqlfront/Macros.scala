package graft.sqlfront

import Dialect.{Tok, TokKind, TWord, TWs, TDot, TLParen, TRParen, TLBracket, TRBracket, TOther, TString, TQuoted}
import scala.collection.mutable

/** DuckDB `CREATE [OR REPLACE] TEMP MACRO/FUNCTION` execution by text
  * expansion. The reference admits these statements through its SQL gate
  * (ref: server/core/sql_validation.go:28-41) and DuckDB executes them;
  * on Spark we keep a per-render macro registry and expand call sites
  * textually before `spark.sql` — the same observable semantics for the
  * dashboard/task surface, where a macro is always defined and used
  * within one render.
  *
  * Supported, matching DuckDB's macro model:
  *  - scalar macros: `CREATE TEMP MACRO f(a, b := 2) AS a + b` — calls
  *    `f(x)` / `f(x, b := 3)` expand to `((x) + (2|3))`;
  *  - table macros: `CREATE TEMP MACRO m(k) AS TABLE SELECT ... ` —
  *    calls in FROM position expand to a parenthesized subquery;
  *  - `:=` default parameters (named-only at call sites, as in DuckDB);
  *  - `OR REPLACE` / `IF NOT EXISTS` admission, duplicate-name errors
  *    otherwise (DuckDB: "already exists");
  *  - macros calling macros (expansion iterates; depth-capped).
  *
  * Expansion is distributed-safe by construction: the expanded text is
  * planned by Catalyst exactly as if the user had inlined the
  * expression, so pushdown/pruning/codegen all apply — there is no UDF
  * or driver-side evaluation anywhere in this path.
  */
object Macros {

  final case class MacroParam(name: String, default: Option[String])
  final case class MacroDef(name: String, params: Seq[MacroParam], body: String,
      isTable: Boolean)
  final case class ParsedCreate(dfn: MacroDef, orReplace: Boolean, ifNotExists: Boolean)

  final class MacroStore {
    private val defs = mutable.LinkedHashMap.empty[String, MacroDef]
    def get(name: String): Option[MacroDef] = defs.get(name.toLowerCase)
    def isEmpty: Boolean = defs.isEmpty
    def names: Seq[String] = defs.keys.toSeq

    /** DuckDB admission semantics: OR REPLACE overwrites, IF NOT EXISTS
      * no-ops on duplicates, plain CREATE errors on duplicates. */
    def define(p: ParsedCreate): Unit = {
      val key = p.dfn.name.toLowerCase
      if (defs.contains(key) && !p.orReplace) {
        if (p.ifNotExists) ()
        else throw new IllegalArgumentException(
          s"Macro with name '${p.dfn.name}' already exists")
      } else defs(key) = p.dfn
    }
  }

  private def isWord(t: Tok, w: String): Boolean =
    t.kind == TWord && t.text.equalsIgnoreCase(w)

  /** Quick check without a full parse (the gate has already admitted the
    * statement; this only routes it to the macro handler). */
  def isCreateMacro(sql: String): Boolean = {
    val u = sql.trim.toUpperCase
    u.startsWith("CREATE") && (u.contains("MACRO") || u.contains("FUNCTION")) &&
      parseCreate(sql).isDefined
  }

  /** Parse `CREATE [OR REPLACE] TEMP|TEMPORARY MACRO|FUNCTION
    * [IF NOT EXISTS] name(params) AS [TABLE] body`. */
  def parseCreate(sql: String): Option[ParsedCreate] = {
    val toks = Dialect.tokenize(sql.trim)
    var i = Dialect.nextNonWs(toks, 0)
    def cur: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def advance(): Unit = { i = Dialect.nextNonWs(toks, i + 1) }

    if (!cur.exists(isWord(_, "CREATE"))) return None
    advance()
    var orReplace = false
    if (cur.exists(isWord(_, "OR"))) {
      advance()
      if (!cur.exists(isWord(_, "REPLACE"))) return None
      orReplace = true
      advance()
    }
    if (!cur.exists(t => isWord(t, "TEMP") || isWord(t, "TEMPORARY"))) return None
    advance()
    if (!cur.exists(t => isWord(t, "MACRO") || isWord(t, "FUNCTION"))) return None
    advance()
    var ifNotExists = false
    if (cur.exists(isWord(_, "IF"))) {
      advance()
      if (!cur.exists(isWord(_, "NOT"))) return None
      advance()
      if (!cur.exists(isWord(_, "EXISTS"))) return None
      ifNotExists = true
      advance()
    }
    val name = cur match {
      case Some(t) if t.kind == TWord => t.text
      case Some(t) if t.kind == TQuoted => t.text.stripPrefix("\"").stripSuffix("\"")
      case _ => return None
    }
    advance()
    if (!cur.exists(_.kind == TLParen)) return None
    val close = Dialect.matchParen(toks, i)
    if (close < 0) return None
    val params = splitTopLevel(toks.slice(i + 1, close)).filter(_.nonEmpty).map(parseParam)
    if (params.exists(_.isEmpty)) return None
    i = Dialect.nextNonWs(toks, close + 1)
    if (!cur.exists(isWord(_, "AS"))) return None
    advance()
    val isTable = cur.exists(isWord(_, "TABLE"))
    if (isTable) advance()
    if (i >= toks.length) return None
    val body = Dialect.render(toks.drop(i)).trim.stripSuffix(";").trim
    if (body.isEmpty) return None
    Some(ParsedCreate(MacroDef(name, params.flatten, body, isTable), orReplace, ifNotExists))
  }

  /** Split a token run on top-level commas. */
  private def splitTopLevel(toks: Vector[Tok]): Vector[Vector[Tok]] = {
    val acc = Vector.newBuilder[Vector[Tok]]
    var cur = Vector.newBuilder[Tok]
    var depth = 0
    toks.foreach { t =>
      t.kind match {
        case TLParen | TLBracket => depth += 1; cur += t
        case TRParen | TRBracket => depth -= 1; cur += t
        case TOther if t.text == "," && depth == 0 =>
          acc += cur.result(); cur = Vector.newBuilder[Tok]
        case _ => cur += t
      }
    }
    acc += cur.result()
    acc.result().map(_.dropWhile(_.kind == TWs).reverse.dropWhile(_.kind == TWs).reverse)
  }

  /** `name` or `name := default`. (`:=` tokenizes as `:` `=`.) */
  private def parseParam(toks: Vector[Tok]): Option[MacroParam] = {
    if (toks.isEmpty || toks.head.kind != TWord) return None
    val name = toks.head.text
    val rest = toks.drop(1).dropWhile(_.kind == TWs)
    if (rest.isEmpty) Some(MacroParam(name, None))
    else if (rest.length >= 3 && rest(0).kind == TOther && rest(0).text == ":" &&
        rest(1).kind == TOther && rest(1).text == "=")
      Some(MacroParam(name, Some(Dialect.render(rest.drop(2)).trim)))
    else None
  }

  private val MaxDepth = 16

  /** Expand all macro call sites in a statement. One pass expands every
    * call site left-to-right WITHOUT re-scanning the substituted text,
    * so the depth cap counts nesting LEVELS (macro bodies calling
    * macros), never sibling calls — a statement applying one macro to
    * hundreds of columns is one pass. Throws on arity/unknown-parameter
    * errors — loud, like DuckDB's binder. */
  def expand(sql: String, store: MacroStore): String = {
    if (store.isEmpty) return sql
    var s = sql
    var depth = 0
    var changed = true
    while (changed) {
      if (depth > MaxDepth)
        throw new IllegalArgumentException("macro expansion depth exceeded (recursive macro?)")
      val next = expandOnce(s, store)
      changed = next != s
      s = next
      depth += 1
    }
    s
  }

  /** One level: expand each call site, continuing AFTER the expansion
    * (nested calls inside substituted bodies wait for the next level). */
  private def expandOnce(sql: String, store: MacroStore): String = {
    val toks = Dialect.tokenize(sql)
    val sb = new StringBuilder
    var i = 0
    var changedAny = false
    while (i < toks.length) {
      val t = toks(i)
      var consumed = false
      if (t.kind == TWord) {
        store.get(t.text) match {
          case Some(dfn) =>
            val p = Dialect.prevNonWs(toks, i - 1)
            val qualified = p >= 0 && toks(p).kind == TDot
            val lp = Dialect.nextNonWs(toks, i + 1)
            if (!qualified && lp < toks.length && toks(lp).kind == TLParen) {
              val close = Dialect.matchParen(toks, lp)
              if (close > lp) {
                val args = splitTopLevel(toks.slice(lp + 1, close)).filter(_.nonEmpty)
                val bound = bindArgs(dfn, args)
                sb.append("(").append(substituteParams(dfn.body, bound)).append(")")
                i = close + 1
                consumed = true
                changedAny = true
              }
            }
          case None => ()
        }
      }
      if (!consumed) { sb.append(t.text); i += 1 }
    }
    if (changedAny) sb.toString else sql
  }

  /** Positional args fill parameters in order; `name := value` args bind
    * by name; defaults fill the rest. Like DuckDB's binder, positional
    * arguments after a named argument and double-bound parameters are
    * errors, never silent drops. */
  private def bindArgs(dfn: MacroDef, args: Vector[Vector[Tok]]): Map[String, String] = {
    val bound = mutable.LinkedHashMap.empty[String, String]
    val positional = Vector.newBuilder[String]
    var seenNamed = false
    args.foreach { arg =>
      val named = arg.length >= 3 && arg.head.kind == TWord && {
        val r = arg.drop(1).dropWhile(_.kind == TWs)
        r.length >= 2 && r(0).kind == TOther && r(0).text == ":" &&
          r(1).kind == TOther && r(1).text == "="
      }
      if (named) {
        seenNamed = true
        val name = arg.head.text
        val value = Dialect.render(
          arg.drop(1).dropWhile(_.kind == TWs).drop(2)).trim
        val param = dfn.params.find(_.name.equalsIgnoreCase(name)).getOrElse(
          throw new IllegalArgumentException(
            s"macro ${dfn.name}: unknown parameter '$name'"))
        if (bound.contains(param.name))
          throw new IllegalArgumentException(
            s"macro ${dfn.name}: parameter '${param.name}' bound twice")
        bound(param.name) = value
      } else {
        if (seenNamed)
          throw new IllegalArgumentException(
            s"macro ${dfn.name}: positional argument after named argument")
        positional += Dialect.render(arg).trim
      }
    }
    val pos = positional.result()
    // DuckDB binds positionals to the REQUIRED (non-defaulted) params
    // only — f(a, b := 2) called as f(1, 5) is a binder error there,
    // not a silent bind of 5 to b (verified against DuckDB 1.0)
    val required = dfn.params.filter(_.default.isEmpty)
    if (pos.length > required.length)
      throw new IllegalArgumentException(
        s"macro ${dfn.name} requires ${required.length} positional argument(s), " +
          s"but ${pos.length} were provided")
    pos.zipWithIndex.foreach { case (v, idx) =>
      val param = required(idx)
      if (bound.contains(param.name))
        throw new IllegalArgumentException(
          s"macro ${dfn.name}: parameter '${param.name}' bound twice")
      bound(param.name) = v
    }
    dfn.params.foreach { param =>
      if (!bound.contains(param.name)) {
        param.default match {
          case Some(d) => bound(param.name) = d
          case None => throw new IllegalArgumentException(
            s"macro ${dfn.name}: missing argument for parameter '${param.name}'")
        }
      }
    }
    bound.toMap
  }

  /** Replace whole-word parameter references in the body with the
    * parenthesized argument text. Quote-aware (parameters inside string
    * literals don't match) and dotted-name-aware (`t.x` never binds
    * parameter `x` — it's a column of `t`). */
  private def substituteParams(body: String, bound: Map[String, String]): String = {
    if (bound.isEmpty) return body
    val lower = bound.map { case (k, v) => k.toLowerCase -> v }
    val toks = Dialect.tokenize(body)
    val sb = new StringBuilder
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val replacement =
        if (t.kind == TWord && lower.contains(t.text.toLowerCase)) {
          val p = Dialect.prevNonWs(toks, i - 1)
          if (p >= 0 && toks(p).kind == TDot) None
          else Some("(" + lower(t.text.toLowerCase) + ")")
        } else None
      sb.append(replacement.getOrElse(t.text))
      i += 1
    }
    sb.toString
  }
}
