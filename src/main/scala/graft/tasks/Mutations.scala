package graft.tasks

import graft.sqlfront.Dialect
import graft.sqlfront.Dialect.{Tok, TWord, TWs, TLParen, TRParen, TLBracket, TRBracket, TOther, TQuoted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** UPDATE / DELETE for task tables over the parquet warehouse —
  * rewrite-on-write (round-2 review item #4). The reference's task gate
  * default-allows DML (ref: server/core/sql_validation.go:274) and
  * DuckDB executes it in place; Spark parquet tables are immutable, so
  * a mutation becomes: plan the post-image as a SELECT, write it to a
  * sibling directory, swap directories, refresh the catalog entry.
  *
  * Scale notes:
  *  - the post-image SELECT is a full Catalyst plan (pushdown, codegen,
  *    partition parallelism) — the write is the same distributed job an
  *    INSERT OVERWRITE runs; nothing is driver-side;
  *  - the swap is two filesystem metadata ops, not a second copy;
  *  - the affected-row Count (DuckDB's UPDATE/DELETE result shape) costs
  *    one extra aggregation over the match predicate — kept because the
  *    reference surfaces it in task results and stop-on-false reads it.
  *  - copy-on-write rewrites the whole table per statement — the right
  *    unit for task-sized reference tables. The 100 TB path would layer
  *    file-level pruning (rewrite only files whose min/max overlap the
  *    predicate), which this directory-swap design accommodates.
  */
object Mutations {

  final case class Update(table: String, assignments: Seq[(String, String)],
      where: Option[String])
  final case class Delete(table: String, where: Option[String])

  def isUpdate(sql: String): Boolean = sql.trim.toUpperCase.startsWith("UPDATE")
  def isDelete(sql: String): Boolean = sql.trim.toUpperCase.startsWith("DELETE")
  def isMutation(sql: String): Boolean = isUpdate(sql) || isDelete(sql)

  private def isWord(t: Tok, w: String): Boolean =
    t.kind == TWord && t.text.equalsIgnoreCase(w)

  private def topLevelIndexOf(toks: Vector[Tok], from: Int, word: String): Int = {
    var depth = 0
    var i = from
    while (i < toks.length) {
      toks(i).kind match {
        case TLParen | TLBracket => depth += 1
        case TRParen | TRBracket => depth -= 1
        case TWord if depth == 0 && toks(i).text.equalsIgnoreCase(word) => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTopLevelCommas(toks: Vector[Tok]): Vector[Vector[Tok]] = {
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
    acc.result()
  }

  /** `UPDATE t SET c1 = e1, c2 = e2 [WHERE cond]` (no FROM-join form —
    * the reference's own tasks don't use it; it errors loudly). */
  def parseUpdate(sql: String): Either[String, Update] = {
    val toks = Dialect.tokenize(sql.trim.stripSuffix(";"))
    val u = Dialect.nextNonWs(toks, 0)
    if (u >= toks.length || !isWord(toks(u), "UPDATE")) return Left("not an UPDATE")
    val tIdx = Dialect.nextNonWs(toks, u + 1)
    if (tIdx >= toks.length) return Left("UPDATE: missing table name")
    val table = tableName(toks, tIdx)
    val setIdx = topLevelIndexOf(toks, tIdx + 1, "SET")
    if (setIdx < 0) return Left("UPDATE: missing SET")
    if (topLevelIndexOf(toks, setIdx + 1, "FROM") >= 0)
      return Left("UPDATE ... FROM is not supported in tasks")
    val whereIdx = topLevelIndexOf(toks, setIdx + 1, "WHERE")
    val setEnd = if (whereIdx >= 0) whereIdx else toks.length
    val assigns = splitTopLevelCommas(toks.slice(setIdx + 1, setEnd)).map { part =>
      val eq = part.indexWhere(t => t.kind == TOther && t.text == "=")
      if (eq <= 0) return Left("UPDATE: malformed assignment: " + Dialect.render(part).trim)
      val colToks = part.take(eq).filterNot(_.kind == TWs)
      if (colToks.length != 1) return Left(
        "UPDATE: assignment target must be a single column: " + Dialect.render(part).trim)
      val col = colToks.head.text.stripPrefix("\"").stripSuffix("\"")
      (col, Dialect.render(part.drop(eq + 1)).trim)
    }
    val where = if (whereIdx >= 0)
      Some(Dialect.render(toks.drop(whereIdx + 1)).trim) else None
    Right(Update(table, assigns, where))
  }

  /** `DELETE FROM t [WHERE cond]`. */
  def parseDelete(sql: String): Either[String, Delete] = {
    val toks = Dialect.tokenize(sql.trim.stripSuffix(";"))
    val d0 = Dialect.nextNonWs(toks, 0)
    if (d0 >= toks.length || !isWord(toks(d0), "DELETE")) return Left("not a DELETE")
    val f = Dialect.nextNonWs(toks, d0 + 1)
    if (f >= toks.length || !isWord(toks(f), "FROM")) return Left("DELETE: missing FROM")
    val tIdx = Dialect.nextNonWs(toks, f + 1)
    if (tIdx >= toks.length) return Left("DELETE: missing table name")
    val table = tableName(toks, tIdx)
    val whereIdx = topLevelIndexOf(toks, tIdx + 1, "WHERE")
    val where = if (whereIdx >= 0)
      Some(Dialect.render(toks.drop(whereIdx + 1)).trim) else None
    Right(Delete(table, where))
  }

  /** Dotted, possibly quoted table name starting at `i`. */
  private def tableName(toks: Vector[Tok], i: Int): String = {
    val sb = new StringBuilder
    var j = i
    var expectPart = true
    var done = false
    while (j < toks.length && !done) {
      val t = toks(j)
      if (expectPart && (t.kind == TWord || t.kind == TQuoted)) {
        sb.append(t.text.stripPrefix("\"").stripSuffix("\""))
        expectPart = false
        j += 1
      } else if (!expectPart && t.kind == Dialect.TDot) {
        sb.append('.'); expectPart = true; j += 1
      } else done = true
    }
    sb.toString
  }

  /** Execute a mutation; returns the affected-row count (DuckDB's
    * UPDATE/DELETE result is a single Count value, which the reference
    * records in task results). */
  def execute(spark: SparkSession, sql: String): Long =
    if (isUpdate(sql)) parseUpdate(sql) match {
      case Left(e) => throw new IllegalArgumentException(e)
      case Right(up) => executeUpdate(spark, up)
    } else parseDelete(sql) match {
      case Left(e) => throw new IllegalArgumentException(e)
      case Right(del) => executeDelete(spark, del)
    }

  private def executeUpdate(spark: SparkSession, up: Update): Long = {
    val schema = spark.table(up.table).schema
    up.assignments.foreach { case (c, _) =>
      if (!schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        throw new IllegalArgumentException(
          s"UPDATE ${up.table}: unknown column '$c'")
    }
    val assigned = up.assignments.map { case (c, e) => c.toLowerCase -> e }.toMap
    val pred = up.where.map(w => s"coalesce(($w), false)")
    val proj = schema.fields.map { f =>
      assigned.get(f.name.toLowerCase) match {
        case Some(e) =>
          val value = pred match {
            case Some(p) => s"CASE WHEN $p THEN ($e) ELSE `${f.name}` END"
            case None => s"($e)"
          }
          // cast back to the original column type, like DuckDB's UPDATE
          s"CAST($value AS ${f.dataType.sql}) AS `${f.name}`"
        case None => s"`${f.name}`"
      }
    }
    val affected = pred match {
      case Some(p) => spark.sql(
        Dialect.rewrite(s"SELECT count(*) FROM ${up.table} WHERE $p")).head().getLong(0)
      case None => spark.table(up.table).count()
    }
    val post = spark.sql(Dialect.rewrite(
      s"SELECT ${proj.mkString(", ")} FROM ${up.table}"))
    swapInPlace(spark, up.table, post)
    affected
  }

  private def executeDelete(spark: SparkSession, del: Delete): Long = {
    del.where match {
      case None =>
        val n = spark.table(del.table).count()
        swapInPlace(spark, del.table, spark.table(del.table).limit(0))
        n
      case Some(w) =>
        val pred = s"coalesce(($w), false)"
        val affected = spark.sql(Dialect.rewrite(
          s"SELECT count(*) FROM ${del.table} WHERE $pred")).head().getLong(0)
        val post = spark.sql(Dialect.rewrite(
          s"SELECT * FROM ${del.table} WHERE NOT $pred"))
        swapInPlace(spark, del.table, post)
        affected
    }
  }

  /** Write the post-image next to the table's directory, then swap —
    * two metadata ops, no second data copy, never reading and
    * overwriting the same files in one job. */
  private def swapInPlace(spark: SparkSession, table: String, post: DataFrame): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (!catalog.tableExists(ident) || catalog.isTempView(ident.nameParts))
      throw new IllegalArgumentException(
        s"UPDATE/DELETE requires a managed table, not a view: $table")
    val meta = catalog.getTableMetadata(ident)
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      loc.getParent, loc.getName + ".cow-" + System.nanoTime())
    post.write.format("parquet").save(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(
      loc.getParent, loc.getName + ".old-" + System.nanoTime())
    if (!fs.rename(loc, old))
      throw new IllegalStateException(s"table swap failed: cannot move $loc aside")
    if (!fs.rename(tmp, loc)) {
      fs.rename(old, loc) // roll back
      throw new IllegalStateException(s"table swap failed: cannot move $tmp into place")
    }
    fs.delete(old, true)
    spark.catalog.refreshTable(table)
    // a rewritten location invalidates any file-schema cache entry
    graft.Tables.invalidate(loc.toString)
  }
}
