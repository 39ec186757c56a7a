package graft

import graft.interp.Dashboard
import graft.sqlfront.Macros
import graft.tasks.Tasks
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CREATE TEMP MACRO/FUNCTION execution by text expansion — the
  * reference admits these through its gate (sql_validation.go:28-41)
  * and DuckDB executes them; round-2 review flagged the silent no-op. */
class MacrosSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- parser ---------------------------------------------------------

  test("parseCreate: plain scalar macro") {
    val p = Macros.parseCreate("CREATE TEMP MACRO add1(x) AS x + 1").get
    assert(p.dfn.name == "add1")
    assert(p.dfn.params == Seq(Macros.MacroParam("x", None)))
    assert(p.dfn.body == "x + 1")
    assert(!p.dfn.isTable && !p.orReplace && !p.ifNotExists)
  }

  test("parseCreate: OR REPLACE + FUNCTION synonym + named default") {
    val p = Macros.parseCreate(
      "CREATE OR REPLACE TEMPORARY FUNCTION f(a, b := 2 + 3) AS a * b;").get
    assert(p.orReplace)
    assert(p.dfn.params == Seq(
      Macros.MacroParam("a", None), Macros.MacroParam("b", Some("2 + 3"))))
    assert(p.dfn.body == "a * b")
  }

  test("parseCreate: IF NOT EXISTS and table macro") {
    val p = Macros.parseCreate(
      "CREATE TEMP MACRO IF NOT EXISTS m(k) AS TABLE SELECT k AS v").get
    assert(p.ifNotExists && p.dfn.isTable)
    assert(p.dfn.body == "SELECT k AS v")
  }

  test("parseCreate rejects non-macro CREATEs") {
    assert(Macros.parseCreate("CREATE TEMP TABLE t AS SELECT 1").isEmpty)
    assert(Macros.parseCreate("CREATE TABLE t(x INT)").isEmpty)
    assert(!Macros.isCreateMacro("CREATE TEMP VIEW v AS SELECT 1"))
  }

  // ---- store admission (DuckDB semantics) -----------------------------

  test("duplicate without OR REPLACE errors; IF NOT EXISTS no-ops; OR REPLACE wins") {
    val s = new Macros.MacroStore
    s.define(Macros.parseCreate("CREATE TEMP MACRO f(x) AS x + 1").get)
    val e = intercept[IllegalArgumentException] {
      s.define(Macros.parseCreate("CREATE TEMP MACRO f(x) AS x + 2").get)
    }
    assert(e.getMessage.contains("already exists"))
    s.define(Macros.parseCreate("CREATE TEMP MACRO IF NOT EXISTS f(x) AS x + 3").get)
    assert(s.get("f").get.body == "x + 1")
    s.define(Macros.parseCreate("CREATE OR REPLACE TEMP MACRO f(x) AS x + 4").get)
    assert(s.get("F").get.body == "x + 4")
  }

  // ---- expansion ------------------------------------------------------

  private def storeOf(defs: String*): Macros.MacroStore = {
    val s = new Macros.MacroStore
    defs.foreach(d => s.define(Macros.parseCreate(d).get))
    s
  }

  test("expansion substitutes parenthesized args, whole-word, quote-aware") {
    val s = storeOf("CREATE TEMP MACRO twice(x) AS x + x")
    assert(Macros.expand("SELECT twice(1 + 2)", s) == "SELECT ((1 + 2) + (1 + 2))")
    // no substitution inside string literals or for prefixed words
    val s2 = storeOf("CREATE TEMP MACRO f(val) AS 'val' || value_col || t.val || val")
    assert(Macros.expand("SELECT f(9)", s2) ==
      "SELECT ('val' || value_col || t.val || (9))")
  }

  test("named := args and defaults bind like DuckDB") {
    val s = storeOf("CREATE TEMP MACRO g(a, b := 10) AS a * b")
    assert(Macros.expand("SELECT g(2)", s) == "SELECT ((2) * (10))")
    assert(Macros.expand("SELECT g(2, b := 5)", s) == "SELECT ((2) * (5))")
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT g()", s)
    }.getMessage.contains("missing argument"))
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT g(1, c := 2)", s)
    }.getMessage.contains("unknown parameter"))
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT g(1, 2, 3)", s)
    }.getMessage.contains("positional argument"))
    // defaulted params are named-only at call sites (DuckDB binder:
    // "requires a single positional argument, but 2 were provided")
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT g(1, 5)", s)
    }.getMessage.contains("requires 1 positional argument"))
  }

  test("many sibling call sites expand in one level — never hit the recursion cap (review r3)") {
    val s = storeOf("CREATE TEMP MACRO clamp(x) AS least(greatest(x, 0), 1)")
    val calls = (1 to 40).map(i => s"clamp(c$i)").mkString(", ")
    val out = Macros.expand(s"SELECT $calls FROM t", s)
    assert(out.contains("least(greatest((c40), 0), 1)"))
    assert(!out.contains("clamp("))
  }

  test("positional after named and double binding error like DuckDB's binder (review r3)") {
    val s = storeOf("CREATE TEMP MACRO f(a, b := 2) AS a + b")
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT f(a := 1, 5)", s)
    }.getMessage.contains("positional argument after named"))
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT f(5, a := 1)", s)
    }.getMessage.contains("bound twice"))
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT f(a := 1, a := 2)", s)
    }.getMessage.contains("bound twice"))
  }

  test("macros calling macros expand; direct recursion is depth-capped") {
    val s = storeOf(
      "CREATE TEMP MACRO inc(x) AS x + 1",
      "CREATE TEMP MACRO inc2(x) AS inc(inc(x))")
    assert(Macros.expand("SELECT inc2(0)", s) == "SELECT ((((((0)) + 1)) + 1))")
    val rec = storeOf("CREATE TEMP MACRO r(x) AS r(x)")
    assert(intercept[IllegalArgumentException] {
      Macros.expand("SELECT r(1)", rec)
    }.getMessage.contains("depth"))
  }

  test("a word matching a macro name but not called is left alone") {
    val s = storeOf("CREATE TEMP MACRO price(x) AS x * 2")
    assert(Macros.expand("SELECT price FROM t", s) == "SELECT price FROM t")
    assert(Macros.expand("SELECT cat.price(3)", s) == "SELECT cat.price(3)")
  }

  // ---- end-to-end through the dashboard interpreter -------------------

  test("dashboard defines and calls a scalar macro (round-2 silent no-op fixed)") {
    val r = Dashboard.run(spark,
      """CREATE TEMP MACRO margin(rev, cost := 0) AS (rev - cost) / rev;
        |SELECT round(margin(200.0, cost := 50.0), 2) AS m;""".stripMargin)
    assert(r.sections.head.queries.head.rows.head.head == 0.75)
  }

  test("dashboard table macro works in FROM position") {
    val r = Dashboard.run(spark,
      """CREATE TEMP MACRO nums(n) AS TABLE SELECT * FROM range(n);
        |SELECT count(*) AS c FROM nums(5) AS t;""".stripMargin)
    assert(r.sections.head.queries.head.rows.head.head == 5)
    // and without an alias (Spark 4 supports unaliased derived tables)
    val r2 = Dashboard.run(spark,
      """CREATE TEMP MACRO nums(n) AS TABLE SELECT * FROM range(n);
        |SELECT count(*) AS c FROM nums(7);""".stripMargin)
    assert(r2.sections.head.queries.head.rows.head.head == 7)
  }

  test("VALUES-with-PIVOT dashboard executes (the __v alias lands before the clause)") {
    val r = Dashboard.run(spark,
      "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'a')) PIVOT (count(*) AS n FOR col1 IN ('a', 'b'));")
    val q = r.sections.head.queries.head
    assert(q.rows.length == 3) // one row per col0 value
  }

  test("macro applies inside SET VARIABLE and CREATE TEMP VIEW bodies") {
    val r = Dashboard.run(spark,
      """CREATE TEMP MACRO double_it(x) AS x * 2;
        |SET VARIABLE v = double_it(21);
        |CREATE TEMP VIEW mv AS SELECT double_it(getvariable('v')) AS d;
        |SELECT d FROM mv;""".stripMargin)
    assert(r.sections.head.queries.head.rows.head.head == 84)
  }

  test("task executor registers and uses macros, empty result recorded") {
    val res = Tasks.executeTask(spark,
      """CREATE TEMP MACRO sq(x) AS x * x;
        |SELECT sq(7) AS v;""".stripMargin)
    assert(res.success)
    assert(res.queries.length == 2)
    assert(res.queries(0).resultRows.isEmpty)
    assert(res.queries(1).resultRows == Seq(Seq(49)))
  }
}
