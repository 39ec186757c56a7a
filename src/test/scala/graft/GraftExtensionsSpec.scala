package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: engine functions must resolve
  * on a session built with GraftExtensions and no imperative setup. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("engine functions available via withExtensions (spark.sql.extensions)") {
    val old = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val c = s.sql("SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
        .head.getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      // a shaper type function injected by the extension, reached
      // through the dialect's ::TYPE rewrite
      val tagged = s.sql(graft.sqlfront.Dialect.rewrite(
        "SELECT 'alpha'::DROPDOWN AS d"))
      val field = tagged.schema.head
      assert(field.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
      assert(tagged.count() == 1)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach(SparkSession.setDefaultSession)
    }
  }
}
