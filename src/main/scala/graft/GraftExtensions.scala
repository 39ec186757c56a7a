package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions injector: enables the engine's SQL surface on any
  * SparkSession via the standard mechanism —
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), no imperative
  * registration calls needed. Injects the 48 shaper custom-type
  * functions (the `::TYPE` targets produced by
  * graft.sqlfront.Dialect) and the codegen'd `cosine_sim`.
  *
  * The BOXPLOT aggregate is Aggregator-based (needs a live session for
  * its encoders), so it stays on `graft.exprs.Boxplot.register` —
  * the interpreter calls it per render session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.types.ShaperTypes.all.foreach { td =>
      ext.injectFunction((
        FunctionIdentifier(td.name),
        new ExpressionInfo(classOf[graft.types.ShaperTagged].getName, td.name),
        (exprs: Seq[Expression]) => graft.types.ShaperTagged(td.name, exprs.head)))
    }
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.exprs.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => graft.exprs.CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("len"),
      new ExpressionInfo(classOf[graft.exprs.Len].getName, "len"),
      (exprs: Seq[Expression]) => graft.exprs.Len(exprs.head)))
  }
}
