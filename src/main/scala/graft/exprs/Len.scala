package graft.exprs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Length, RuntimeReplaceable, Size, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, MapType}

/** DuckDB's polymorphic `len(x)`: element count for lists/maps, character
  * count for strings — one name, type-dispatched at analysis. Spark
  * splits this across size() and length(), so dashboards written for the
  * reference fail on whichever half they use. RuntimeReplaceable: the
  * analyzer swaps in the native Size/Length expression, so execution is
  * exactly the built-in codegen'd operator — this node never runs.
  */
case class Len(child: Expression) extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child)
    case _ => Length(child)
  }

  override def prettyName: String = "len"

  override protected def withNewChildInternal(newChild: Expression): Len =
    copy(child = newChild)
}

object Len {
  // once per session: re-registering on every dashboard/bench call spams
  // "function len replaced a previously registered function" WARNs.
  // WeakHashMap so discarded sessions don't pin registry state.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  // newSession()/cloned sessions INHERIT the parent's registry entry, so
  // their own (needed) registration still logs "replaced a previously
  // registered function" — a deliberate override, not drift. Quiet the
  // registry logger only around OUR registration (RegistryQuiet), so
  // unrelated createOrReplaceTempFunction warnings in the JVM stay live.
  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null)
      RegistryQuiet.quietly {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "len", exprs => Len(exprs.head), "scala_udf")
      }
}
