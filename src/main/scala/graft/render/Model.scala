package graft.render

import scala.collection.mutable.ArrayBuffer

/** Result model mirroring the reference's GetResult JSON contract
  * (ref: server/core/dashboard.go:27-101). The engine contract ends at
  * rows+tags; category→series pivoting is client-side in the reference.
  */
object Model {

  final case class MarkLine(value: Any, label: String, isYaxis: Boolean)

  final case class GaugeCategory(from: Double, to: Double, label: String, color: String)

  final case class RenderSpec(
      renderType: String,
      label: Option[String],
      gaugeCategories: Seq[GaugeCategory] = Nil,
      markLines: Seq[MarkLine] = Nil)

  final case class ColumnSpec(name: String, colType: String, nullable: Boolean, tag: String)

  final case class QueryOut(render: RenderSpec, columns: Seq[ColumnSpec], rows: Seq[Seq[Any]])

  final class Section(val sectionType: String) {
    var title: Option[String] = None
    val queries: ArrayBuffer[QueryOut] = ArrayBuffer.empty
  }

  final case class GetResult(
      name: String,
      sections: Seq[Section],
      minTimeValue: Long,
      maxTimeValue: Long,
      reloadAt: Long,
      headerImage: Option[String],
      footerLink: Option[String],
      unsetVariables: Seq[String],
      /** Set by the serving layer from dashboard metadata
        * (ref: GetResult.Visibility, core/dashboard.go:27-37). */
      visibility: Option[String] = None)

  // ---- JSON ----------------------------------------------------------

  private def esc(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def jsonValue(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => jsonValue(x)
    case s: String => esc(s)
    case b: Boolean => b.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null"
      else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case f: Float => jsonValue(f.toDouble)
    case n: Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => esc(String.valueOf(k)) + ":" + jsonValue(x) }
        .mkString("{", ",", "}")
    case xs: scala.collection.Iterable[_] =>
      xs.map(jsonValue).mkString("[", ",", "]")
    case other => esc(String.valueOf(other))
  }

  def toJson(r: GetResult): String = {
    val sb = new StringBuilder("{")
    sb.append("\"name\":").append(esc(r.name))
    r.visibility.foreach(v => sb.append(",\"visibility\":").append(esc(v)))
    sb.append(",\"sections\":[")
    sb.append(r.sections.map { s =>
      val q = s.queries.map { qo =>
        val render = {
          val rb = new StringBuilder("{")
          rb.append("\"type\":").append(esc(qo.render.renderType))
          qo.render.label.foreach(l => rb.append(",\"label\":").append(esc(l)))
          if (qo.render.gaugeCategories.nonEmpty)
            rb.append(",\"gaugeCategories\":").append(qo.render.gaugeCategories.map(g =>
              s"""{"from":${jsonValue(g.from)},"to":${jsonValue(g.to)},"label":${esc(g.label)},"color":${esc(g.color)}}""").mkString("[", ",", "]"))
          if (qo.render.markLines.nonEmpty)
            rb.append(",\"markLines\":").append(qo.render.markLines.map(m =>
              s"""{"value":${jsonValue(m.value)},"label":${esc(m.label)},"isYaxis":${m.isYaxis}}""").mkString("[", ",", "]"))
          rb.append("}").toString
        }
        val cols = qo.columns.map(c =>
          s"""{"name":${esc(c.name)},"type":${esc(c.colType)},"nullable":${c.nullable},"tag":${esc(c.tag)}}""").mkString("[", ",", "]")
        val rows = qo.rows.map(row => row.map(jsonValue).mkString("[", ",", "]")).mkString("[", ",", "]")
        s"""{"render":$render,"columns":$cols,"rows":$rows}"""
      }.mkString("[", ",", "]")
      val title = s.title.map(esc).getOrElse("null")
      s"""{"type":${esc(s.sectionType)},"title":$title,"queries":$q}"""
    }.mkString(","))
    sb.append("]")
    sb.append(",\"minTimeValue\":").append(r.minTimeValue)
    sb.append(",\"maxTimeValue\":").append(r.maxTimeValue)
    if (r.reloadAt != 0) sb.append(",\"reloadAt\":").append(r.reloadAt)
    r.headerImage.foreach(h => sb.append(",\"headerImage\":").append(esc(h)))
    r.footerLink.foreach(f => sb.append(",\"footerLink\":").append(esc(f)))
    if (r.unsetVariables.nonEmpty)
      sb.append(",\"unsetVariables\":").append(r.unsetVariables.map(esc).mkString("[", ",", "]"))
    sb.append("}").toString
  }
}
