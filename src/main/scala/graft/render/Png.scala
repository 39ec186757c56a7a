package graft.render

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.render.Model.{GetResult, QueryOut}

/** Server-side PNG render of a dashboard result (op #33; ref:
  * server/pdf/pdf.go:33-342 — the reference screenshots the browser
  * page with chromedp to produce PDF/PNG downloads). A Spark library
  * has no browser, but it has the full render tree ([[Model.GetResult]]
  * — the same payload the reference's frontend draws), so the analog is
  * a headless Java2D painter over that payload: every element class the
  * render-type decision tree emits (charts, gauges, boxplots, values,
  * tables, inputs) gets a painter, and the bytes come out of the JDK's
  * ImageIO PNG encoder.
  *
  * Rendering is deliberately antialiasing-free: every chart pixel is an
  * exact palette color, which makes the output byte-deterministic for a
  * given result on a given JVM — the property the png01 driver entry
  * and the golden pixel-count assertions in PngSpec lean on.
  */
object Png {

  /** Categorical palette (chart series / pie slices / stack segments). */
  val Palette: Seq[Color] = Seq(
    new Color(0x3b6fb6), new Color(0xd95f4b), new Color(0x3f9e63),
    new Color(0xe0a83a), new Color(0x7d5fa8), new Color(0x4fa9b8))

  private val Bg = Color.WHITE
  private val Ink = new Color(0x222222)
  private val Grid = new Color(0xdddddd)
  private val CardEdge = new Color(0xbbbbbb)
  private val MarkLine = new Color(0x888888)

  private val PageW = 1200
  private val Margin = 24
  private val CardW = PageW - 2 * Margin

  private def heightOf(q: QueryOut): Int = q.render.renderType match {
    case "value" => 110
    case "dropdown" | "dropdownMulti" | "input" | "button" | "datepicker" |
        "daterangePicker" | "placeholder" => 70
    case "table" => 64 + 22 * math.min(q.rows.length, 20)
    case _ => 300 // charts, gauge, boxplot, pie, donut
  }

  // heap-backed ImageIO streams (the default stages every encode/decode
  // through a temp file); global flag, also set by Multimodal.Codecs —
  // idempotent, but this painter must not depend on that class loading
  ImageIO.setUseCache(false)

  /** Render the full dashboard to PNG bytes. */
  def render(result: GetResult): Array[Byte] = {
    val img = paint(result)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Paint the full dashboard page (the PDF wrap embeds this image
    * directly, skipping a PNG encode/decode roundtrip). */
  def paint(result: GetResult): BufferedImage = {
    val heights = result.sections.flatMap { sec =>
      (if (sec.title.isDefined) Seq(40) else Nil) ++
        sec.queries.map(q => heightOf(q) + 16)
    }
    val pageH = 72 + heights.sum + (if (result.footerLink.isDefined) 36 else 8)
    val img = new BufferedImage(PageW, pageH, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
      g.setColor(Bg); g.fillRect(0, 0, PageW, pageH)
      g.setColor(Ink)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 22))
      g.drawString(result.name, Margin, 42)
      var y = 72
      result.sections.foreach { sec =>
        sec.title.foreach { t =>
          g.setColor(Ink)
          g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
          g.drawString(t, Margin, y + 24)
          y += 40
        }
        sec.queries.foreach { q =>
          val h = heightOf(q)
          g.setColor(CardEdge)
          g.drawRect(Margin, y, CardW, h)
          paintElement(g, q, Margin, y, CardW, h)
          y += h + 16
        }
      }
      result.footerLink.foreach { link =>
        g.setColor(Palette.head)
        g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
        g.drawString(link, Margin, y + 20)
      }
    } finally g.dispose()
    img
  }

  // ---- element painters -----------------------------------------------

  private def paintElement(g: Graphics2D, q: QueryOut,
      x: Int, y: Int, w: Int, h: Int): Unit = {
    q.render.label.foreach { l =>
      g.setColor(Ink)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 13))
      g.drawString(l, x + 12, y + 18)
    }
    // plot area below the label band, inset from the card edge
    val px = x + 12; val py = y + 26; val pw = w - 24; val ph = h - 38
    q.render.renderType match {
      case "linechart" | "scatterplot" =>
        paintXY(g, q, px, py, pw, ph, dots = q.render.renderType == "scatterplot")
      case "barchartVertical" | "barchartVerticalStacked" =>
        paintBars(g, q, px, py, pw, ph, horizontal = false)
      case "barchartHorizontal" | "barchartHorizontalStacked" =>
        paintBars(g, q, px, py, pw, ph, horizontal = true)
      case "piechart" | "donutchart" =>
        paintPie(g, q, px, py, pw, ph, donut = q.render.renderType == "donutchart")
      case "gauge" => paintGauge(g, q, px, py, pw, ph)
      case "boxplot" => paintBoxplot(g, q, px, py, pw, ph)
      case "value" => paintValue(g, q, px, py, pw, ph)
      case "dropdown" | "dropdownMulti" | "input" | "button" | "datepicker" |
          "daterangePicker" | "placeholder" =>
        g.setColor(Grid)
        g.fillRect(px, py, pw, ph)
        g.setColor(Ink)
        g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
        val hint = q.rows.headOption.flatMap(_.headOption).map(String.valueOf)
          .getOrElse(q.render.renderType)
        g.drawString(s"[${q.render.renderType}] $hint", px + 8, py + ph / 2 + 4)
      case _ => paintTable(g, q, px, py, pw, ph)
    }
  }

  private def numericCols(q: QueryOut): Seq[Int] =
    q.columns.indices.filter(i =>
      q.columns(i).colType == "number" || q.columns(i).colType == "duration")

  private def numAt(row: Seq[Any], i: Int): Option[Double] = row(i) match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  /** Line/scatter: rows in order along x, one series per numeric column. */
  private def paintXY(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int, dots: Boolean): Unit = {
    val cols = numericCols(q)
    if (cols.isEmpty || q.rows.isEmpty) return
    val vals = q.rows.map(r => cols.flatMap(numAt(r, _)))
    val flat = vals.flatten
    if (flat.isEmpty) return
    val (lo, hi) = (math.min(flat.min, 0.0), flat.max)
    val span = if (hi > lo) hi - lo else 1.0
    g.setColor(Grid)
    g.drawLine(px, py + ph, px + pw, py + ph) // x axis
    g.drawLine(px, py, px, py + ph) // y axis
    val n = q.rows.length
    cols.zipWithIndex.foreach { case (c, ci) =>
      g.setColor(Palette(ci % Palette.length))
      g.setStroke(new BasicStroke(2f))
      var prev: Option[(Int, Int)] = None
      q.rows.zipWithIndex.foreach { case (row, i) =>
        numAt(row, c).foreach { v =>
          val sx = px + (if (n == 1) pw / 2 else i * pw / (n - 1))
          val sy = py + ph - ((v - lo) / span * (ph - 4)).toInt
          if (dots) g.fillRect(sx - 2, sy - 2, 5, 5)
          else prev.foreach { case (ax, ay) => g.drawLine(ax, ay, sx, sy) }
          prev = Some((sx, sy))
        }
      }
    }
    // numeric YLINE marklines: dashed horizontal rules at the marked
    // values, scaled like the series (get_dashboard.go:795-852 — the
    // frontend draws these; string/x-axis marks need category geometry
    // the engine-side page doesn't model, so only numeric y marks paint)
    paintYMarkLines(g, q, px, py, pw, ph, lo, span)
  }

  private def paintYMarkLines(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int, lo: Double, span: Double): Unit = {
    val marks = q.render.markLines.collect {
      case m if m.isYaxis => m.value match {
        case n: Number => Some(n.doubleValue())
        case _ => None
      }
    }.flatten
    if (marks.isEmpty) return
    g.setColor(MarkLine)
    g.setStroke(new BasicStroke(1f, BasicStroke.CAP_BUTT, BasicStroke.JOIN_MITER,
      10f, Array(4f, 4f), 0f))
    marks.foreach { v =>
      val sy = py + ph - ((v - lo) / span * (ph - 4)).toInt
      if (sy >= py && sy <= py + ph) g.drawLine(px, sy, px + pw, sy)
    }
    g.setStroke(new BasicStroke(1f))
  }

  /** Vertical/horizontal bars; with a category column, stack segments
    * per index value in category order. */
  private def paintBars(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int, horizontal: Boolean): Unit = {
    val valueCol = q.columns.indices.find(i => q.columns(i).tag == "value")
      .orElse(numericCols(q).headOption).getOrElse(return)
    val catCol = q.columns.indices.find(i => q.columns(i).tag == "category")
    val idxCol = q.columns.indices.find(i => q.columns(i).tag == "index")
      .getOrElse(if (valueCol == 0 && q.columns.length > 1) 1 else 0)
    // group rows by index value, preserving first-seen order
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Seq[Any]]]
    q.rows.foreach { r =>
      groups.getOrElseUpdate(String.valueOf(r(idxCol)),
        scala.collection.mutable.ArrayBuffer.empty) += r
    }
    val cats = catCol.map(c => q.rows.map(r => String.valueOf(r(c))).distinct)
      .getOrElse(Nil)
    val totals = groups.values.map(_.flatMap(numAt(_, valueCol)).sum)
    if (totals.isEmpty) return
    val maxTotal = math.max(totals.max, 1e-9)
    g.setColor(Grid)
    if (horizontal) g.drawLine(px, py, px, py + ph)
    else g.drawLine(px, py + ph, px + pw, py + ph)
    val n = groups.size
    val slot = (if (horizontal) ph else pw) / math.max(n, 1)
    val barThick = math.max(slot * 2 / 3, 2)
    groups.zipWithIndex.foreach { case ((_, rows), i) =>
      var acc = 0.0
      rows.foreach { r =>
        numAt(r, valueCol).foreach { v =>
          val ci = catCol.map(c => math.max(cats.indexOf(String.valueOf(r(c))), 0))
            .getOrElse(0)
          g.setColor(Palette(ci % Palette.length))
          val from = (acc / maxTotal * ((if (horizontal) pw else ph) - 4)).toInt
          val to = ((acc + v) / maxTotal * ((if (horizontal) pw else ph) - 4)).toInt
          val len = math.max(to - from, 1)
          if (horizontal)
            g.fillRect(px + 1 + from, py + i * slot + (slot - barThick) / 2, len, barThick)
          else
            g.fillRect(px + i * slot + (slot - barThick) / 2, py + ph - to, barThick, len)
          acc += v
        }
      }
    }
    // vertical bars have a numeric y axis → dashed y marklines scale
    // against the stacked max (horizontal bars' value axis is x and is
    // left to the frontend, same as string marks)
    if (!horizontal) paintYMarkLines(g, q, px, py, pw, ph, 0.0, maxTotal)
  }

  private def paintPie(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int, donut: Boolean): Unit = {
    val valueCol = numericCols(q).headOption.getOrElse(return)
    // keep the ROW index for the color so slice colors stay aligned with
    // the category order even when zero/negative rows paint no slice
    val vals = q.rows.zipWithIndex
      .flatMap { case (r, i) => numAt(r, valueCol).filter(_ > 0).map((_, i)) }
    val total = vals.map(_._1).sum
    if (total <= 0) return
    val d = math.min(pw, ph) - 8
    val cx = px + (pw - d) / 2; val cy = py + (ph - d) / 2
    var start = 90.0
    vals.foreach { case (v, i) =>
      val sweep = -v / total * 360.0
      g.setColor(Palette(i % Palette.length))
      g.fillArc(cx, cy, d, d, math.round(start).toInt, math.round(sweep).toInt)
      start += sweep
    }
    if (donut) {
      g.setColor(Bg)
      g.fillOval(cx + d / 4, cy + d / 4, d / 2, d / 2)
    }
  }

  private def paintGauge(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int): Unit = {
    val cats = q.render.gaugeCategories
    val lo = cats.headOption.map(_.from).getOrElse(0.0)
    val hi = cats.lastOption.map(_.to).getOrElse(1.0)
    val span = math.max(hi - lo, 1e-9)
    val d = math.min(pw, 2 * ph) - 8
    val cx = px + (pw - d) / 2; val cy = py + ph - d / 2
    cats.zipWithIndex.foreach { case (c, i) =>
      g.setColor(parseColor(c.color, Palette(i % Palette.length)))
      val a0 = 180 - (c.from - lo) / span * 180
      val a1 = 180 - (c.to - lo) / span * 180
      g.fillArc(cx, cy - d / 2, d, d, math.round(a1).toInt,
        math.round(a0 - a1).toInt)
    }
    g.setColor(Bg)
    g.fillOval(cx + d / 4, cy - d / 4, d / 2, d / 2)
    // needle at the first numeric value
    for (c <- numericCols(q).headOption; v <- q.rows.headOption.flatMap(numAt(_, c))) {
      val ang = math.toRadians(180 - (v - lo) / span * 180)
      g.setColor(Ink)
      g.setStroke(new BasicStroke(3f))
      g.drawLine(px + pw / 2, cy,
        px + pw / 2 + (math.cos(ang) * d / 2).toInt,
        cy - (math.sin(ang) * d / 2).toInt)
    }
  }

  /** One box per row from a boxplot struct column (min, q1, median, q3,
    * max [, outliers]). */
  private def paintBoxplot(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int): Unit = {
    def stats(v: Any): Option[Seq[Double]] = v match {
      case r: org.apache.spark.sql.Row =>
        val nums = (0 until r.length).flatMap(i => r.get(i) match {
          case n: Number => Some(n.doubleValue())
          case _ => None
        })
        if (nums.length >= 5) Some(nums.take(5)) else None
      case p: Product =>
        val nums = p.productIterator.collect { case n: Number => n.doubleValue() }.toSeq
        if (nums.length >= 5) Some(nums.take(5)) else None
      case _ => None
    }
    val boxCol = q.columns.indices.find(i => q.columns(i).colType == "object")
      .getOrElse(return)
    val boxes = q.rows.flatMap(r => stats(r(boxCol)))
    if (boxes.isEmpty) return
    val lo = boxes.map(_.min).min; val hi = boxes.map(_.max).max
    val span = math.max(hi - lo, 1e-9)
    def sy(v: Double): Int = py + ph - ((v - lo) / span * (ph - 8)).toInt - 4
    val slot = pw / boxes.length
    boxes.zipWithIndex.foreach { case (b, i) =>
      val bx = px + i * slot + slot / 4
      val bw = math.max(slot / 2, 6)
      val mid = bx + bw / 2
      g.setColor(Ink)
      g.setStroke(new BasicStroke(1f))
      g.drawLine(mid, sy(b(0)), mid, sy(b(4))) // whisker spine
      g.drawLine(bx, sy(b(0)), bx + bw, sy(b(0)))
      g.drawLine(bx, sy(b(4)), bx + bw, sy(b(4)))
      g.setColor(Palette(i % Palette.length))
      g.fillRect(bx, sy(b(3)), bw, math.max(sy(b(1)) - sy(b(3)), 1)) // q1..q3
      g.setColor(Ink)
      g.drawLine(bx, sy(b(2)), bx + bw, sy(b(2))) // median
    }
  }

  private def paintValue(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int): Unit = {
    val v = q.rows.headOption.flatMap(_.headOption).map(String.valueOf).getOrElse("—")
    g.setColor(Ink)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 36))
    g.drawString(v, px + 8, py + ph / 2 + 12)
  }

  private def paintTable(g: Graphics2D, q: QueryOut,
      px: Int, py: Int, pw: Int, ph: Int): Unit = {
    val cols = q.columns.take(8)
    if (cols.isEmpty) return
    val colW = pw / cols.length
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 12))
    g.setColor(Grid)
    g.fillRect(px, py, pw, 20)
    g.setColor(Ink)
    cols.zipWithIndex.foreach { case (c, i) =>
      g.drawString(truncate(c.name, colW), px + i * colW + 4, py + 14)
    }
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
    q.rows.take(20).zipWithIndex.foreach { case (row, ri) =>
      val ry = py + 20 + ri * 22
      g.setColor(Grid)
      g.drawLine(px, ry, px + pw, ry)
      g.setColor(Ink)
      row.take(8).zipWithIndex.foreach { case (v, i) =>
        g.drawString(truncate(String.valueOf(v), colW), px + i * colW + 4, ry + 15)
      }
    }
  }

  private def truncate(s: String, widthPx: Int): String = {
    val maxChars = math.max(widthPx / 7 - 1, 3)
    if (s.length <= maxChars) s else s.take(maxChars - 1) + "…"
  }

  private def parseColor(s: String, fallback: Color): Color =
    try {
      if (s != null && s.startsWith("#") && (s.length == 7))
        new Color(Integer.parseInt(s.substring(1), 16))
      else fallback
    } catch { case _: NumberFormatException => fallback }

  /** Count of pixels exactly matching each palette color — the
    * geometry-only fingerprint used by the png01 driver entry (text
    * pixels are ink/gray and excluded, so the counts depend only on
    * chart geometry, never on font rasterization). */
  def paletteCounts(png: Array[Byte]): Seq[(String, Long)] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    val wanted = Palette.map(c => c.getRGB).zipWithIndex.toMap
    val counts = new Array[Long](Palette.length)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        wanted.get(img.getRGB(x, y)).foreach(i => counts(i) += 1)
        x += 1
      }
      y += 1
    }
    Palette.indices.map(i => (f"#${Palette(i).getRGB & 0xffffff}%06x", counts(i)))
  }
}
