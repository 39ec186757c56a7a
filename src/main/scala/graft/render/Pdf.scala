package graft.render

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Dashboard → PDF (the other half of op #33; ref: server/pdf/pdf.go:33-342
  * prints the page to PDF through a browser). The painted page
  * ([[Png]]) is embedded as a FlateDecode DeviceRGB image XObject in a
  * hand-assembled single-page PDF-1.4 file — PDF is a plain-text object
  * graph plus binary streams, so no library is needed, and the JDK's
  * Deflater is deterministic for a given input, keeping the whole
  * render byte-reproducible like the PNG path.
  */
object Pdf {

  /** Render the dashboard page and wrap it as a one-page PDF (1 px =
    * 1 pt, i.e. 72 dpi). */
  def render(result: Model.GetResult): Array[Byte] =
    fromImage(Png.paint(result))

  def fromImage(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    // raw RGB8, top row first (PDF image sample order)
    val raw = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        raw(i) = ((rgb >> 16) & 0xff).toByte
        raw(i + 1) = ((rgb >> 8) & 0xff).toByte
        raw(i + 2) = (rgb & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](16384)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    val content =
      s"q $w 0 0 $h 0 0 cm /Im0 Do Q\n".getBytes(US_ASCII)

    val out = new ByteArrayOutputStream()
    def write(s: String): Unit = out.write(s.getBytes(US_ASCII))
    val offsets = new Array[Int](6) // object byte offsets, 1-based
    def beginObj(n: Int): Unit = { offsets(n) = out.size(); write(s"$n 0 obj\n") }

    write("%PDF-1.4\n")
    beginObj(1); write("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2); write("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    beginObj(3)
    write(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $w $h] " +
      "/Resources << /XObject << /Im0 4 0 R >> /ProcSet [/PDF /ImageC] >> " +
      "/Contents 5 0 R >>\nendobj\n")
    beginObj(4)
    write(s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
      s"/Length ${deflated.length} >>\nstream\n")
    out.write(deflated)
    write("\nendstream\nendobj\n")
    beginObj(5)
    write(s"<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    write("endstream\nendobj\n")

    val xrefAt = out.size()
    write("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(n => write(f"${offsets(n)}%010d 00000 n \n"))
    write(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
