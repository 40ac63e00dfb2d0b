package graft.eval

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

/** S8 — the PDF plot sink: the reference renders per-group normalized
  * confusion matrices side by side with matplotlib and saves
  * `confusionmatrices/cm_<debiaser>_[<sens6>_...]<dataset>.pdf`
  * (reference confusionmatrix.py:100-144). This is the same artifact from
  * a minimal deterministic PDF 1.4 writer — pure JVM, no plotting
  * dependency (none exists in this environment), byte-stable output.
  *
  * Scale note: plotting is inherently a driver-side sink over an already
  * AGGREGATED result (2 groups x k^2 rates — bounded by class count, not
  * data size). The one distributed pass is
  * [[ConfusionMatrices.perGroup]]; this class only formats its tiny
  * output, exactly as the reference's matplotlib call formats a pandas
  * crosstab.
  */
object PdfPlot {

  /** Render the reference's double confusion-matrix figure from
    * [[ConfusionMatrices.perGroup]] output and write it under `outDir`
    * with the reference's filename contract (each sensitive-feature name
    * truncated to 6 chars + '_'; no trailing separator when none).
    * Returns the written path.
    */
  def writeDoubleConfusionMatrixPdf(
      cmPerGroup: DataFrame,
      classes: Seq[String],
      dataset: String,
      debiaser: String,
      sensitiveNames: Seq[String],
      outDir: String): Path = {
    require(classes.nonEmpty, "class list must not be empty")
    // tiny by construction: 2 groups x |classes|^2
    val rows = cmPerGroup
      .select("group", "y_true", "y_pred", "rate")
      .collect()
      .map(r => (r.getString(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)),
        r.getDouble(3)))
    val idx = classes.zipWithIndex.toMap
    def matrixOf(group: String): Array[Array[Double]] = {
      val m = Array.fill(classes.length, classes.length)(0.0)
      rows.foreach { case (g, yt, yp, rate) =>
        if (g == group) for (i <- idx.get(yt); j <- idx.get(yp)) m(i)(j) = rate
      }
      m
    }
    val names = sensitiveNames.map(n => n.take(6) + "_").mkString
    val file = s"cm_${debiaser}_$names$dataset.pdf"
    val content = pageContent(Seq(
      ("Unprivileged group", matrixOf("unprivileged")),
      ("Privileged group", matrixOf("privileged"))), classes)
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val path = dir.resolve(file)
    Files.write(path, buildPdf(content))
    path
  }

  // page geometry: A4 landscape, two square panels
  private val PageW = 842
  private val PageH = 595

  /** Locale-independent operand formatting: Scala's `f""` interpolator
    * formats with the DEFAULT locale, which on comma-decimal JVMs
    * (de_DE, fr_FR, ...) would emit `0,85 g` — invalid PDF syntax.
    */
  private def num(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  private def fmt(v: Double): String = num(v, 2)

  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  private def text(x: Double, y: Double, size: Int, s: String, gray: Double = 0.0): String =
    s"${num(gray, 2)} g BT /F1 $size Tf 1 0 0 1 ${num(x, 1)} ${num(y, 1)} Tm (${esc(s)}) Tj ET\n"

  /** Approximate centered text (Helvetica average advance ~0.55em). */
  private def centered(cx: Double, y: Double, size: Int, s: String, gray: Double = 0.0): String =
    text(cx - 0.55 * size * s.length / 2, y, size, s, gray)

  private def pageContent(panels: Seq[(String, Array[Array[Double]])], classes: Seq[String]): String = {
    val sb = new StringBuilder
    val k = classes.length
    // 50 + 360 + 45 + 360 = 815 <= 842: both panels fit inside the MediaBox
    val panelSize = 360.0
    val cell = panelSize / k
    panels.zipWithIndex.foreach { case ((title, m), p) =>
      val x0 = 50.0 + p * (panelSize + 45)
      val yTop = 500.0
      sb.append(centered(x0 + panelSize / 2, yTop + 18, 14, title))
      for (i <- 0 until k; j <- 0 until k) {
        val rate = m(i)(j)
        val x = x0 + j * cell
        val y = yTop - (i + 1) * cell
        // darker = higher rate (matplotlib Blues ~ monochrome here)
        val fill = 1.0 - 0.85 * rate
        sb.append(s"${num(fill, 3)} g ${num(x, 1)} ${num(y, 1)} ${num(cell, 1)} ${num(cell, 1)} re f\n")
        val tGray = if (rate > 0.5) 1.0 else 0.0
        sb.append(centered(x + cell / 2, y + cell / 2 - 4, 10, fmt(rate), tGray))
      }
      // grid frame
      sb.append(s"0 g 0.8 w ${num(x0, 1)} ${num(yTop - panelSize, 1)} ${num(panelSize, 1)} ${num(panelSize, 1)} re S\n")
      // tick labels
      for (j <- 0 until k)
        sb.append(centered(x0 + j * cell + cell / 2, yTop - panelSize - 14, 9, classes(j)))
      for (i <- 0 until k)
        sb.append(text(x0 - 8 - 0.55 * 9 * classes(i).length,
          yTop - i * cell - cell / 2 - 3, 9, classes(i)))
      sb.append(centered(x0 + panelSize / 2, yTop - panelSize - 30, 11, "Predicted label"))
      sb.append(text(x0 - 40, yTop - panelSize / 2, 11, "True"))
    }
    sb.toString
  }

  /** Assemble a single-page PDF 1.4 around `content` (an uncompressed
    * content stream). Offsets are byte-exact (ISO-8859-1, ASCII content),
    * so the xref table is valid for strict readers.
    */
  private[eval] def buildPdf(content: String): Array[Byte] = {
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
      s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (o, i) =>
      val off = sb.length
      sb.append(s"${i + 1} 0 obj\n$o\nendobj\n")
      off
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    // Locale.ROOT like num(): default-locale %d can emit non-Latin digits
    // (e.g. ar/hi numbering), which would corrupt the xref byte layout.
    offsets.foreach(o =>
      sb.append("%010d 00000 n \n".formatLocal(java.util.Locale.ROOT, o)))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
