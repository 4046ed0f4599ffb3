package graft

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage

/** Dependency-free PNG charts via java.awt — the analog of the
  * reference's matplotlib artifacts (`performance_analysis.py:101-111`
  * `latency_vs_k.png`, `:200-214` `shard_distribution.png`,
  * `visualize_results.py:91-155`). The reference commits these images;
  * `graft.Report` renders the same three figures from the bench
  * detail + store stats so a user of the reference gets the artifacts
  * they're used to, without a plotting dependency.
  */
object Charts {

  private val W = 900
  private val H = 540
  private val ML = 80 // margins: left, right, top, bottom
  private val MR = 30
  private val MT = 50
  private val MB = 70

  private val seriesColors = Array(
    new Color(31, 119, 180), new Color(255, 127, 14),
    new Color(44, 160, 44), new Color(214, 39, 40))

  private def canvas(): (BufferedImage, java.awt.Graphics2D) = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, W, H)
    (img, g)
  }

  private def frame(g: java.awt.Graphics2D, title: String,
                    xLabel: String, yLabel: String): Unit = {
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
    val tw = g.getFontMetrics.stringWidth(title)
    g.drawString(title, (W - tw) / 2, 28)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 13))
    val xw = g.getFontMetrics.stringWidth(xLabel)
    g.drawString(xLabel, ML + (W - ML - MR - xw) / 2, H - 18)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 22, MT + (H - MT - MB) / 2)
    val yw = g.getFontMetrics.stringWidth(yLabel)
    g.drawString(yLabel, 22 - yw / 2, MT + (H - MT - MB) / 2 + 5)
    g.setTransform(old)
    g.drawRect(ML, MT, W - ML - MR, H - MT - MB)
  }

  /** "Nice" rounded tick step covering `span` in ~5 steps. */
  private def tickStep(span: Double): Double = {
    val raw = span / 5.0
    val mag = math.pow(10, math.floor(math.log10(math.max(raw, 1e-12))))
    val n = raw / mag
    (if (n <= 1) 1.0 else if (n <= 2) 2.0 else if (n <= 5) 5.0 else 10.0) * mag
  }

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e7) v.toLong.toString
    else if (math.abs(v) >= 1) f"$v%.1f"
    else f"$v%.2f"

  /** Multi-series line chart with point markers (the latency/recall
    * curve shape). X positions are the values themselves.
    */
  def lineChart(series: Seq[(String, Seq[(Double, Double)])], title: String,
                xLabel: String, yLabel: String, out: String): Unit = {
    val (img, g) = canvas()
    frame(g, title, xLabel, yLabel)
    val pts = series.flatMap(_._2)
    if (pts.nonEmpty) {
      val (xMin, xMax) = (pts.map(_._1).min, pts.map(_._1).max)
      val yMax = math.max(pts.map(_._2).max, 1e-12)
      val xSpan = math.max(xMax - xMin, 1e-12)
      def px(x: Double) = ML + ((x - xMin) / xSpan * (W - ML - MR)).toInt
      def py(y: Double) = H - MB - (y / (yMax * 1.1) * (H - MT - MB)).toInt
      // y gridlines + ticks
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      val step = tickStep(yMax * 1.1)
      var t = 0.0
      while (t <= yMax * 1.1) {
        g.setColor(new Color(230, 230, 230))
        g.drawLine(ML + 1, py(t), W - MR - 1, py(t))
        g.setColor(Color.DARK_GRAY)
        val s = fmt(t)
        g.drawString(s, ML - 8 - g.getFontMetrics.stringWidth(s), py(t) + 4)
        t += step
      }
      // x ticks at the distinct data x's
      pts.map(_._1).distinct.sorted.foreach { x =>
        g.setColor(Color.DARK_GRAY)
        g.drawLine(px(x), H - MB, px(x), H - MB + 5)
        val s = fmt(x)
        g.drawString(s, px(x) - g.getFontMetrics.stringWidth(s) / 2, H - MB + 20)
      }
      series.zipWithIndex.foreach { case ((name, data), i) =>
        val c = seriesColors(i % seriesColors.length)
        g.setColor(c)
        g.setStroke(new BasicStroke(2.2f))
        val sorted = data.sortBy(_._1)
        sorted.sliding(2).foreach {
          case Seq((x1, y1), (x2, y2)) =>
            g.drawLine(px(x1), py(y1), px(x2), py(y2))
          case _ =>
        }
        sorted.foreach { case (x, y) => g.fillOval(px(x) - 4, py(y) - 4, 8, 8) }
        // legend
        g.fillRect(ML + 14, MT + 12 + i * 20, 14, 14)
        g.setColor(Color.BLACK)
        g.drawString(name, ML + 34, MT + 24 + i * 20)
      }
    }
    g.dispose()
    javax.imageio.ImageIO.write(img, "png", new java.io.File(out))
  }

  /** Labeled bar chart with value labels on top (the shard-distribution
    * shape, `performance_analysis.py:200-214`).
    */
  def barChart(labels: Seq[String], values: Seq[Double], title: String,
               xLabel: String, yLabel: String, out: String): Unit = {
    val (img, g) = canvas()
    frame(g, title, xLabel, yLabel)
    if (values.nonEmpty) {
      val yMax = math.max(values.max, 1e-12)
      def py(y: Double) = H - MB - (y / (yMax * 1.15) * (H - MT - MB)).toInt
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      val step = tickStep(yMax * 1.15)
      var t = 0.0
      while (t <= yMax * 1.15) {
        g.setColor(new Color(230, 230, 230))
        g.drawLine(ML + 1, py(t), W - MR - 1, py(t))
        g.setColor(Color.DARK_GRAY)
        val s = fmt(t)
        g.drawString(s, ML - 8 - g.getFontMetrics.stringWidth(s), py(t) + 4)
        t += step
      }
      val n = values.length
      val slot = (W - ML - MR).toDouble / n
      val bw = math.max(2, (slot * 0.7).toInt)
      values.zipWithIndex.foreach { case (v, i) =>
        val x = ML + (i * slot + (slot - bw) / 2).toInt
        g.setColor(seriesColors(0))
        g.fillRect(x, py(v), bw, H - MB - py(v))
        g.setColor(Color.BLACK)
        val vs = fmt(v)
        g.drawString(vs, x + (bw - g.getFontMetrics.stringWidth(vs)) / 2,
          py(v) - 5)
        if (n <= 32) {
          val ls = labels(i)
          g.drawString(ls, x + (bw - g.getFontMetrics.stringWidth(ls)) / 2,
            H - MB + 20)
        }
      }
    }
    g.dispose()
    javax.imageio.ImageIO.write(img, "png", new java.io.File(out))
  }
}
