package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PNG chart artifacts must be real decodable images with the
  * data actually drawn (non-blank plot area, every series color
  * present) — a blank white canvas would silently satisfy a
  * file-exists check.
  */
class ChartsSpec extends AnyFunSuite {

  private def pixels(f: String): (java.awt.image.BufferedImage, Map[Int, Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.File(f))
    val counts = scala.collection.mutable.Map.empty[Int, Int]
    var x = 0
    while (x < img.getWidth) {
      var y = 0
      while (y < img.getHeight) {
        val c = img.getRGB(x, y) & 0xffffff
        counts(c) = counts.getOrElse(c, 0) + 1
        y += 1
      }
      x += 1
    }
    (img, counts.toMap)
  }

  test("line chart renders both series and axes") {
    val f = graft.util.TempDirs.create("graft_charts")
      .resolve("line.png").toString
    Charts.lineChart(
      Seq("a" -> Seq((1.0, 10.0), (5.0, 20.0), (10.0, 15.0)),
        "b" -> Seq((1.0, 5.0), (5.0, 12.0), (10.0, 30.0))),
      "title", "x", "y", f)
    val (img, counts) = pixels(f)
    assert(img.getWidth == 900 && img.getHeight == 540)
    val nonWhite = counts.filterNot(_._1 == 0xffffff).values.sum
    assert(nonWhite > 2000, s"near-blank chart: $nonWhite non-white px")
    // both series' exact colors must appear (lines + legend swatches)
    assert(counts.getOrElse(0x1f77b4, 0) > 50, "series-0 blue missing")
    assert(counts.getOrElse(0xff7f0e, 0) > 50, "series-1 orange missing")
  }

  test("bar chart renders one bar per value") {
    val f = graft.util.TempDirs.create("graft_charts")
      .resolve("bar.png").toString
    Charts.barChart(Seq("s1", "s2", "s3"), Seq(100.0, 250.0, 175.0),
      "title", "x", "y", f)
    val (img, counts) = pixels(f)
    assert(img.getWidth == 900)
    // bars are solid series-0 blue: 3 bars × ≥(2px wide × ~100px tall)
    assert(counts.getOrElse(0x1f77b4, 0) > 3 * 200,
      "bars missing or too small")
    // the tallest bar must reach higher than the shortest: scan columns
    def topOfBlue(x: Int): Int = {
      var y = 0
      while (y < img.getHeight &&
        (img.getRGB(x, y) & 0xffffff) != 0x1f77b4) y += 1
      y
    }
    val slot = (900 - 80 - 30) / 3.0
    val mids = (0 until 3).map(i => 80 + (i * slot + slot / 2).toInt)
    val tops = mids.map(topOfBlue)
    assert(tops(1) < tops(0) && tops(1) < tops(2),
      s"tallest bar not tallest: $tops")
  }
}
