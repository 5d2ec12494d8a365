package graft.sinks

/** Dependency-free SVG chart writer — the K7 plot sink.
  *
  * The reference renders per-tile monitor plots with matplotlib
  * (tile_processor/recorder.py:106-133: `save_mem_plot` = memory [MB]
  * per tile over time, `save_cpu_log` = bar chart of max CPU minutes
  * per tile) and saves them from the CLI (cli.py:178-192). This engine
  * has no plotting dependency, so the two figures are emitted as
  * self-contained SVG — same data, same two chart forms.
  *
  * Chart conventions (kept deliberately spare): one y-axis, recessive
  * grid, 2px line marks, a fixed-order 8-color categorical palette for
  * series identity with overflow folded into muted context lines (a
  * legend can't carry 16+ distinguishable hues), and a single hue for
  * the bar chart (one measure — identity is on the x axis, not the
  * color). Text is neutral ink, never the series color.
  */
object SvgPlot {

  /** Fixed-order categorical palette (colorblind-safe adjacent pairs,
    * light surface). Series beyond 8 render as muted gray context. */
  private val Palette = Vector(
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948")
  private val Muted = "#c8c7c0"
  private val Ink = "#333330"
  private val InkSoft = "#73726c"
  private val Grid = "#e8e7e0"

  private val W = 860
  private val H = 480
  private val Pad = 56 // plot-area inset for axes/labels
  private val PadR = 150 // room for the legend column

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e7) v.toLong.toString
    else f"$v%.2f"

  /** ~5 round-numbered axis ticks across [lo, hi]. */
  private def ticks(lo: Double, hi: Double): Seq[Double] = {
    val span = math.max(hi - lo, 1e-9)
    val raw = span / 5
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = Seq(1, 2, 5, 10).map(_ * mag).find(_ >= raw).get
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + 1e-9).toSeq
  }

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H" font-family="sans-serif">
       |<rect width="$W" height="$H" fill="#ffffff"/>
       |<text x="${Pad}" y="28" font-size="16" fill="$Ink">${esc(title)}</text>""".stripMargin

  private def axes(x0: Int, x1: Int, y0: Int, y1: Int,
                   xlo: Double, xhi: Double, ylo: Double, yhi: Double,
                   xlabel: String, ylabel: String,
                   xTicks: Boolean = true): String = {
    val sb = new StringBuilder
    def sx(v: Double) = x0 + (v - xlo) / math.max(xhi - xlo, 1e-9) * (x1 - x0)
    def sy(v: Double) = y1 - (v - ylo) / math.max(yhi - ylo, 1e-9) * (y1 - y0)
    for (t <- ticks(ylo, yhi)) {
      val y = sy(t)
      sb ++= f"""<line x1="$x0" y1="$y%.1f" x2="$x1" y2="$y%.1f" stroke="$Grid" stroke-width="1"/>%n"""
      sb ++= f"""<text x="${x0 - 8}" y="${y + 4}%.1f" font-size="11" fill="$InkSoft" text-anchor="end">${fmt(t)}</text>%n"""
    }
    if (xTicks) for (t <- ticks(xlo, xhi)) {
      val x = sx(t)
      sb ++= f"""<text x="$x%.1f" y="${y1 + 18}" font-size="11" fill="$InkSoft" text-anchor="middle">${fmt(t)}</text>%n"""
    }
    sb ++= s"""<line x1="$x0" y1="$y1" x2="$x1" y2="$y1" stroke="$InkSoft" stroke-width="1"/>\n"""
    sb ++= s"""<text x="${(x0 + x1) / 2}" y="${H - 10}" font-size="12" fill="$Ink" text-anchor="middle">${esc(xlabel)}</text>\n"""
    sb ++= s"""<text x="16" y="${(y0 + y1) / 2}" font-size="12" fill="$Ink" text-anchor="middle" transform="rotate(-90 16 ${(y0 + y1) / 2})">${esc(ylabel)}</text>\n"""
    sb.toString
  }

  /** Multi-series line chart: memory-per-tile form. Series are drawn in
    * the given order; the first 8 get palette hues + legend entries,
    * the rest render muted (folded into one "others" legend line). */
  def lineChart(title: String, xlabel: String, ylabel: String,
                series: Seq[(String, Seq[(Double, Double)])]): String = {
    val pts = series.flatMap(_._2)
    require(pts.nonEmpty, "lineChart needs at least one point")
    val (xlo, xhi) = (pts.map(_._1).min, pts.map(_._1).max)
    val (ylo, yhi) = (math.min(0.0, pts.map(_._2).min), pts.map(_._2).max)
    val (x0, x1, y0, y1) = (Pad, W - PadR, 44, H - 44)
    def sx(v: Double) = x0 + (v - xlo) / math.max(xhi - xlo, 1e-9) * (x1 - x0)
    def sy(v: Double) = y1 - (v - ylo) / math.max(yhi - ylo, 1e-9) * (y1 - y0)
    val sb = new StringBuilder(header(title))
    sb ++= axes(x0, x1, y0, y1, xlo, xhi, ylo, yhi, xlabel, ylabel)
    // muted overflow first so colored series draw on top
    for (((_, data), i) <- series.zipWithIndex; if i >= Palette.size)
      sb ++= polyline(data.map { case (x, y) => (sx(x), sy(y)) }, Muted)
    for (((_, data), i) <- series.zipWithIndex; if i < Palette.size)
      sb ++= polyline(data.map { case (x, y) => (sx(x), sy(y)) }, Palette(i))
    // legend: one row per colored series, one folded row for the rest
    for (((name, _), i) <- series.zipWithIndex.take(Palette.size)) {
      val ly = y0 + 14 * i
      sb ++= s"""<rect x="${x1 + 14}" y="${ly - 8}" width="10" height="10" rx="2" fill="${Palette(i)}"/>\n"""
      sb ++= s"""<text x="${x1 + 30}" y="$ly" font-size="11" fill="$Ink">${esc(name)}</text>\n"""
    }
    if (series.size > Palette.size) {
      val ly = y0 + 14 * Palette.size
      sb ++= s"""<rect x="${x1 + 14}" y="${ly - 8}" width="10" height="10" rx="2" fill="$Muted"/>\n"""
      sb ++= s"""<text x="${x1 + 30}" y="$ly" font-size="11" fill="$Ink">${series.size - Palette.size} others</text>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  private def polyline(pts: Seq[(Double, Double)], color: String): String =
    if (pts.isEmpty) ""
    else {
      val d = pts.map { case (x, y) => f"$x%.1f,$y%.1f" }.mkString(" ")
      s"""<polyline points="$d" fill="none" stroke="$color" stroke-width="2" stroke-linejoin="round"/>\n"""
    }

  /** Single-measure bar chart: max-CPU-per-tile form. One hue — the
    * category identity is the x position, not the color. */
  def barChart(title: String, xlabel: String, ylabel: String,
               bars: Seq[(String, Double)]): String = {
    require(bars.nonEmpty, "barChart needs at least one bar")
    val yhi = math.max(bars.map(_._2).max, 1e-9)
    val (x0, x1, y0, y1) = (Pad, W - 24, 44, H - 64)
    val slot = (x1 - x0).toDouble / bars.size
    val bw = math.max(slot - 2, 1.0) // 2px gap between adjacent bars
    val sb = new StringBuilder(header(title))
    // category labels replace numeric x ticks (they'd collide)
    sb ++= axes(x0, x1, y0, y1, 0, 1, 0, yhi, "", ylabel, xTicks = false)
    for (((name, v), i) <- bars.zipWithIndex) {
      val bx = x0 + i * slot + 1
      val bh = v / yhi * (y1 - y0)
      val by = y1 - bh
      sb ++= f"""<path d="M$bx%.1f ${y1}%.1f V${by + 4}%.1f Q$bx%.1f $by%.1f ${bx + 4}%.1f $by%.1f H${bx + bw - 4}%.1f Q${bx + bw}%.1f $by%.1f ${bx + bw}%.1f ${by + 4}%.1f V$y1%.1f Z" fill="${Palette(0)}"/>%n"""
      sb ++= f"""<text x="${bx + bw / 2}%.1f" y="${y1 + 16}" font-size="10" fill="$InkSoft" text-anchor="end" transform="rotate(-45 ${bx + bw / 2}%.1f ${y1 + 16})">${esc(name)}</text>%n"""
    }
    sb ++= s"""<text x="${(x0 + x1) / 2}" y="${H - 8}" font-size="12" fill="$Ink" text-anchor="middle">${esc(xlabel)}</text>\n"""
    sb ++= "</svg>\n"
    sb.toString
  }
}
