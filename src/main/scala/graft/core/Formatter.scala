package graft.core

import org.apache.spark.sql.Row

/** Display formatting for frames (reference `tafra/formatter.py` and
  * `base.py:551-679` pformat/to_html). Display is inherently
  * driver-side: both functions format only the first `n` rows the
  * caller already limited — never the whole frame.
  */
object Formatter {

  private def cell(v: Any, depth: Option[Int] = None): String = v match {
    case null => "None"
    // collection.Seq, not the immutable default alias: Spark rows hold
    // mutable.ArraySeq for array columns
    case a: scala.collection.Seq[_] =>
      depth match {
        case Some(d) if a.length > d => a.take(d).mkString("[", ", ", ", …]")
        case _ => a.mkString("[", ", ", "]")
      }
    case b: Array[Byte] => s"bytes[${b.length}]"
    case other => other.toString
  }

  /** Aligned monospaced table like the reference's pformat
    * (base.py:551: indent/width/depth are the PrettyPrinter knobs).
    * `indent` prefixes each line; `width` > 0 truncates lines with an
    * ellipsis; `depth` elides array cells past that many elements.
    */
  def pformat(columns: Seq[String], dtypes: Seq[String], rows: Seq[Row],
              indent: Int = 0, width: Int = 0, depth: Option[Int] = None): String = {
    val header = columns.zip(dtypes).map { case (c, t) => s"$c ($t)" }
    val cells = rows.map(r => r.toSeq.map(cell(_, depth)))
    val widths = header.indices.map { i =>
      (header(i).length +: cells.map(_(i).length)).max
    }
    val margin = " " * indent
    def clip(s: String): String =
      if (width > 0 && s.length > width) s.take(math.max(width - 1, 1)) + "…" else s
    def line(vals: Seq[String]): String =
      clip(margin + vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |"))
    val sep = clip(margin + widths.map("-" * _).mkString("|-", "-|-", "-|"))
    (line(header) +: sep +: cells.map(line)).mkString("\n")
  }

  /** Minimal HTML table (reference to_html). Values are escaped. */
  def toHtml(columns: Seq[String], rows: Seq[Row]): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val head = columns.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map(r =>
      r.toSeq.map(v => s"<td>${esc(cell(v))}</td>").mkString("<tr>", "", "</tr>")).mkString
    s"<table><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"
  }
}
