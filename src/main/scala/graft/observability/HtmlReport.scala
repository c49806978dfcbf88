package graft.observability

import org.apache.spark.sql.DataFrame

/** HTML inspection rendering (reference analysis/vector/matrix.py:174
  * render_matrix_html + operations/persistence.py:183 _write_html_output):
  * the browsable twin of Runs.writeText, for the reports a human reads —
  * the availability matrix in its reference two-section shape (Feature /
  * Target Availability, one row per sample group, one status-classed cell
  * per vector) and a generic bounded table for every other task report.
  *
  * Divergence note: the reference base64-encodes the status codes and
  * expands them client-side (a payload-size trick for its single-node
  * renderer); graft emits the expanded static cells directly — identical
  * rendered content, no script required. Like writeText, this is a
  * driver-side inspection sink: the matrix frame is max_cells-guarded and
  * `limit` bounds the generic collect.
  */
object HtmlReport {

  private val Style =
    """body{font-family:sans-serif;margin:1.5rem}
      |table{border-collapse:collapse;margin:1rem 0}
      |th,td{border:1px solid #ccc;padding:0.25rem 0.5rem;font-size:0.85rem}
      |th{background:#f0f0f0;text-align:left}
      |td.present{background:#c9f0c9}
      |td.null{background:#f6d6d6}
      |td.absent{background:#e0e0e0;color:#777}
      |.legend span{display:inline-block;margin-right:1rem;padding:0.1rem 0.5rem}
      |.legend .present{background:#c9f0c9}
      |.legend .null{background:#f6d6d6}
      |.legend .absent{background:#e0e0e0}
      |""".stripMargin

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def document(title: String, body: String): String =
    "<html><head><meta charset='utf-8'>" +
      s"<style>$Style</style><title>${esc(title)}</title></head><body><main>" +
      body + "</main></body></html>"

  /** The availability matrix in the reference's rendered shape, built from
    * the long task report `(task, item = identifier@group, metric = status,
    * value_str = present|null|absent)`. Cell → status class; a (group,
    * vector) pair the report never emitted renders `absent` (the reference
    * meaning: not assembled at all). Groups sort lexicographically —
    * deterministic across engines and runs.
    */
  def matrix(report: DataFrame, featureIds: Seq[String],
             targetIds: Seq[String]): String = {
    val cells = report
      .select("item", "value_str").collect()
      .map { r =>
        val item = r.getString(0)
        val at = item.indexOf('@')
        require(at > 0, s"matrix item without identifier@group shape: $item")
        ((item.substring(0, at), item.substring(at + 1)), r.getString(1))
      }.toMap
    val groups = cells.keysIterator.map(_._2).toSeq.distinct.sorted
    // report identifiers may be series-EXPANDED (`base__@key:...`); order
    // columns by the config's base-id order, expansions sorted within it
    val reportIds = cells.keysIterator.map(_._1).toSeq.distinct
    def expand(bases: Seq[String]): Seq[String] = bases.flatMap(b =>
      reportIds.filter(id => id == b ||
        id.startsWith(b + graft.pipeline.Series.IdSeparator)).sorted)
    val (featCols, targCols) = (expand(featureIds), expand(targetIds))

    def section(title: String, tableId: String, ids: Seq[String]): String =
      if (ids.isEmpty)
        s"<section><h2>${esc(title)}</h2><p>No data.</p></section>"
      else {
        val head = (s"<th>group</th>" +:
          ids.map(id => s"<th>${esc(id)}</th>")).mkString
        val body = groups.map { g =>
          val tds = ids.map { id =>
            val st = cells.getOrElse((id, g), "absent")
            s"<td class='${esc(st)}'>${esc(st)}</td>"
          }.mkString
          s"<tr><th>${esc(g)}</th>$tds</tr>"
        }.mkString
        s"<section><h2>${esc(title)}</h2><table id='${esc(tableId)}'>" +
          s"<thead><tr>$head</tr></thead><tbody>$body</tbody></table></section>"
      }

    document("Vector Availability",
      "<header><h1>Availability Matrix</h1>" +
        "<div class='legend'><span class='present'>Present</span>" +
        "<span class='null'>Null</span><span class='absent'>Absent</span>" +
        "</div></header>" +
        section("Feature Availability", "features", featCols) +
        section("Target Availability", "targets", targCols))
  }

  /** Generic bounded report table — the HTML twin of Runs.writeText for
    * every non-matrix task report.
    */
  def table(df: DataFrame, title: String, limit: Int = 100): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(limit).collect()
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      r.toSeq.map {
        case null => "<td></td>"
        case v => s"<td>${esc(v.toString)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString
    document(title,
      s"<header><h1>${esc(title)}</h1></header>" +
        s"<section><table><thead><tr>$head</tr></thead>" +
        s"<tbody>$body</tbody></table></section>")
  }
}
