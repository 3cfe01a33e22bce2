package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** S8 — text-report sink (红楼梦作者分析.py:412-424, 猫狗大战分类.py:566-567): the
  * reference writes small human-readable summaries of collected results.
  * Deliberately driver-side — the input must already be a SMALL result table
  * (the collect is the contract); big outputs use the CSV/parquet sinks.
  */
object Reports {

  /** Render a small result frame as an aligned text table and write it. */
  def writeTextReport(df: DataFrame, path: String, title: String, maxRows: Int = 1000): Unit = {
    val rows = df.limit(maxRows).collect()
    val header = df.columns.toSeq
    val cells = header +: rows.toSeq.map(r =>
      header.indices.map(i => if (r.isNullAt(i)) "null" else r.get(i).toString))
    val widths = header.indices.map(i => cells.map(_(i).length).max)
    val lines = cells.map(row =>
      row.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("  "))
    val text = (Seq(title, "=" * title.length) ++ lines).mkString("\n") + "\n"
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), text)
  }
}
