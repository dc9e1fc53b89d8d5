package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus line deduplication (driver extension, SURVEY §7
  * module 6): the C4-style cleanup that keeps only the globally-first
  * occurrence of every distinct line and reassembles each document
  * from its surviving lines — boilerplate (nav bars, license
  * headers, cookie banners) repeated across millions of pages
  * disappears from all but one document.
  *
  * Scale design: two shuffles total — one keyed on the line value
  * (first-occurrence election via a min-struct aggregate: partial
  * map-side combine, no window sort over the full line set), one on
  * the document id for reassembly. Line payloads can be widened to
  * hashes if lines are huge; here the line text itself is the key so
  * the kept line needs no second lookup.
  */
object LineDedup {

  /** Exploded view: one row per (doc, position, line). */
  def lines(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("line_no", "line")))

  /** First global occurrence of each distinct line: the minimum
    * (doc id, position) pair, lexicographically.
    * @return (line, idCol, line_no)
    */
  def firstOccurrences(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame =
    lines(docs, idCol, textCol, sep)
      .groupBy(col("line"))
      .agg(min(struct(col(idCol), col("line_no"))).as("f"))
      .select(col("line"), col(s"f.$idCol").as(idCol),
        col("f.line_no").as("line_no"))

  /** Dedup + reassembly: each document rebuilt from only the lines
    * whose first global occurrence it owns, in original order.
    * Documents left with zero lines are dropped (C4 semantics).
    *
    * @return (idCol, textCol)
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame =
    firstOccurrences(docs, idCol, textCol, sep)
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
          x => x.getField("line")),
        sep).as(textCol))
}
