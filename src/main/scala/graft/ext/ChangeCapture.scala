package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture face between two
  * versions of a keyed table (the batch analog of a CDC feed, and the
  * operator an incremental pipeline uses to propagate only deltas
  * downstream instead of reprocessing the full corpus).
  *
  * One full-outer shuffle join on the key; the change classification
  * is a projection over the join's null pattern plus a column-wise
  * comparison. At 100 TB both snapshots shuffle once on the key — if
  * the snapshots share a bucketed layout on that key (store bucketing,
  * GraphStore precedent) the exchange is elided entirely.
  */
object ChangeCapture {

  /** Rows that differ between snapshots, classified as
    * op = 'I' (insert: key only in `newDf`), 'D' (delete: key only in
    * `oldDf`), or 'U' (update: key in both, any compare column
    * differs, null-safe). Unchanged rows are dropped. Output:
    * key columns + op. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__old", lit(1))
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__new", lit(1))
    val renamedN = compareCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    val joined = o.join(renamedN, keyCols, "full_outer")
    val changed: Column = compareCols
      .map(c => !(col(c) <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(keyCols.map(col) :+
        when(col("__old").isNull, "I")
          .when(col("__new").isNull, "D")
          .when(changed, "U")
          .otherwise("=").as("op"): _*)
      .filter(col("op") =!= "=")
  }
}
