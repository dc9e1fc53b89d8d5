package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering for the store's large tables.
  *
  * The reference's tables are small enough that layout never matters
  * (notebook/Edits.ipynb loads tens of rows); at 100 TB the dominant
  * cost of a selective scan is how many files/row-groups the filter
  * can skip. Hive partitioning (GraphStore.writeNodesPartitioned)
  * prunes on ONE low-cardinality column; Z-ordering clusters on TWO
  * numeric columns at once, so parquet min/max stats make row-groups
  * (and whole files) skippable for range predicates on EITHER or BOTH
  * dimensions — the standard lakehouse data-skipping layout.
  */
object Layout {

  /** Morton (Z-order) value: interleave the low `bits` bits of two
    * non-negative integer columns (x in even positions, y in odd).
    * Pure Column expression — codegen'd, no UDF; 2·bits shift/mask
    * terms that constant-fold into one projection. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton value: bit i of dimension j lands at
    * position i·k + j (k = number of dimensions). [[zValue]] is the
    * k = 2 case with (x, y) ordering preserved. Bits per dimension
    * shrink as k grows (k·bits ≤ 63). */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 1 && k * bits <= 63, s"need k*bits <= 63, got $k*$bits")
    val terms = for {
      (c, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale a numeric column linearly onto the integer grid
    * [0, 2^bits): the normalization step before bit interleaving.
    * min/max are passed in (one tiny agg job computes both for both
    * dimensions — see [[zOrderWrite]]); constant denominators keep the
    * expression codegen-friendly. */
  def gridScale(c: Column, min: Double, max: Double, bits: Int): Column = {
    val span = math.max(max - min, Double.MinPositiveValue)
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) / lit(span) * lit((1L << bits) - 1))))
      .cast("long")
  }

  /** Write `df` to parquet Z-ordered on two numeric columns: one agg
    * job for the min/max of both dims, then range-repartition + sort
    * by the Morton value so consecutive files hold spatially adjacent
    * (x, y) rectangles. Range predicates on either column then skip
    * most files via ordinary parquet min/max stats — no index
    * structure, no extra read-path code; `spark.read.parquet` gets
    * the benefit through plain pushed filters.
    *
    * At cluster scale `numFiles` should target the usual 128 MB-1 GB
    * per file; the repartitionByRange sampling cost is one pass. */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val (xMin, xMax, yMin, yMax) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    val z = zValue(
      gridScale(col(xCol), xMin, xMax, bits),
      gridScale(col(yCol), yMin, yMax, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** N-dimensional [[zOrderWrite]]: one agg job for all dims' min/max,
    * then range-repartition + sort on the interleaved value. */
  def zOrderWriteN(df: DataFrame, dims: Seq[String], path: String,
      numFiles: Int, bits: Int = 10): Unit = {
    val aggs = dims.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = dims.zipWithIndex.map { case (c, j) =>
      gridScale(col(c), stats.getDouble(2 * j), stats.getDouble(2 * j + 1), bits)
    }
    df.withColumn("__z", zValueN(scaled, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Read back a Z-ordered dataset (plain parquet read — the layout
    * does the work through pushed filters + row-group stats). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
