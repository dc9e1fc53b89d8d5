package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (Morton order) and matches a reference impl") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 0L),
      (0L, 255L), (123L, 45L), (65535L, 65535L))
    val got = cases.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => morton(x, y, 16) })
  }

  test("z-ordered layout: a 2-D range filter reads few files; a random " +
      "layout reads nearly all") {
    val n = 100
    val grid = spark.range(0, n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"),
        col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_zspec").toString

    Layout.zOrderWrite(grid, "x", "y", s"$base/zordered", numFiles = 16)
    grid.repartition(16).write.parquet(s"$base/random")

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x") < 10 && col("y") < 10)
        .select(input_file_name()).distinct().count()

    // the query rectangle [0,10)x[0,10) is 1% of the z-range and sits in
    // one contiguous z-interval prefix -> at most a couple of range
    // partitions; under random placement its 100 rows land everywhere
    val zFiles = filesTouched(s"$base/zordered")
    val rFiles = filesTouched(s"$base/random")
    assert(zFiles <= 4, s"z-ordered read touched $zFiles files")
    assert(rFiles >= 8, s"random read touched only $rFiles files")

    // contents identical regardless of layout
    val a = spark.read.parquet(s"$base/zordered").orderBy("payload")
      .as[(Long, Long, Long)].collect().toSeq
    val b = spark.read.parquet(s"$base/random").orderBy("payload")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("zValueN: 3-D interleave matches a reference impl; 2-D case equals zValue") {
    def mortonN(vs: Seq[Long], bits: Int): Long = {
      val k = vs.size
      (for (j <- vs.indices; i <- 0 until bits)
        yield ((vs(j) >> i) & 1L) << (i * k + j)).reduce(_ | _)
    }
    val cases = Seq(Seq(0L, 0L, 0L), Seq(1L, 2L, 3L), Seq(7L, 0L, 5L),
      Seq(1023L, 1023L, 1023L))
    val got = cases.map(c => (c(0), c(1), c(2))).toDF("a", "b", "c")
      .select(Layout.zValueN(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map(mortonN(_, 10)))
    // 2-D zValueN == zValue (same bit layout)
    val two = Seq((3L, 5L), (123L, 45L)).toDF("x", "y")
      .select(Layout.zValueN(Seq(col("x"), col("y")), 16).as("zn"),
        Layout.zValue(col("x"), col("y"), 16).as("z2"))
      .as[(Long, Long)].collect()
    assert(two.forall { case (a, b) => a == b })
  }

  test("3-D z-ordered layout skips files on a 3-D range filter") {
    val n = 32
    val grid = spark.range(0, n.toLong * n * n)
      .select((col("id") % n).as("x"),
        ((col("id") / n) % n).cast("long").as("y"),
        (col("id") / (n * n)).cast("long").as("z3"),
        col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_zn").toString
    Layout.zOrderWriteN(grid, Seq("x", "y", "z3"), s"$base/zn", numFiles = 16, bits = 10)
    val touched = spark.read.parquet(s"$base/zn")
      .filter(col("x") < 8 && col("y") < 8 && col("z3") < 8)
      .select(input_file_name()).distinct().count()
    assert(touched <= 4, s"3-D z-ordered read touched $touched files")
    assert(spark.read.parquet(s"$base/zn").count() == n.toLong * n * n)
  }

  test("gridScale clamps to [0, 2^bits) and spreads min..max linearly") {
    val vals = Seq(-5.0, 0.0, 50.0, 100.0, 105.0).toDF("v")
      .select(Layout.gridScale(col("v"), 0.0, 100.0, 8).as("g"))
      .as[Long].collect().toSeq
    assert(vals.head == 0L && vals(1) == 0L && vals.last == 255L)
    assert(vals(2) == 127L && vals(3) == 255L)
  }
}
