package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the fastText-style learned
  * filter (Joulin et al. 2016; used as the quality gate in GPT-3 /
  * CCNet-descended corpus builds) that replaces the hand-weighted
  * [[TextAnalysis.qualityScore]] heuristic with logistic-regression
  * weights learned from labeled examples.
  *
  * Training is full-batch gradient descent coordinated by the driver:
  * each iteration computes the exact gradient in ONE distributed
  * aggregation (a fixed-width `sum(err·xⱼ)` per feature — no explode,
  * no shuffle beyond the final partial-merge), and the driver applies
  * the update to a dim-~6 weight vector. The model is tiny by
  * construction; the data never leaves the executors — the same
  * driver-held-smalls contract as the IVF centroid and PQ codebook
  * trainers. Iterations are Spark jobs, so cost is `iters` corpus
  * passes (default 30) — at 100 TB you train on a sample (quality
  * classifiers converge on thousands of rows, Joulin et al. §4) and
  * score the full corpus with the learned weights map-side.
  */
object QualityClassifier {

  /** Feature vector (bias + 5 bounded, roughly unit-scale text
    * features — all codegen'd Column expressions, one pass per row):
    * scaled length, punctuation ratio, English stopword ratio, scaled
    * average word length, distinct-token diversity. */
  def features(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val diversity = when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
    array(
      lit(1.0),
      least(length(text).cast("double") / 500.0, lit(2.0)),
      TextAnalysis.punctRatio(text),
      TextAnalysis.stopwordRatio(text),
      least(TextAnalysis.avgWordLen(text) / 10.0, lit(2.0)),
      diversity)
  }

  /** Raw margin w·x for a weight vector (positive ⇒ predicted good).
    * Weights ride as an array literal — broadcast once by Tungsten,
    * no join. */
  def margin(feat: Column, w: Array[Double]): Column =
    w.zipWithIndex.map { case (wi, j) =>
      element_at(feat, j + 1) * lit(wi)
    }.reduce(_ + _)

  /** Predicted probability σ(w·x). */
  def score(feat: Column, w: Array[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(feat, w)))

  /** Train logistic-regression weights by full-batch gradient descent.
    * `df` must carry `featCol: array<double>` (fixed width `dim`) and
    * `labelCol` in {0, 1}. One aggregation job per iteration; the
    * returned weights are the model. */
  def trainLogReg(df: DataFrame, featCol: String, labelCol: String,
      dim: Int, iters: Int = 30, lr: Double = 1.0): Array[Double] = {
    require(dim >= 1 && iters >= 1)
    val data = df.select(col(featCol).as("x"),
      col(labelCol).cast("double").as("y"))
    data.cache()
    try {
      val n = data.count().toDouble
      require(n > 0, "empty training set")
      var w = Array.fill(dim)(0.0)
      for (_ <- 0 until iters) {
        val err = score(col("x"), w) - col("y")
        val sums = data.agg(
          sum(err * element_at(col("x"), 1)).as("g0"),
          (2 to dim).map(j =>
            sum(err * element_at(col("x"), j)).as(s"g${j - 1}")): _*)
          .head()
        w = Array.tabulate(dim)(j => w(j) - lr / n * sums.getDouble(j))
      }
      w
    } finally data.unpersist()
  }

  /** Train on a BOUNDED driver-side sample — the production shape
    * (PQ-codebook precedent: tiny models converge on a sample; 50
    * distributed gradient jobs for a 6-weight model is a job storm).
    * The sample is content-hash-ordered on `idCol` (layout-independent,
    * plans as TakeOrderedAndProject — no global sort) and capped at
    * `maxTrain` rows (≤ maxTrain·dim doubles, a few MB); GD then runs
    * locally with zero further jobs. Same update rule as
    * [[trainLogReg]]; identical results whenever the corpus fits the
    * cap. */
  def trainLogRegSampled(df: DataFrame, featCol: String, labelCol: String,
      idCol: String, dim: Int, maxTrain: Int = 16384, iters: Int = 50,
      lr: Double = 2.0): Array[Double] = {
    require(dim >= 1 && iters >= 1 && maxTrain >= 1)
    val rows = df.select(col(featCol).as("x"), col(labelCol).cast("double").as("y"),
        xxhash64(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h"), col("x").cast("string")).limit(maxTrain)
      .select(col("x"), col("y")).collect()
    require(rows.nonEmpty, "empty training set")
    val xs = rows.map(_.getSeq[Double](0).toArray)
    val ys = rows.map(_.getDouble(1))
    val n = xs.length.toDouble
    var w = Array.fill(dim)(0.0)
    for (_ <- 0 until iters) {
      val g = Array.fill(dim)(0.0)
      var i = 0
      while (i < xs.length) {
        val x = xs(i)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += w(j) * x(j); j += 1 }
        val err = 1.0 / (1.0 + math.exp(-dot)) - ys(i)
        j = 0
        while (j < dim) { g(j) += err * x(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < dim) { w(j) -= lr / n * g(j); j += 1 }
    }
    w
  }

  /** Holdout accuracy of weights on a labeled frame — one job. */
  def accuracy(df: DataFrame, featCol: String, labelCol: String,
      w: Array[Double]): Double = {
    val correct = (margin(col(featCol), w) >= 0) ===
      (col(labelCol).cast("double") >= 0.5)
    val r = df.agg(sum(when(correct, 1L).otherwise(0L)).as("c"),
      count(lit(1)).as("n")).head()
    if (r.getLong(1) == 0) 1.0 else r.getLong(0).toDouble / r.getLong(1)
  }
}
