package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Regression for the lattice pathology that motivated
  * [[Sketches.kmvHashStrong]]: the affine-only [[Sketches.kmvHash]]
  * maps consecutive integer keys onto a lattice, so two overlapping
  * CONTIGUOUS key ranges can land their entire bottom-k sets in
  * disjoint hash intervals — keys 1–1000 vs 501–1500 share ZERO
  * bottom-256 hashes despite 500 common keys, which would make any
  * sketch-overlap estimator report zero intersection. The
  * square-then-affine scramble breaks the linearity and the shared
  * bottom-k hashes reappear. */
class DebugKmvSpec extends SparkSpec {

  private def sharedBottomK(hash: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Long = {
    val k = 256
    def bottom(lo: Long, hi: Long) =
      spark.range(lo, hi).toDF("k")
        .select(hash(col("k")).as("h"))
        .orderBy(col("h")).limit(k)
    bottom(1, 1001).join(bottom(501, 1501), Seq("h")).count()
  }

  test("kmvHash lattice: overlapping contiguous ranges share zero bottom-k hashes") {
    // the documented pathology — if this ever becomes non-zero the
    // scaladoc's "measured: ZERO shared" claim needs re-verifying
    assert(sharedBottomK(Sketches.kmvHash) === 0L,
      "affine-only kmvHash was expected to exhibit the disjoint-lattice pathology")
  }

  test("kmvHashStrong breaks the lattice: shared bottom-k hashes reappear") {
    // 500 common keys out of 1000 per side: a well-mixed hash puts
    // ~half of each bottom-256 on common keys, and a common key in
    // A's bottom-k has high probability of making B's bottom-k too —
    // assert a conservative floor, not the exact expectation
    val shared = sharedBottomK(Sketches.kmvHashStrong)
    assert(shared >= 40L,
      s"kmvHashStrong bottom-256 overlap collapsed to $shared (< 40) — lattice regression?")
  }
}
