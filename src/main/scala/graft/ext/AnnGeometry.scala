package graft.ext

/** The q_n21 kNN-graph gate's index geometry, shared by the gate
  * (`SparkEntry."q_n21_knn_graph"`), the raw-recall instrument
  * ([[graft.RecallProbe]]) and the NN-descent face — one derivation,
  * so a formula change cannot leave the probe silently measuring a
  * different index than the gate asserts (the round-11 advice item).
  *
  * The formulas and their reasoning (SparkEntry carries the full
  * cost derivation in the gate's comment):
  *  - exact-baseline queries are a FIXED-COUNT (~2000) deterministic
  *    stride sample, so the brute-force measuring stick stays O(N)
  *    at any corpus size;
  *  - IVF cells scale ~√N (faiss nlist convention), clamped to
  *    [16, 4096], balancing assignment (N·nCells) against probe
  *    (N·nprobe·N/nCells) — both ~N^1.5;
  *  - nprobe grows only logarithmically in nCells (constant FRACTION
  *    would be quadratic total work), floor 2;
  *  - LSH band width auto-scales so bucket occupancy stays ~constant
  *    (~64 per band): bits-per-band ≈ log₂(n/64), bands·bits clamped
  *    to one 64-bit signature word.
  */
object AnnGeometry {

  /** Stride for the fixed-count (~2000 queries) exact-baseline
    * sample: `vec_id % sampleEvery(n) == 0`. */
  def sampleEvery(n: Long): Long = math.max(1L, n / 2000L)

  /** IVF cell count: ⌈√N⌉ clamped to [16, 4096]. */
  def nCells(n: Long): Int = math.min(4096,
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Probe width: ⌈log₂ nCells⌉, floor 2. */
  def nprobe(nCells: Int): Int = math.max(2,
    math.ceil(math.log(nCells.toDouble) / math.log(2.0)).toInt)

  /** Auto-scaled LSH signature width (total bits across `bands`
    * bands): bands × max(4, ⌈log₂(n/64)⌉) clamped to 64 — the same
    * formula [[Similarity.knnGraph]] applies when `nBits = 0`. */
  def lshBits(n: Long, bands: Int = 4): Int = {
    val bitsPerBand = math.max(4,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 64)))
    math.min(64, bands * bitsPerBand)
  }
}
