package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-bounded string join via deletion-neighborhood
  * blocking (map-forward: the reference has no fuzzy matching; this is
  * the standard scalable shape for typo-level entity resolution over
  * crawled names/titles — FastSS-style deletion variants, Bocek et al.
  * 2007).
  *
  * Candidate generation is EXACT-recall for Levenshtein ≤ 1: two
  * strings within distance 1 always share a blocking key from
  * `{s} ∪ del1(s)` —
  *  - substitution at i: deleting position i from both sides yields
  *    the same string;
  *  - insertion/deletion: the shorter string IS a deletion variant of
  *    the longer (and is itself a key);
  *  - equal strings share `s`.
  * A `levenshtein` verify then drops the collisions that are really
  * distance 2 (two different deletions meeting at the same variant).
  *
  * Scale shape: key generation is map-side (length+1 short keys per
  * row), the join is an equi-join on the key — hash-partitioned, no
  * cross product anywhere — and verification touches only candidate
  * pairs. Key-group sizes are bounded by the alphabet at the deleted
  * position, so no quadratic bucket blow-up on natural name data; a
  * pathological all-equal-strings corpus degrades to its true
  * duplicate-pair output, which no exact algorithm can beat. */
object FuzzyJoin {

  /** `{s} ∪ del1(s)`: the string plus every single-character deletion.
    * Pure Column expression (codegen'd), no UDF. Empty strings get
    * just themselves (sequence(1,0) would generate a DESCENDING range,
    * not an empty one). */
  def deletionKeys(s: Column): Column =
    when(length(s) > 0,
      array_union(
        array(s),
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - lit(1)),
            s.substr(i + lit(1), length(s))))))
      .otherwise(array(s))

  /** Self-join: all id-ordered pairs with Levenshtein(s1, s2) ≤ 1.
    * Strings ride along through the key join — they are short by
    * contract (names/titles); for long-string corpora dedup the id
    * pairs first and join the payload back, as the LSH dedup path
    * does. */
  def selfJoinWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("key", explode(deletionKeys(col("s"))))
    val a = keyed.select(col("id").as("id1"), col("s").as("s1"), col("key"))
    val b = keyed.select(col("id").as("id2"), col("s").as("s2"), col("key"))
    a.join(b, Seq("key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("s1"), col("s2"))
      .distinct()
      .filter(levenshtein(col("s1"), col("s2")) <= 1)
  }

  /** Fellegi–Sunter match scoring (Fellegi & Sunter 1969, the
    * probabilistic-record-linkage framework every entity-resolution
    * system descends from): each field comparison contributes its
    * log-odds weight — log(m/u) on agreement, log((1−m)/(1−u)) on
    * disagreement, where m = P(agree | same entity) and
    * u = P(agree | different entities) — and the pair's total score
    * ranks match likelihood.
    *
    * Weights are taken as INTEGER log-odds inputs rather than raw
    * m/u probabilities: callers pick parameters whose odds ratios
    * are powers of two (m/u = 8 → +3, (1−m)/(1−u) = ½ → −1), so the
    * whole score is exact integer arithmetic that replays in any
    * engine — runtime logs would pin the gate to one libm. (EM
    * estimation of m/u from unlabeled pairs is a separate training
    * concern; production linkage commonly runs reviewed, fixed
    * weights exactly like this.)
    *
    * `fields` supplies (agreement-predicate, wAgree, wDisagree) —
    * the predicate is any Column (exact equality, levenshtein ≤ 1,
    * same-decile numeric band…), evaluated map-side over candidate
    * pairs that a blocking join already bounded (the
    * [[selfJoinWithin1]] / q_f16 shape; never all n² pairs).
    * Appends `fs_score` to the pair rows. */
  def fellegiSunter(pairs: DataFrame,
      fields: Seq[(Column, Int, Int)]): DataFrame = {
    require(fields.nonEmpty, "at least one field comparison required")
    val score = fields.map { case (agree, wa, wd) =>
      when(agree, lit(wa.toLong)).otherwise(lit(wd.toLong)) }
      .reduce(_ + _)
    pairs.withColumn("fs_score", score)
  }
}
