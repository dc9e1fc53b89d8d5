package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration, via the shared session (SparkSpec
  * enables GraftExtensions — extensions can only be applied at
  * session creation, so every suite shares the extended session). */
class GraftExtensionsSpec extends graft.SparkSpec {

  test("native expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT
         float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
                       array(cast(3.0 as float), cast(4.0 as float))) AS d,
         float_vec_cosine(array(cast(1.0 as float), cast(0.0 as float)),
                          array(cast(1.0 as float), cast(0.0 as float))) AS c,
         simhash64(array('hello', 'world')) AS s,
         minhash_signature(array('a b c', 'b c d'), 4, 42) AS m,
         hyperplane_sig(array(cast(0.5 as float), cast(-0.5 as float)), 2, 8, 42) AS h
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getSeq[Long](3).length == 4)
  }

  test("float_vec_l2_normalize from SQL yields a unit vector") {
    val r = spark.sql(
      """SELECT float_vec_l2_normalize(
           array(cast(3.0 as float), cast(4.0 as float))) AS n""").head()
    val n = r.getSeq[Double](0)
    assert(math.abs(n(0) - 0.6) < 1e-12 && math.abs(n(1) - 0.8) < 1e-12)
  }

  test("SQL and Column APIs agree") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT float_vec_cosine(a, b) FROM vecs").as[Double].head()
    val viaCol = df.select(graft.functions.VectorFunctions.cosine($"a", $"b"))
      .as[Double].head()
    assert(viaSql == viaCol)
  }
}
