package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, profiling part 3 — vocabulary
  * overlap and functional dependencies (see PinsAbSpec for the
  * discipline).
  */
class PinsProfile3Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("profile_vocab_overlap matches direct per-language Jaccard") {
    val vocab = Tables.documents(spark, sf)
      .select(col("lang"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ", -1)).toSet).toMap
    val langs = vocab.keys.toSeq.sorted
    val rows = q("profile_vocab_overlap").collect()
    val expected = for {
      i <- langs.indices; j <- (i + 1) until langs.length
      common = vocab(langs(i)).intersect(vocab(langs(j))).size
      if common > 0
    } yield (langs(i), langs(j), common)
    assert(rows.length == expected.length)
    for (r <- rows) {
      val a = r.getAs[String]("lang_a"); val b = r.getAs[String]("lang_b")
      val common = vocab(a).intersect(vocab(b)).size
      assert(r.getAs[Long]("n_a") == vocab(a).size)
      assert(r.getAs[Long]("n_b") == vocab(b).size)
      assert(r.getAs[Long]("n_common") == common)
      assert(math.abs(r.getAs[Double]("jaccard") -
        common.toDouble / vocab(a).union(vocab(b)).size) < 1e-3)
    }
  }

  test("profile_functional_dep matches direct determinant checks") {
    val rows = q("profile_functional_dep").collect()
    assert(rows.length == 4)
    def check(name: String, pairs: Array[(String, String)]): Unit = {
      val det = pairs.distinct.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.size)
      val violating = det.count(_._2 > 1)
      val r = rows.find(_.getAs[String]("candidate") == name).get
      assert(r.getAs[Long]("n_det") == det.size, name)
      assert(r.getAs[Long]("n_violating") == violating, name)
      assert(r.getAs[Boolean]("fd_holds") == (violating == 0), name)
    }
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    check("orders: o_orderkey->o_custkey", ord.map(x => (x._1, x._2)))
    check("orders: o_custkey->o_orderpriority",
      ord.map(x => (x._2, x._3)))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("string"), col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    check("customer: c_custkey->c_mktsegment", cust)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("string"), col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    check("lineitem: l_partkey->l_returnflag", li)
  }

  test("profile_cardinality_curve sample NDVs are consistent") {
    // structural pin: the three deterministic md5 slices must be
    // nested (1% ⊆ 10% ⊆ 100%) so NDV must be monotone, and the
    // 100% NDV must equal the exact distinct count
    val exact = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    val rows = q("profile_cardinality_curve").collect()
    val byPct = rows.map(r => (r.getAs[Int]("pct"),
      r.getAs[Long]("ndv"))).toMap
    assert(byPct(100) == exact)
    assert(byPct(1) <= byPct(10) && byPct(10) <= byPct(100))
    for (r <- rows) {
      assert(r.getAs[Long]("ndv_true") == exact)
      assert(math.abs(r.getAs[Double]("naive_scaleup") -
        r.getAs[Long]("ndv") * 100.0 / r.getAs[Int]("pct")) < 1e-2)
    }
  }
}
