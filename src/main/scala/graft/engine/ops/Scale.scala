package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-scale layout and skew helpers — the knobs a 100 TB deployment
  * turns that a laptop run never needs, kept as library verbs so
  * pipelines declare intent instead of hand-tuning:
  *
  *  - '''Bucketing''': write both sides of a recurring large-large join
  *    bucketed+sorted on the join key → the join compiles with NO
  *    exchange on either side (asserted in ScaleSpec).
  *  - '''Salting''': a skewed aggregation key (one user/domain with 10⁹
  *    rows) hot-spots a single reducer; two-phase salted aggregation
  *    spreads phase one over `numSalts` reducers. AQE's skew-join
  *    splitting handles *join* skew; aggregation skew is ours to solve.
  */
object Scale {

  /** Write `df` as a bucketed, sorted table (hive-style layout in the
    * session warehouse). Both sides of a co-located join must use the
    * same bucket count and keys. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Two-phase salted sum: phase 1 aggregates on (keys ++ salt) so a
    * skewed key's rows land on `numSalts` reducers; phase 2 combines the
    * partials. Decimal-exact, so the result is identical to the direct
    * aggregation regardless of salt fan-out. The salt derives from a
    * hash of the whole row (deterministic), not rand(). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
      scale: Int, numSalts: Int = 16): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(numSalts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueCol.cast(dec)).as("_partial"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).cast(dec).as("total"))
  }

  /** Distributive 2D skyline (Pareto frontier, maximizing both
    * dimensions): each partition computes its local skyline with an
    * in-memory sort-scan, then the (tiny) union is re-skylined. Result
    * is partitioning-invariant because skylines are distributive:
    * skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)). This is the
    * 100 TB form of the single-window `skyline_2d` query. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // explicit encoder: TypeTag-based derivation breaks under REPL /
    // notebook classloaders, and this verb should work there too
    implicit val enc: org.apache.spark.sql.Encoder[(Double, Double)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble)
    def localSkyline(it: Iterator[(Double, Double)]): Iterator[(Double, Double)] = {
      val pts = it.toArray.distinct
        .sortBy { case (x, y) => (-x, -y) }
      val out = Array.newBuilder[(Double, Double)]
      var maxY = Double.NegativeInfinity
      pts.foreach { case (x, y) =>
        if (y > maxY) { out += ((x, y)); maxY = y }
      }
      out.result().iterator
    }
    df.select(col(xCol).cast("double"), col(yCol).cast("double"))
      .as[(Double, Double)]
      .mapPartitions(localSkyline)   // parallel local pass
      .repartition(1)
      .mapPartitions(localSkyline)   // tiny global pass
      .toDF(xCol, yCol)
  }

  /** Range-repartition by a sort key before a sorted write — the layout
    * that makes downstream range predicates prune files. */
  def writeSortedByRange(df: DataFrame, path: String, sortCols: Seq[String],
      partitions: Int): Unit =
    df.repartitionByRange(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
}
