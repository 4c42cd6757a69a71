package graft.engine.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared label-centroid machinery for the embedding cluster-metric
  * family (vec_cluster_purity, ml_adjusted_rand,
  * vec_silhouette_simplified, vec_davies_bouldin,
  * vec_calinski_harabasz): one place owns the 64-way explode, the
  * exact DECIMAL(20,10) centroid means, the ordered centroid arrays,
  * and the broadcast zip_with distance fold — so a change to the
  * centroid discipline (dim count, decimal scale, tie-break) lands in
  * every consumer at once instead of drifting across inline copies.
  *
  * Scale contract: `dims` is the one corpus-sized explode exchange
  * (at 100 TB the same aggregate runs as a treeAggregate over 64-float
  * buffers — same results); everything built on it is K×dims-sized.
  * `distToCentroids` never explodes — the centroid arrays broadcast
  * against the un-exploded embedding stream and the per-row distance
  * is a sequential HOF double fold (fixed IEEE order, identical in
  * both engines).
  */
object Centroids {

  /** (vec_id, label, i, v): 1-based dimension index, double value. */
  def dims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("vec_id"), col("label"), (col("p") + 1).as("i"),
        col("v").cast("double").as("v"))

  /** (clabel, i, c): per-label per-dim mean from exact DECIMAL(20,10)
    * sums — deterministic regardless of partitioning/add order. */
  def labelCentroids(emb: DataFrame): DataFrame =
    dims(emb).groupBy(col("label").as("clabel"), col("i"))
      .agg((sum(col("v").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1))).as("c"))

  /** (clabel, cvec): each centroid assembled as ONE ordered array
    * (|labels| rows) ready to broadcast. */
  def centroidVecs(emb: DataFrame): DataFrame =
    labelCentroids(emb)
      .groupBy("clabel")
      .agg(expr("transform(sort_array(collect_list(struct(i, c))), " +
        "s -> s.c)").as("cvec"))

  /** (vec_id, label, clabel, d2): squared L2 distance from every
    * embedding to every label centroid — broadcast join + sequential
    * per-row fold, no 64× explode join. */
  def distToCentroids(emb: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroidVecs(emb)))
      .select(col("vec_id"), col("label"), col("clabel"),
        expr("""aggregate(zip_with(embedding, cvec,
                  (x, y) -> (cast(x AS double) - y) *
                            (cast(x AS double) - y)),
                0.0D, (a, v) -> a + v)""").as("d2"))
}
