package graft

import graft.engine.ml.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 population-fidelity stress for the dedup/ANN family (r10
  * verdict #5): the standing ScalaTest gates use FIXED planted
  * duplicates; these fixtures are adversarial — near-threshold Jaccard
  * pairs across the LSH s-curve knee, a degenerate boilerplate family
  * that floods one band bucket, and line-correlated embedding
  * dimensions that stress the IVF quantizer. Measured recall per
  * regime is asserted against documented floors and the s-curve
  * theory; the measured curves are recorded in BASELINE.md.
  */
class AdversarialRecallSpec extends AnyFunSuite with SparkFixture {

  private def randText(rnd: scala.util.Random, len: Int): String =
    (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  private def mutate(rnd: scala.util.Random, s: String,
      k: Int): String = {
    val arr = s.toCharArray
    (0 until k).foreach { _ =>
      arr(rnd.nextInt(arr.length)) = ('a' + rnd.nextInt(26)).toChar
    }
    new String(arr)
  }

  test("LSH candidate recall tracks the 4x8 s-curve on " +
      "near-threshold Jaccard pairs") {
    val rnd = new scala.util.Random(7)
    val bases = (0 until 40).map(i => (i.toLong, randText(rnd, 300)))
    // mutation sweep spanning true Jaccard ~0.45..0.97
    val ks = Seq(2, 4, 7, 11, 16, 24, 36, 55)
    val variants = for {
      (id, text) <- bases; (k, ki) <- ks.zipWithIndex
    } yield (10000L + id * 10 + ki, mutate(rnd, text, k), id)
    val spark2 = spark
    import spark2.implicits._
    val corpus = (bases.map { case (id, t) => (id, t) } ++
      variants.map(v => (v._1, v._2))).toDF("doc_id", "text")
    val state = Dedup.signatures(corpus)
    val candidates = Dedup.lshCandidates(state)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // true Jaccard of every planted pair from the exact verifier
    val plantedPairs = variants.map(v => (v._3, v._1)).toDF(
      "doc_a", "doc_b")
    val trueJ = Dedup.jaccardVerify(plantedPairs, state, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getDouble(2))).toMap
    assert(trueJ.size == variants.size)
    // bucket by true J; compare measured candidate recall to the
    // theoretical 1-(1-J^8)^4 at the bucket's mean J
    val buckets = trueJ.toSeq.groupBy { case (_, j) =>
      (j * 10).toInt.min(9) }
    var curve = List.empty[String]
    for ((b, xs) <- buckets.toSeq.sortBy(_._1) if xs.size >= 10) {
      val jMean = xs.map(_._2).sum / xs.size
      val hit = xs.count { case (p, _) => candidates.contains(p) }
      val recall = hit.toDouble / xs.size
      val theory = 1.0 - math.pow(1.0 - math.pow(jMean, 8), 4)
      curve ::= f"J=$jMean%.2f n=${xs.size} recall=$recall%.2f " +
        f"theory=$theory%.2f"
      assert(math.abs(recall - theory) < 0.3,
        s"bucket $b: recall $recall vs s-curve $theory ($curve)")
    }
    info(s"measured s-curve: ${curve.reverse.mkString("; ")}")
    // hard gates at the extremes of the knee
    val high = trueJ.filter(_._2 >= 0.93).keys.toSeq
    val low = trueJ.filter(_._2 <= 0.55).keys.toSeq
    assert(high.nonEmpty && low.nonEmpty)
    assert(high.count(candidates.contains).toDouble / high.size >= 0.85,
      "above-knee (J>=0.93) recall must be >= 0.85")
    assert(low.count(candidates.contains).toDouble / low.size <= 0.35,
      "below-knee (J<=0.55) candidate rate must stay <= 0.35")
    // the full pipeline is EXACT above threshold: no pair below the
    // verify threshold survives, regardless of banding luck
    val found = Dedup.nearMinHash(corpus, 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getDouble(2))).toMap
    found.foreach { case (p, j) =>
      assert(j >= 0.8, s"pair $p passed verify with J=$j < 0.8") }
  }

  test("hot-bucket cap drops the degenerate boilerplate family but " +
      "keeps disjoint planted pairs") {
    val rnd = new scala.util.Random(13)
    val boiler = randText(rnd, 300)
    // 120 byte-identical boilerplate docs -> every band bucket holds
    // all 120 entries
    val degenerate = (0 until 120).map(i => (i.toLong, boiler))
    val bases = (0 until 30).map(i => (200L + i, randText(rnd, 300)))
    val variants = bases.map { case (id, t) =>
      (id + 100, mutate(rnd, t, 3), id) }
    val spark2 = spark
    import spark2.implicits._
    val corpus = (degenerate ++ bases ++
      variants.map(v => (v._1, v._2))).toDF("doc_id", "text")
    val state = Dedup.signatures(corpus)
    val acc = Dedup.droppedBuckets(spark)
    val before = acc.value
    val candidates = Dedup.lshCandidates(state, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = acc.value - before
    // the 4 degenerate band buckets (120 entries each) must be dropped
    assert(dropped >= 400,
      s"expected >=400 dropped hot-bucket entries, saw $dropped")
    // and the candidate set must NOT contain the 120*119/2 explosion
    val degeneratePairs = candidates.count { case (a, b) =>
      a < 120 && b < 120 }
    assert(degeneratePairs == 0,
      s"$degeneratePairs degenerate pairs leaked past the cap")
    // disjoint planted pairs (other buckets) keep their recall
    val planted = variants.map(v => (v._3, v._1)).toSet
    val recall = planted.count(candidates.contains).toDouble /
      planted.size
    info(f"planted recall under hot-bucket cap: $recall%.2f")
    assert(recall >= 0.85,
      s"cap damaged disjoint-bucket recall: $recall")
  }

  private def embDf(vecs: Seq[(Long, Array[Float])]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    vecs.map { case (id, v) => (id, (id % 5).toString, v.toSeq) }
      .toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def recallOf(emb: DataFrame): Double = {
    val probes = Similarity.probes(emb)
    val exact = Similarity.bruteForceTopK(emb, probes, 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, probes, 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.count(ivf.contains).toDouble / exact.size
  }

  test("IVF recall floors hold on line-correlated dimensions") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val u = Array.fill(dim)(1.0 / math.sqrt(dim))
    // adversarial: every vector is t*u + small noise — all variance
    // on ONE axis, so the kmeans cells collapse along a line and
    // neighboring cells hold the true neighbors
    val correlated = (0 until 400).map { i =>
      val t = rnd.nextDouble() * 10.0
      (i.toLong, u.map(x =>
        (t * x + rnd.nextGaussian() * 0.05).toFloat))
    }
    // control: isotropic gaussian
    val isotropic = (0 until 400).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val rCor = recallOf(embDf(correlated))
    val rIso = recallOf(embDf(isotropic))
    info(f"IVF recall: correlated=$rCor%.2f isotropic=$rIso%.2f " +
      "(16 cells, 6 probed, top-5 vs brute force)")
    assert(rIso >= 0.7, s"isotropic IVF recall $rIso below 0.7")
    // round-12 spherical+shrinkage quantizer raised this floor from
    // 0.5 (r11 measured 0.68) to 0.8; round 13 locks the gain at 0.9
    // (r12/r13 measured 1.00 — the r12 verdict's directive #5)
    assert(rCor >= 0.9, s"correlated-dims IVF recall $rCor below 0.9")
  }

  test("IVF recall floor holds on the composite clustered AND " +
      "line-correlated fixture") {
    // The two conditioning regimes pull the quantizer in OPPOSITE
    // directions: full 1/sqrt(lambda) whitening fixes a dominant
    // correlated axis but CRUSHES the between-cluster axes cells
    // should follow (r12 measured 0.60 on clustered vs the 0.70
    // gate), while no whitening leaves the dominant axis eating the
    // cell budget. This fixture has BOTH pathologies at once — label
    // clusters riding a shared dominant line — so the landed
    // spherical + shrinkage compromise (ridge 4x mean eigenvalue) is
    // pinned by a test rather than by lore: either extreme fails it.
    val rnd = new scala.util.Random(13)
    val dim = 16
    val u = Array.fill(dim)(1.0 / math.sqrt(dim))
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 2.0))
    val composite = (0 until 400).map { i =>
      val c = centers(i % 8)
      val t = rnd.nextDouble() * 10.0 // dominant shared line
      (i.toLong, (0 until dim).map(d =>
        (c(d) + t * u(d) + rnd.nextGaussian() * 0.05).toFloat).toArray)
    }
    val r = recallOf(embDf(composite))
    info(f"IVF recall: composite clustered+correlated=$r%.2f " +
      "(16 cells, 6 probed, top-5 vs brute force)")
    assert(r >= 0.8, s"composite clustered+correlated recall $r below 0.8")
  }
}
