package graft.engine.ml
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit gates for the round-12 numerical kernel behind the
  * spherical quantizer: the cyclic-Jacobi eigendecomposition and the
  * shrinkage whitener. These are exercised indirectly by every IVF
  * recall gate; here the LINEAR-ALGEBRA contracts are pinned — an
  * eigensolver that converges to slightly-wrong vectors could still
  * pass recall floors while silently degrading conditioning.
  */
class WhitenSpec extends AnyFunSuite {

  private def matMul(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a.length, b.head.length)((i, j) =>
      a(i).indices.map(k => a(i)(k) * b(k)(j)).sum)

  private def transpose(a: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a.head.length, a.length)((i, j) => a(j)(i))

  private def rndSym(d: Int, seed: Int): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    val m = Array.fill(d, d)(r.nextGaussian())
    Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
  }

  test("jacobiEigen reconstructs A = V diag(l) V^T with orthonormal V") {
    for (seed <- Seq(1, 7, 42); d <- Seq(3, 8, 16)) {
      val a = rndSym(d, seed)
      val (evals, v) = Similarity.jacobiEigen(a)
      // orthonormal columns
      val vtv = matMul(transpose(v), v)
      for (i <- 0 until d; j <- 0 until d)
        assert(math.abs(vtv(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-9,
          s"V^T V [$i][$j] off at d=$d seed=$seed")
      // reconstruction
      val lam = Array.tabulate(d, d)((i, j) =>
        if (i == j) evals(i) else 0.0)
      val rec = matMul(matMul(v, lam), transpose(v))
      for (i <- 0 until d; j <- 0 until d)
        assert(math.abs(rec(i)(j) - a(i)(j)) < 1e-8,
          s"reconstruction [$i][$j] off at d=$d seed=$seed")
      // trace preserved
      assert(math.abs(evals.sum - (0 until d).map(i => a(i)(i)).sum) < 1e-8)
    }
  }

  test("jacobiEigen on a diagonal matrix returns the diagonal") {
    val a = Array(Array(5.0, 0.0, 0.0), Array(0.0, -2.0, 0.0),
      Array(0.0, 0.0, 0.5))
    val (evals, _) = Similarity.jacobiEigen(a)
    assert(evals.sorted.toSeq == Seq(-2.0, 0.5, 5.0))
  }

  test("whitenerOf maps the sample covariance to a shrunk diagonal") {
    val r = new scala.util.Random(9)
    val d = 6
    // anisotropic sample: axis i has stddev (i+1)
    val sample = Array.fill(400)(
      Array.tabulate(d)(i => r.nextGaussian() * (i + 1)))
    val w = Similarity.whitenerOf(sample)
    // whiten the sample, recompute covariance: must be DIAGONAL with
    // entries lambda/(lambda+eps) in (0, 1] — shrinkage never
    // amplifies an axis above unit variance
    val ws = sample.map(p => w.map(row =>
      row.zip(p).map { case (x, y) => x * y }.sum))
    val mean = Array.tabulate(d)(i => ws.map(_(i)).sum / ws.length)
    val cov = Array.tabulate(d, d)((i, j) =>
      ws.map(p => (p(i) - mean(i)) * (p(j) - mean(j))).sum /
        (ws.length - 1))
    for (i <- 0 until d; j <- 0 until d) {
      if (i == j) assert(cov(i)(i) > 0.0 && cov(i)(i) <= 1.0 + 1e-9,
        s"whitened variance axis $i = ${cov(i)(i)}")
      else assert(math.abs(cov(i)(j)) < 1e-6,
        s"whitened covariance [$i][$j] = ${cov(i)(j)} not ~0")
    }
    // shrinkage property, stated order-free (the whitened coordinates
    // are EIGEN-axes whose output order cyclic Jacobi does not
    // guarantee): with ridge eps > 0, lambda/(lambda+eps) compresses
    // the raw 36:1 variance spread strictly — analytically to
    // 36(1+eps)/(36+eps) ~ 23:1 at this spectrum's eps = 4x mean.
    // Assert the compression with headroom for sample noise.
    val diag = (0 until d).map(i => cov(i)(i))
    assert(diag.max / diag.min < 30.0,
      s"shrinkage must compress the raw 36:1 spread, got ${diag.max / diag.min}")
  }

  test("whitenerOf degenerate inputs return identity") {
    val one = Array(Array(1.0, 2.0, 3.0))
    assert(Similarity.whitenerOf(one).toSeq.map(_.toSeq) ==
      Similarity.identityMatrix(3).toSeq.map(_.toSeq))
    val const = Array.fill(10)(Array(4.0, 4.0))
    assert(Similarity.whitenerOf(const).toSeq.map(_.toSeq) ==
      Similarity.identityMatrix(2).toSeq.map(_.toSeq))
  }

  test("whitenerOf and jacobiEigen are bit-deterministic") {
    val s1 = rndSym(12, 5)
    val s2 = s1.map(_.clone())
    val (e1, v1) = Similarity.jacobiEigen(s1)
    val (e2, v2) = Similarity.jacobiEigen(s2)
    assert(e1.toSeq == e2.toSeq)
    assert(v1.flatten.toSeq == v2.flatten.toSeq)
    val sample = Array.tabulate(100)(i =>
      Array.tabulate(8)(j => math.sin(i * 0.37 + j * 1.1) * (j + 1)))
    val w1 = Similarity.whitenerOf(sample.map(_.clone()))
    val w2 = Similarity.whitenerOf(sample.map(_.clone()))
    assert(w1.flatten.toSeq == w2.flatten.toSeq)
  }
}
