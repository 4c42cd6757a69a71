package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants over generated data (SURVEY §5.2 item 4),
  * hand-rolled over ScalaCheck Gens. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  private val genInts: Gen[List[Int]] =
    Gen.listOfN(60, Gen.chooseNum(0, 20))

  private def df(xs: List[Int]): DataFrame = {
    import spark.implicits._
    xs.toDF("v")
  }

  private def check(n: Int)(body: List[Int] => Unit): Unit =
    (1 to n).foreach(_ => genInts.sample.foreach(body))

  test("set algebra: intersect ∪ except ≡ distinct left") {
    check(8) { xs =>
      val ys = xs.map(_ + 5)
      val a = df(xs); val b = df(ys)
      val recombined = a.intersect(b).union(a.except(b))
      val left = a.distinct()
      assert(recombined.exceptAll(left).isEmpty &&
        left.exceptAll(recombined).isEmpty, s"failed for $xs")
    }
  }

  test("union distinct ≡ distinct of union-all") {
    check(8) { xs =>
      val ys = xs.reverse
      val a = df(xs); val b = df(ys)
      val u1 = a.union(b).distinct()
      val u2 = a.distinct().union(b.distinct()).distinct()
      assert(u1.exceptAll(u2).isEmpty && u2.exceptAll(u1).isEmpty)
    }
  }

  test("row_number over a total order is a permutation of 1..n") {
    check(6) { xs =>
      val withKey = df(xs).withColumn("id", monotonically_increasing_id())
      val w = Window.orderBy(col("v"), col("id"))
      val rns = withKey.withColumn("rn", row_number().over(w))
        .select("rn").collect().map(_.getInt(0)).sorted.toSeq
      assert(rns === (1 to xs.size).toSeq)
    }
  }

  test("prefix-filtered ngram join ≡ brute-force all-pairs (exactness)") {
    // the r2 prefix filter is an EXACT optimization: on random corpora
    // the candidate-pruned result must equal the naive quadratic scan
    val genDocs: Gen[List[String]] = Gen.listOfN(14,
      Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" ")))
    (1 to 4).foreach { _ =>
      genDocs.sample.foreach { texts =>
        import spark.implicits._
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t, "en", "src") }
          .toDF("doc_id", "text", "lang", "source")
        val fast = graft.engine.ml.Dedup.ngramJaccardPairs(docs, 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        // naive oracle: every pair, exact bigram Jaccard in Scala
        def grams(t: String): Set[String] =
          t.split(' ').sliding(2).map(_.mkString(" ")).toSet
        val naive = (for {
          (a, i) <- texts.zipWithIndex
          (b, j) <- texts.zipWithIndex if i < j
          ga = grams(a); gb = grams(b)
          u = (ga ++ gb).size if u > 0
          jac = ga.intersect(gb).size.toDouble / u
          if math.rint(jac * 10000) / 10000 >= 0.3
        } yield (i.toLong, j.toLong,
          math.rint(jac * 10000) / 10000)).toSet
        assert(fast === naive, s"corpus: $texts")
      }
    }
  }

  test("exact dedup output digests are unique and a subset of input") {
    check(4) { xs =>
      import spark.implicits._
      val docs = xs.zipWithIndex
        .map { case (v, i) => (i.toLong, s"text ${v % 5}") }
        .toDF("doc_id", "text")
      val out = graft.engine.ml.Dedup.exact(docs)
      assert(out.count() ===
        docs.select("text").distinct().count())
      assert(out.select("digest").distinct().count() === out.count())
      assert(out.join(docs, "doc_id").count() === out.count())
    }
  }

  test("upsert: anti-join+union ≡ full-outer-join formulation") {
    check(6) { xs =>
      import spark.implicits._
      val base = xs.zipWithIndex
        .map { case (v, i) => (i.toLong % 15, v) }.distinctBy(_._1)
        .toDF("k", "v")
      val updates = xs.take(8).zipWithIndex
        .map { case (v, i) => ((i * 3).toLong % 20, v + 100) }
        .distinctBy(_._1).toDF("k", "v")
      // the shipped formulation
      val merged = updates.unionByName(
        base.join(updates.select("k"), Seq("k"), "left_anti"))
      // the textbook MERGE formulation
      val viaOuter = base.select(col("k"), col("v").as("bv"))
        .join(updates.select(col("k"), col("v").as("uv")),
          Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("uv"), col("bv")).as("v"))
      assert(merged.exceptAll(viaOuter).isEmpty &&
        viaOuter.exceptAll(merged).isEmpty,
        s"upsert formulations diverged for $xs")
    }
  }

  /** Reference connected components: BFS over an adjacency map. */
  private def refComponents(n: Int,
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    (0L until n).foreach { start =>
      if (!comp.contains(start)) {
        val queue = scala.collection.mutable.Queue(start)
        val members = scala.collection.mutable.ArrayBuffer.empty[Long]
        comp(start) = -1L
        while (queue.nonEmpty) {
          val v = queue.dequeue(); members += v
          adj(v).foreach { w =>
            if (!comp.contains(w)) { comp(w) = -1L; queue.enqueue(w) }
          }
        }
        val root = members.min
        members.foreach(m => comp(m) = root)
      }
    }
    comp.toMap
  }

  test("resolvePairs ≡ BFS components, both regimes, random graphs") {
    import spark.implicits._
    val genEdges: Gen[List[(Long, Long)]] =
      Gen.listOfN(25, for {
        a <- Gen.chooseNum(0L, 19L)
        b <- Gen.chooseNum(0L, 19L) if a != b
      } yield if (a < b) (a, b) else (b, a))
    (1 to 5).foreach { _ =>
      genEdges.sample.foreach { es =>
        val expected = refComponents(20, es)
        val pairs = es.toDF("doc_a", "doc_b")
        val docs = (0L until 20L).toDF("doc_id")
        val driver = graft.engine.ml.Dedup.resolvePairs(pairs, docs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(driver === expected, s"driver regime diverged on $es")
        val dist = graft.engine.ml.Dedup
          .resolvePairs(pairs, docs, collectThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dist === expected, s"distributed regime diverged on $es")
        graft.engine.ml.Dedup.unpersistTracked()
      }
    }
  }
}
