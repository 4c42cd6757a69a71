package graft

import graft.engine.ml.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation verbs: decontamination, chunking (Curation.scala /
  * Text.scala). Planted-overlap and coverage properties — the oracle
  * checks value parity; these check the semantics hold off the golden
  * path (short docs, exact spans, stride edges). */
class CurationSpec extends AnyFunSuite with SparkFixture {

  private def docsOf(rows: Seq[(Long, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate flags exactly the docs sharing an n-gram span") {
    val span = "alpha beta gamma delta epsilon"
    val train = docsOf(Seq(
      1L -> s"one two three $span four five",     // contains the span
      2L -> "totally unrelated words here only",  // clean
      3L -> s"$span tail words",                  // span at position 0
      4L -> "alpha beta gamma unrelated suffix no full span present"))
    val bench = docsOf(Seq(100L -> s"prefix words $span suffix words"))
    val hits = Text.decontaminate(train, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet === Set(1L, 3L), s"got $hits")
    // doc 4 shares only a 3-gram — below n — and must not be flagged
    assert(!hits.contains(4L) && !hits.contains(2L))
    // every flagged doc counts at least the planted 5-gram
    assert(hits.values.forall(_ >= 1))
  }

  test("decontaminate ignores docs/benchmarks shorter than n") {
    val train = docsOf(Seq(1L -> "a b c", 2L -> "a b c d e f"))
    val bench = docsOf(Seq(100L -> "a b"))
    assert(Text.decontaminate(train, bench, n = 5).count() === 0)
  }

  test("chunk_overlap covers every word; stride/size edges hold") {
    val words = (1 to 100).map(i => s"w$i")
    val docs = docsOf(Seq(
      1L -> words.mkString(" "),          // 100 words: 4 chunks at 32/24
      2L -> words.take(32).mkString(" "), // exactly one full chunk
      3L -> words.take(5).mkString(" "))) // short doc: one short chunk
    val chunks = Text.chunkOverlap(docs, 32, 24)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = chunks.groupBy(_._1)
    // nChunks = 1 + ceil((100-32)/24) = 1 + 3 = 4
    assert(byDoc(1L).length === 4)
    assert(byDoc(2L).length === 1 && byDoc(2L).head._4 === 32)
    assert(byDoc(3L).length === 1 && byDoc(3L).head._4 === 5)
    // coverage: the union of chunk words is the document, in order per
    // chunk; chunk i starts at word i*stride+1
    byDoc(1L).sortBy(_._2).foreach { case (_, cid, text, n) =>
      val expect = words.slice(cid * 24, cid * 24 + 32)
      assert(text === expect.mkString(" "))
      assert(n === expect.length)
    }
    assert(byDoc(1L).flatMap(_._3.split(" ")).toSet === words.toSet)
    // overlap: consecutive chunks share size-stride = 8 words
    val sorted = byDoc(1L).sortBy(_._2)
    val c0 = sorted.head._3.split(" ").toSet
    val c1 = sorted(1)._3.split(" ").toSet
    assert((c0 & c1).size === 8)
  }

  test("wordNgrams emits size-n windows, empty below n") {
    val spark2 = spark
    import spark2.implicits._
    val out = Seq("a b c d", "a b").toDF("text")
      .select(Text.wordNgrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
  }

  test("repetitionProfile counts planted repetition; short docs emit 0") {
    val docs = docsOf(Seq(
      1L -> "x y z x y z x y z",   // 7 trigrams, 3 distinct
      2L -> "a b c d e f g",       // 5 trigrams, all distinct
      3L -> "a b"))                // shorter than n
    val out = Text.repetitionProfile(docs, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) === ((7L, 3L)))
    assert(out(2L) === ((5L, 5L)))
    assert(out(3L) === ((0L, 0L)))
  }

  test("Misra-Gries heavy hitters are exact on a Zipfian corpus") {
    // the guarantee that matters on real (Zipfian) text: the bounded-
    // memory candidate pass must not miss any word above n/k, and the
    // recount must equal the exact answer — under skew AND under a
    // different partitioning
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 200).map { i =>
      val head = Seq.fill(30)(s"w${rnd.nextInt(1 + rnd.nextInt(40))}")
      val tail = Seq.fill(10)(s"rare${rnd.nextInt(20000)}")
      (i.toLong, (head ++ tail).mkString(" "))
    }.toDF("doc_id", "text")
    def exact(k: Int) = {
      val w = docs.select(explode(split(col("text"), " ")).as("w"))
      val n = w.count().toDouble
      w.groupBy("w").count().filter(col("count") > n / k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val want = exact(50)
    assert(want.nonEmpty) // the corpus really has heavy hitters
    Seq(docs, docs.repartition(17)).foreach { d =>
      val got = Text.heavyHitters(d, 50)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    }
  }

  test("curate_report renders the audit with consistent totals") {
    val audit = SparkEntry.queries("curate_corpus")(spark, sf)
    val report = graft.queries.Curation.renderReport(audit)
    assert(report.startsWith("# Corpus curation report"))
    val totalDocs = audit.agg(sum("n_docs")).collect()(0).getLong(0)
    val totalKept = audit.agg(sum("n_kept")).collect()(0).getLong(0)
    val totalLine = report.linesIterator
      .find(_.startsWith("| **total**")).get
    assert(totalLine.contains(s"| $totalDocs |"), totalLine)
    assert(totalLine.contains(s"| $totalKept "), totalLine)
    // one row per audit domain + header + separator + total
    assert(report.linesIterator.count(_.startsWith("|")) ===
      audit.count() + 3)
  }

  test("curate_apply survivors are exactly the audit's n_kept") {
    // the audit (curate_corpus) and the row-level apply must agree on
    // every (lang, source) slice — same rules, same keep-list artifact
    val audit = SparkEntry.queries("curate_corpus")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(7))
      .toMap
    val applied = SparkEntry.queries("curate_apply")(spark, sf)
      .groupBy("lang", "source").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(applied === audit.filter(_._2 > 0),
      s"audit=$audit applied=$applied")
  }

  test("cdcChunks: an early insertion leaves later chunk hashes intact") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val edited = "INSERTED " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = graft.engine.ml.Text.cdcChunks(docs, 4, 8)
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val shared = chunks(1L) intersect chunks(2L)
    // fixed-stride chunking would share ZERO chunks after a 1-word
    // insertion; CDC must re-sync and share most of the tail
    assert(shared.size * 2 > chunks(1L).size,
      s"shared ${shared.size} of ${chunks(1L).size}")
  }

  test("cdcChunks covers every word exactly once, in order") {
    import spark.implicits._
    val docs = Seq((7L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rebuilt = graft.engine.ml.Text.cdcChunks(docs, 4, 8)
      .orderBy("chunk_id").collect()
      .map(_.getString(3)).mkString(" ")
    assert(rebuilt == (1 to 100).map(i => s"t$i").mkString(" "))
  }

  test("incremental line dedup equals the full run restricted to batch") {
    val docs = Tables.documents(spark, sf)
    val existing = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") % 5 =!= 0)
    val batch = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") % 5 === 0)
    val inc = graft.engine.ml.Text.lineDedupIncremental(existing, batch, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full-corpus run keeps the SAME first-occurrence rule; restricting
    // its stats to batch docs must agree exactly with the incremental
    // screen (only chunks shared with the batch can affect batch rows)
    val full = graft.engine.ml.Text.lineDedup(docs, 10)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
  }

  test("lineDedup keeps the globally first chunk copy and the tail") {
    import spark.implicits._
    val w10a = (1 to 10).map(i => s"a$i").mkString(" ")   // shared chunk
    val w10b = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$w10a $w10b tail words"), // first: keeps both chunks + tail
      (2L, s"$w10b $w10a"),            // later: loses BOTH chunks
      (3L, "short text only")          // sub-chunk: tail survives intact
    ).toDF("doc_id", "text")
    val out = graft.engine.ml.Text.lineDedup(docs, 10)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2 &&
      out(0).getString(3) == s"$w10a $w10b tail words")
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 0 &&
      out(1).getString(3) == "")
    assert(out(2).getLong(1) == 0 && out(2).getLong(2) == 0 &&
      out(2).getString(3) == "short text only")
  }
}
