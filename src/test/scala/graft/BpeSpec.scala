package graft

import graft.engine.ml.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkFixture {

  test("trainMerges is deterministic with count-then-lexicographic tie-break") {
    // "ab" and "cd" pair counts tie at 3; (a,b) < (c,d) lexicographically
    val words = Seq(("abab", 1L), ("ab", 1L), ("cdcd", 1L), ("cd", 1L))
    val m = Bpe.trainMerges(words, 2)
    assert(m.map(x => (x.lhs, x.rhs)) == Seq(("a", "b"), ("c", "d")))
    // re-run: identical (no hash-order dependence)
    assert(Bpe.trainMerges(words, 2) == m)
  }

  test("merge application is exhaustive left-to-right on overlaps") {
    // "aaa" under merge (a,a): leftmost-first -> [aa, a], never [a, aa]
    val m = Bpe.trainMerges(Seq(("aaa", 5L)), 1)
    assert(m.head.lhs == "a" && m.head.rhs == "a")
    val m2 = Bpe.trainMerges(Seq(("aaa", 5L)), 2)
    // second round: pairs are (aa, a) -> merges to the full word
    assert(m2(1).lhs == "aa" && m2(1).rhs == "a")
  }

  test("sequential rank-order application equals priority encoding") {
    // merges learned on a corpus; encoding any word by applying merges
    // in rank order exhaustively must equal the lowest-rank-first
    // priority encoder (symbols only grow, so a merge can never make a
    // lower-ranked pair newly adjacent)
    val words = Seq(("their", 10L), ("there", 8L), ("then", 6L),
      ("the", 20L), ("rethink", 3L), ("hint", 2L))
    val merges = Bpe.trainMerges(words, 8)
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    def priorityEncode(w: String): List[String] = {
      var sp = w.map(_.toString).toList
      var done = false
      while (!done) {
        val cands = sp.zip(sp.drop(1)).flatMap(p => ranks.get(p).map(p -> _))
        if (cands.isEmpty) done = true
        else {
          val (bl, br) = cands.minBy(_._2)._1
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < sp.length) {
            if (i + 1 < sp.length && sp(i) == bl && sp(i + 1) == br) {
              out += (bl + br); i += 2
            } else { out += sp(i); i += 1 }
          }
          sp = out.toList
        }
      }
      sp
    }
    for (w <- Seq("their", "there", "then", "the", "rethink", "hint",
        "thine", "rent", "unseen")) {
      var sp: Array[String] = w.map(_.toString).toArray
      merges.foreach { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sp.length) {
          if (i + 1 < sp.length && sp(i) == m.lhs && sp(i + 1) == m.rhs) {
            out += (m.lhs + m.rhs); i += 2
          } else { out += sp(i); i += 1 }
        }
        sp = out.toArray
      }
      assert(sp.toList == priorityEncode(w), s"word $w")
    }
  }

  test("tokensPerDoc: roundtrip holds, counts bounded by words and chars") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tok = Bpe.tokensPerDoc(docs, sf).cache()
    assert(tok.filter(!col("roundtrip_ok")).count() == 0)
    // n_words <= n_tokens <= n_chars over the filtered word stream
    val fw = org.apache.spark.sql.functions.filter(
      split(lower(col("text")), "\\s+"),
      w => w.rlike("^" + Bpe.WordRe + "$"))
    val joined = docs
      .select(col("doc_id"),
        aggregate(fw,
          struct(lit(0L).as("w"), lit(0L).as("c")),
          (a, x) => struct((a.getField("w") + lit(1L)).as("w"),
            (a.getField("c") + length(x)).as("c")))
          .as("agg"))
      .select(col("doc_id"), col("agg.w").as("n_words"),
        col("agg.c").as("n_chars"))
      .join(tok, "doc_id")
    assert(joined.filter(col("n_tokens") < col("n_words") ||
      col("n_tokens") > col("n_chars")).count() == 0)
    tok.unpersist()
  }

  test("tokensPerDoc and cdcChunks are invariant to physical partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val skewed = docs.repartition(13)
    def tokMap(d: org.apache.spark.sql.DataFrame) =
      Bpe.tokensPerDoc(d, sf).select("doc_id", "n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tokMap(docs) === tokMap(skewed))
    def chunkSet(d: org.apache.spark.sql.DataFrame) =
      graft.engine.ml.Text.cdcChunks(d, 4, 8)
        .select("doc_id", "chunk_id", "chunk_hash")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    assert(chunkSet(docs) === chunkSet(skewed))
  }

  test("lineDedup is invariant to physical partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def out(d: org.apache.spark.sql.DataFrame) =
      graft.engine.ml.Text.lineDedup(d, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    assert(out(docs) === out(docs.repartition(13)))
  }

  test("codepoints keeps non-BMP letters (surrogate pairs) as one symbol") {
    // Gothic 𐌰 is U+10330 — two UTF-16 chars, one code point; a
    // char-based split would break it into unpaired surrogates and the
    // DuckDB replay (code-point substring) could never hash-match
    assert(Bpe.codepoints("𐌰𐌱").toSeq == Seq("𐌰", "𐌱"))
    assert(Bpe.codepoints("a𐌰b").toSeq == Seq("a", "𐌰", "b"))
    // the unicode word filter admits letters, digits and apostrophes
    // of any script, and still rejects punctuation/symbols
    val pat = java.util.regex.Pattern.compile(Bpe.WordRe)
    for (w <- Seq("γλώσσα", "данные", "数据", "بيانات", "café", "2026",
        "don't", "𐌰𐌱𐌲"))
      assert(pat.matcher(w).matches(), w)
    for (w <- Seq("a", "!!", "a.b", "→→", "  "))
      assert(!pat.matcher(w).matches(), w)
  }

  test("merge table artifact: second call serves the persisted fit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Bpe.mergesFor(docs, sf)
    val b = Bpe.mergesFor(docs, sf)
    assert(a == b && a.size == Bpe.NumMerges)
    assert(a.map(_.rank) == (0 until Bpe.NumMerges))
  }
}
