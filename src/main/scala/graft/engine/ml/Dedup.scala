package graft.engine.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication verbs for LLM training-data pipelines (SURVEY.md §2.10):
  * exact (content-hash), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard — the standard near-dup ladder from cheap/exact to
  * fuzzy/scalable.
  *
  * Scale design (100 TB): every method reduces to hash-partitioned
  * aggregations/joins on derived keys (digest, band hash, simhash chunk)
  * — candidate generation never compares all pairs. Exact verification
  * runs only on the candidate set.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1; keeps a*h+b within a long

  /** Exact dedup: keep the lowest doc_id per md5(text). The window
    * hash-partitions on the digest, so at scale each digest group lands
    * on one reducer — no global sort, no hotspot (digests are uniform). */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("digest").orderBy("doc_id")
    docs.select(col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "digest")
  }

  /** (doc_id, shingle) pairs: distinct character n-gram shingles. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(
        s"transform(sequence(1, greatest(length(text) - ${n - 1}, 1)), " +
          s"i -> substring(text, i, $n))")).as("shingle"))
      .filter(length(col("shingle")) === n)
      .distinct()

  /** MinHash signatures: numHashes permutations h_i(x) = (a_i·x + b_i)
    * mod p over xxhash64'd shingles, folded per document into mins in a
    * single aggregation (map-side combined). Seeded → deterministic. */
  def minHashSignatures(sh: DataFrame, numHashes: Int = 32,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val coeffs = Seq.fill(numHashes)(
      (rnd.nextLong().abs % (P - 1) + 1, rnd.nextLong().abs % P))
    val hashed = sh.select(col("doc_id"),
      pmod(xxhash64(col("shingle")), lit(P)).as("h"))
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(P))).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split each signature into (bands × rowsPerBand), hash
    * each band, and emit candidate pairs of documents sharing any band
    * hash. The band join is an equi-join on (band_idx, band_hash) —
    * shuffle-partitioned, never all-pairs. */
  def lshCandidates(sigs: DataFrame, bands: Int = 4,
      rowsPerBand: Int = 8): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
            b -> struct(b AS band_idx,
                        xxhash64(concat_ws(',',
                          slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))
                          AS band_hash))""")).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
    val a = banded.select(col("doc_id").as("doc_a"),
      col("band_idx"), col("band_hash"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact Jaccard over shingle sets, evaluated only for the given
    * candidate pairs (the expensive check rides on a small set). */
  def jaccardVerify(candidates: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .withColumn("jaccard", round(col("n_common") /
        (col("sz_a") + col("sz_b") - col("n_common")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash-LSH near-dup pipeline: shingle → sign → band → verify.
    * Band geometry (4 bands × 8 rows) puts the s-curve knee near
    * J ≈ 0.84 — on a high-overlap corpus a looser knee floods the
    * candidate set and the verify join stops scaling. */
  def nearMinHash(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs)
    jaccardVerify(lshCandidates(minHashSignatures(sh)), sh, threshold)
  }

  /** 64-bit SimHash per document over whitespace tokens — one projection,
    * no shuffle: for each bit, sum ±1 contributions of token hashes and
    * take the sign. */
  def simHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      """aggregate(sequence(0, 63), 0L, (acc, b) ->
           acc + shiftleft(CASE WHEN
             aggregate(transform(split(text, ' '), t -> xxhash64(t)),
               0L, (s, h) -> s + CASE WHEN bit_get(h, b) = 1
                                      THEN 1L ELSE -1L END) > 0
             THEN 1L ELSE 0L END, b))""").as("simhash"))

  /** SimHash near-dup: bucket by 16-bit chunks (a pair within Hamming
    * distance 3 must agree on at least one of 4 chunks), then verify
    * Hamming distance on candidates via bit_count(xor). */
  def nearSimHash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simHash(docs)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3), c -> struct(c AS chunk_idx,
             (shiftright(simhash, c * 16) & 65535) AS chunk_val))"""))
        .as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.chunk_idx"), col("ch.chunk_val"))
    val a = chunked.select(col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"), col("chunk_idx"), col("chunk_val"))
    val b = chunked.select(col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"), col("chunk_idx"), col("chunk_val"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact word-bigram Jaccard between documents of the same (lang,
    * source) group — the fully-SQL-expressible near-dup variant used for
    * oracle checking. Group keys bound the pair space. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val grams = docs.select(col("doc_id"), col("lang"), col("source"),
      explode(expr(
        """CASE WHEN size(split(text, ' ')) < 2 THEN array()
           ELSE transform(sequence(1, size(split(text, ' ')) - 1),
             i -> concat(element_at(split(text, ' '), i), ' ',
                         element_at(split(text, ' '), i + 1))) END"""))
        .as("g")).distinct()
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = grams.select(col("lang"), col("source"),
      col("doc_id").as("doc_a"), col("g"))
    val b = grams.select(col("lang"), col("source"),
      col("doc_id").as("doc_b"), col("g"))
    val common = a.join(b, Seq("lang", "source", "g"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .withColumn("jaccard", round(col("n_common") /
        (col("sz_a") + col("sz_b") - col("n_common")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
