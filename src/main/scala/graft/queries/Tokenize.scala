package graft.queries

import graft.Tables._
import graft.engine.ml.Bpe
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Subword tokenization (BPE): the trained merge table and the
  * per-document encode. Unlike the bounds-audited approximate keys,
  * BOTH keys here are exact-oracled: the oracle SQL replays the whole
  * deterministic training loop inside DuckDB as a generated chain of
  * materialized CTEs (two per merge: pair-count argmax + boundary-safe
  * replace), so the merge table and every token count is hash-compared
  * byte-for-byte — see [[graft.engine.ml.Bpe]] for the determinism
  * contract that makes this possible.
  */
object Tokenize {

  /** Deterministic planted-multilingual twin of the corpus: every doc
    * gets one of seven lowercase non-ASCII phrases appended (Greek,
    * Cyrillic, CJK, Arabic, accented Latin, digit-bearing, and non-BMP
    * Gothic — the surrogate-pair stress case), chosen by doc_id mod 7.
    * The testdata corpus is pure ASCII, so this construction is what
    * PROVES the tokenizer's Unicode path end-to-end: the planted words
    * must contribute real tokens in both engines or the hash diverges.
    * Phrases are pre-lowercased so lower() parity between engines is
    * trivially safe. */
  val UniPhrases: Seq[String] = Seq(
    "γλώσσα μοντέλο δεδομένα επεξεργασία",
    "данные модель язык обучение",
    "数据 模型 语言 训练",
    "بيانات نموذج لغة تدريب",
    "café naïve résumé déjà vu",
    "2026 año 42 datos 2026",
    "𐌰𐌱𐌲 𐌳𐌴𐌵 𐌰𐌱𐌲")

  /** Phrase repetition factor: each planted word must out-count the
    * ~40th-ranked ASCII pair (measured ≈ 1.9× docs) for non-ASCII
    * merges to actually surface in the top-40 merge table — one
    * occurrence per doc gives count ≈ docs/7, 16 gives ≈ 2.3× docs.
    * The ratio is scale-invariant: planted counts and English pair
    * counts both grow linearly in doc count. */
  val UniRepeat = 16

  def multilingual(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.withColumn("text",
      concat(col("text"),
        repeat(concat(lit(" "),
          element_at(array(UniPhrases.map(lit): _*),
            (pmod(col("doc_id"), lit(7)) + 1).cast("int"))), UniRepeat)))

  /** The same construction as a DuckDB relation (oracle source). */
  val UniSrc: String = {
    val whens = UniPhrases.zipWithIndex.map { case (p, i) =>
      s"WHEN $i THEN '$p'"
    }.mkString(" ")
    s"""(SELECT doc_id, lang, source,
       text || repeat(' ' || CASE CAST(doc_id % 7 AS INT) $whens END,
                      $UniRepeat) AS text
     FROM documents)"""
  }

  val qs: Seq[Q] = Seq(

    // The trainer surface: rank-ordered merge rules. Fit-once persisted
    // artifact (content-fingerprint keyed); the single corpus pass is
    // the word-count aggregation.
    Q("vocab_bpe",
      (s, d) => Bpe.mergeTable(documents(s, d), d).orderBy("rank"),
      Bpe.mergeTableOracle),

    // The encoder surface: exact subword token counts per document over
    // the filtered word stream, plus the encode∘decode identity audit.
    // Map-side only (broadcast-free closure merge table + per-partition
    // word memo) — the count that replaces the len/4 heuristic in
    // pack_sequences / mix_weights.
    Q("text_tokenize_bpe",
      (s, d) => Bpe.tokensStoreFor(documents(s, d), d)
        .select("doc_id", "n_tokens", "roundtrip_ok")
        .orderBy("doc_id"),
      Bpe.tokensCtePrefix + """
SELECT doc_id, n_tokens, TRUE AS roundtrip_ok FROM dtok ORDER BY doc_id"""),

    // The metric a vocabulary is judged by: chars-per-token compression
    // per domain (higher = the merge table captures that domain's
    // morphology better; 1.0 = degenerate char-level). Char counts over
    // the SAME filtered word stream the encoder tokenizes; token counts
    // from the persisted store — one scan-local projection + the tiny
    // domain aggregate.
    Q("vocab_compression",
      (s, d) => {
        val fw = filter(split(lower(col("text")), "\\s+"),
          w => w.rlike("^" + Bpe.WordRe + "$"))
        val chars = documents(s, d).select(col("lang"), col("source"),
          aggregate(fw, lit(0L), (a, w) => a + length(w)).as("n_chars"))
          .groupBy("lang", "source")
          .agg(sum(col("n_chars")).as("n_chars"))
        val toks = Bpe.tokensStoreFor(documents(s, d), d)
          .groupBy("lang", "source")
          .agg(sum(col("n_tokens")).as("n_tokens"))
        chars.join(toks, Seq("lang", "source"))
          .select(col("lang"), col("source"), col("n_chars"),
            col("n_tokens"),
            round(col("n_chars") /
              expr("cast(nullif(n_tokens, 0) AS double)"), 4)
              .as("chars_per_token"))
          .orderBy("lang", "source")
      },
      Bpe.tokensCtePrefix + s""",
chars AS (
  SELECT lang, source, CAST(SUM(len(word)) AS BIGINT) AS n_chars
  FROM (
    SELECT lang, source,
           unnest(string_split_regex(lower(text), '\\s+')) AS word
    FROM documents)
  WHERE regexp_full_match(word, '${Bpe.WordReSql}')
  GROUP BY 1, 2),
toks AS (
  SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM dtok GROUP BY 1, 2)
SELECT lang, source, n_chars, n_tokens,
       ROUND(n_chars / CAST(nullif(n_tokens, 0) AS DOUBLE), 4)
         AS chars_per_token
FROM chars JOIN toks USING (lang, source)
ORDER BY lang, source"""),

    // Temperature-flattened domain mixture — the multilingual-corpus
    // standard (sample domain i ∝ T_i^α, α<1, so head domains stop
    // drowning the tail): here α = 1/2, i.e. sqrt — chosen over an
    // arbitrary α because IEEE sqrt is CORRECTLY ROUNDED on every
    // engine (pow(x, 0.7) is not), which is what lets the oracle
    // hash-match the weights bit-for-bit. The engine-dependent hazard
    // is the DENOMINATOR (a float sum whose order differs per engine):
    // each sqrt is first pinned to DECIMAL(18,6) — a double never sits
    // exactly on a decimal midpoint, so the cast is engine-exact —
    // and the decimal SUM is order-free; the one float divide at the
    // end runs on identical inputs. Boost = temperature weight over
    // the proportional weight — the upsampling factor each tail
    // domain actually receives. One tiny aggregate off the persisted
    // BPE token store; nothing scans the corpus.
    Q("mix_temperature",
      (s, d) => {
        val toks = Bpe.tokensStoreFor(documents(s, d), d)
          .groupBy("lang", "source")
          .agg(sum(col("n_tokens")).as("n_tokens"))
          .withColumn("s_i", sqrt(col("n_tokens").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        val wAll = Window.partitionBy()
        toks
          .withColumn("denom", sum(col("s_i")).over(wAll))
          .withColumn("tok_total", sum(col("n_tokens")).over(wAll))
          .select(col("lang"), col("source"), col("n_tokens"),
            round(col("s_i").cast("double") /
              col("denom").cast("double"), 6).as("w_temp"),
            round((col("s_i").cast("double") /
                col("denom").cast("double")) /
              (col("n_tokens").cast("double") /
                col("tok_total").cast("double")), 4).as("boost"))
          .orderBy("lang", "source")
      },
      Bpe.tokensCtePrefix + """,
dom AS (
  SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         CAST(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) AS DECIMAL(18,6)) AS s_i
  FROM dtok GROUP BY 1, 2)
SELECT lang, source, n_tokens,
       ROUND(CAST(s_i AS DOUBLE) / CAST(SUM(s_i) OVER () AS DOUBLE), 6)
         AS w_temp,
       ROUND((CAST(s_i AS DOUBLE) / CAST(SUM(s_i) OVER () AS DOUBLE)) /
             (CAST(n_tokens AS DOUBLE) /
              CAST(SUM(n_tokens) OVER () AS DOUBLE)), 4) AS boost
FROM dom ORDER BY lang, source"""),

    // Deterministic global shuffle into token-balanced training shards —
    // the step between packing and export that every pretraining run
    // needs: the corpus must arrive at the trainer in a reproducible
    // pseudo-random order, split into shards a loader fleet can consume
    // independently. Shard assignment is an md5 hash of the doc id
    // (statistically token-balanced — at 100 TB the law of large
    // numbers IS the balancer; no global coordination), and the
    // within-shard order is a SECOND independent md5 (salted 'ord'), so
    // the permutation is fixed by the ids alone — any two runs, any two
    // engines, any partition layout produce the byte-identical order.
    // The per-shard row_number is the shard WRITER's local sort
    // (spillable, one shard per task — K is chosen so a shard is a
    // file bundle, exactly how export_jsonl_sharded writes); nothing
    // global ever sorts. The declared relation is the shard manifest a
    // loader validates against: doc/token totals off the persisted BPE
    // token store, an order checksum (sum of seq×doc_id — any
    // permutation change flips it) pinning the exact within-shard
    // sequence, and the token-balance ratio vs the ideal K-way split.
    Q("shuffle_shards",
      (s, d) => {
        val k = 8
        val toks = Bpe.tokensStoreFor(documents(s, d), d)
          .select("doc_id", "n_tokens")
        val sharded = toks
          .withColumn("shard",
            (conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("shard"))), 1, 8), 16, 10).cast("long") % k).cast("int"))
          .withColumn("ord",
            md5(concat(col("doc_id").cast("string"), lit("ord"))))
        val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
        // checksum folded mod a large prime: raw SUM(seq × doc_id) grows
        // ~N³ and overflows BIGINT past ~1e7 docs — where ANSI Spark
        // throws but DuckDB widens to HUGEINT, i.e. the engines diverge.
        // (seq%p)×(doc_id%p) < p² ≈ 1e18 stays in BIGINT, and the outer
        // mod keeps the per-shard sum bounded for any corpus size.
        val p = 1000000007L
        val stats = sharded.withColumn("seq", row_number().over(w))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            (sum((col("seq").cast("long") % p) * (col("doc_id") % p) % p)
              % p).as("order_checksum"))
        val wAll = Window.partitionBy()
        stats
          .withColumn("balance_ratio",
            round(col("n_tokens") /
              (sum(col("n_tokens")).over(wAll) / lit(k.toDouble)), 4))
          .orderBy("shard")
      },
      Bpe.tokensCtePrefix + """,
sharded AS (
  SELECT doc_id, n_tokens,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'shard'),
           1, 8)) AS BIGINT) % 8 AS INT) AS shard,
         md5(CAST(doc_id AS VARCHAR) || 'ord') AS ord
  FROM dtok),
seqd AS (
  SELECT shard, doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS seq
  FROM sharded),
stats AS (
  SELECT shard, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         CAST(SUM((seq % 1000000007) * (doc_id % 1000000007)
           % 1000000007) % 1000000007 AS BIGINT) AS order_checksum
  FROM seqd GROUP BY shard)
SELECT shard, n_docs, n_tokens, order_checksum,
       ROUND(n_tokens / (CAST(SUM(n_tokens) OVER () AS DOUBLE) / 8.0), 4)
         AS balance_ratio
FROM stats ORDER BY shard"""),

    // The Unicode proof for the trainer: BPE trained on the
    // planted-multilingual twin corpus. The planted phrases repeat
    // ~N/7 times each, so Greek/Cyrillic/CJK/Arabic/non-BMP pairs MUST
    // surface in the merge table — under the old ASCII word filter
    // they'd contribute nothing and this key could not hash-match the
    // DuckDB replay (which filters with the same \pL\pN classes).
    Q("vocab_bpe_unicode",
      (s, d) => Bpe.mergeTable(multilingual(documents(s, d)), d + "_uni")
        .orderBy("rank"),
      Bpe.mergeTableOracleFor(UniSrc)),

    // The Unicode proof for the encoder: per-doc token counts on the
    // planted twin. Counts strictly exceed the ASCII-only counts for
    // every doc (each planted phrase tokenizes to >=1 token), and the
    // encode∘decode roundtrip must hold codepoint-for-codepoint across
    // surrogate pairs — matched against DuckDB's code-point substring
    // replay of the same merges.
    Q("text_tokenize_unicode",
      (s, d) => Bpe.tokensStoreFor(multilingual(documents(s, d)), d + "_uni")
        .select("doc_id", "n_tokens", "roundtrip_ok")
        .orderBy("doc_id"),
      Bpe.tokensCtePrefixFor(UniSrc) + """
SELECT doc_id, n_tokens, TRUE AS roundtrip_ok FROM dtok ORDER BY doc_id"""),

    // LARGEST-REMAINDER integerization — the finishing step every
    // quota allocator needs (mix_allocate floors leave budget
    // unspent): floor each share, then hand the leftover units to the
    // largest fractional remainders, ties by domain order. The
    // result is the unique deterministic integer allocation summing
    // EXACTLY to the budget (Hamilton's method). Remainders compare
    // as exact decimals of one identical double each — rank-stable on
    // both engines; the leftover count is itself derived data.
    Q("mix_round_lrm",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val budget = 1000L
        val toks = Bpe.tokensStoreFor(documents(s, d), d)
          .groupBy("lang", "source")
          .agg(sum(col("n_tokens")).as("n_tokens"))
        val wAll = Window.partitionBy()
        val wRank = Window.orderBy(desc("rem"), col("lang"),
          col("source"))
        toks
          .withColumn("tok_total", sum(col("n_tokens")).over(wAll))
          .withColumn("share",
            col("n_tokens").cast("double") * budget /
              col("tok_total").cast("double"))
          .withColumn("fl", floor(col("share")).cast("long"))
          .withColumn("rem",
            (col("share") - col("fl")).cast(DecimalType(18, 12)))
          .withColumn("leftover",
            lit(budget) - sum(col("fl")).over(wAll))
          .withColumn("extra",
            (row_number().over(wRank) <= col("leftover")).cast("long"))
          .select(col("lang"), col("source"), col("n_tokens"),
            col("fl").as("floor_alloc"), col("extra"),
            (col("fl") + col("extra")).as("alloc"))
          .orderBy("lang", "source")
      },
      Bpe.tokensCtePrefix + """,
tok AS (
  SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM dtok GROUP BY 1, 2),
sh AS (
  SELECT lang, source, n_tokens,
         CAST(n_tokens AS DOUBLE) * 1000 /
           CAST((SELECT SUM(n_tokens) FROM tok) AS DOUBLE) AS share
  FROM tok),
fl AS (
  SELECT lang, source, n_tokens,
         CAST(floor(share) AS BIGINT) AS fl,
         CAST(share - floor(share) AS DECIMAL(18,12)) AS rem
  FROM sh),
lo AS (SELECT 1000 - CAST(SUM(fl) AS BIGINT) AS leftover FROM fl),
ranked AS (
  SELECT lang, source, n_tokens, fl, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rk
  FROM fl)
SELECT lang, source, n_tokens, fl AS floor_alloc,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS extra,
       fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
FROM ranked, lo ORDER BY lang, source"""),

    // Epoch-CAPPED allocation — the constraint mix_allocate ignores
    // and every real pretraining mix enforces (post-Hoffmann/"Scaling
    // Data-Constrained LMs" practice): a domain can only be repeated
    // so many times before marginal value collapses, so quotas are
    // min(weighted share, max_epochs × native tokens) and the excess
    // is re-spread over uncapped domains (one water-filling round,
    // closed-form, both engines replay it bit-for-bit). Budget is
    // 1.2× the corpus so the cap genuinely binds on tail domains:
    // sqrt-temperature weights hand them >2 epochs, the cap claws it
    // back, and head domains absorb the surplus. All weight sums are
    // DECIMAL-pinned (order-free); the only floats are the two final
    // divides on identical inputs. Not-all-capped is structural:
    // Σcap = 2T > budget = 1.2T ≥ Σalloc0 ⇒ an uncapped domain always
    // exists, so the redistribution denominator is never zero.
    Q("mix_epochs",
      (s, d) => {
        val maxEpochs = 2L
        val toks = Bpe.tokensStoreFor(documents(s, d), d)
          .groupBy("lang", "source")
          .agg(sum(col("n_tokens")).as("n_tokens"))
          .withColumn("s_i", sqrt(col("n_tokens").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        val wAll = Window.partitionBy()
        toks
          .withColumn("denom", sum(col("s_i")).over(wAll))
          .withColumn("budget",
            floor(sum(col("n_tokens")).over(wAll).cast("double") * 1.2)
              .cast("long"))
          .withColumn("alloc0",
            floor((col("s_i").cast("double") / col("denom").cast("double"))
              * col("budget").cast("double")).cast("long"))
          .withColumn("cap", col("n_tokens") * maxEpochs)
          .withColumn("capped", col("alloc0") > col("cap"))
          .withColumn("excess",
            sum(when(col("capped"), col("alloc0") - col("cap"))
              .otherwise(0L)).over(wAll))
          .withColumn("u_denom",
            sum(when(!col("capped"), col("s_i"))).over(wAll))
          .withColumn("alloc_final",
            when(col("capped"), col("cap"))
              .otherwise(col("alloc0") +
                floor(col("excess").cast("double") *
                  (col("s_i").cast("double") /
                    col("u_denom").cast("double"))).cast("long")))
          .select(col("lang"), col("source"), col("n_tokens"),
            col("alloc0"), col("capped"), col("alloc_final"),
            round(col("alloc_final").cast("double") /
              col("n_tokens").cast("double"), 4).as("epochs"))
          .orderBy("lang", "source")
      },
      Bpe.tokensCtePrefix + """,
dom AS (
  SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         CAST(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) AS DECIMAL(18,6)) AS s_i
  FROM dtok GROUP BY 1, 2),
a0 AS (
  SELECT lang, source, n_tokens, s_i,
         CAST(floor((CAST(s_i AS DOUBLE) /
                     CAST((SELECT SUM(s_i) FROM dom) AS DOUBLE)) *
                    CAST((SELECT CAST(floor(
                      CAST(SUM(n_tokens) AS DOUBLE) * 1.2) AS BIGINT)
                      FROM dom) AS DOUBLE)) AS BIGINT) AS alloc0,
         n_tokens * 2 AS cap
  FROM dom),
r AS (
  SELECT SUM(CASE WHEN alloc0 > cap THEN alloc0 - cap ELSE 0 END) AS excess,
         SUM(CASE WHEN alloc0 <= cap THEN s_i END) AS u_denom
  FROM a0),
fin AS (
  SELECT lang, source, n_tokens, alloc0, alloc0 > cap AS capped,
         CASE WHEN alloc0 > cap THEN cap
              ELSE alloc0 + CAST(floor(CAST(excess AS DOUBLE) *
                   (CAST(s_i AS DOUBLE) / CAST(u_denom AS DOUBLE)))
                   AS BIGINT) END AS alloc_final
  FROM a0, r)
SELECT lang, source, n_tokens, alloc0, capped, alloc_final,
       ROUND(CAST(alloc_final AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
         AS epochs
FROM fin ORDER BY lang, source"""),

    // EFFECTIVE SAMPLE SIZE of the temperature-resampled mixture —
    // the number mix_temperature's boosts imply but never state: when
    // docs are importance-weighted to the T=0.5 mixture
    // (w_c = target_share/actual_share, the boost column), ESS =
    // (Σw)²/Σw² = (Σ_c n_c·w_c)²/Σ_c n_c·w_c² — BOTH cell sums
    // computed explicitly (in exact arithmetic the numerator sum
    // equals N, but w is floating so assuming the identity could
    // overstate ess; r10 ADVICE) — so how much of the corpus the
    // reweighting actually keeps is ONE bounded-cell aggregate.
    // Per-cell w is a deterministic double off exact counts; both
    // sums are quantized ONCE after the product (the round-10
    // decimal-width lesson). ESS/N near 1 = gentle mix, small = the
    // mixture is really a subset.
    Q("mix_ess",
      (s, d) => {
        val cells = documents(s, d)
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
          .withColumn("s_i", expr(
            "CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(18,6))"))
        val tot = cells.agg(sum("n").as("ntot"),
          count(lit(1)).as("n_cells"), sum("s_i").as("stot"))
        cells.crossJoin(broadcast(tot))
          .withColumn("w",
            expr("""(CAST(s_i AS DOUBLE) / CAST(stot AS DOUBLE))
                    * (CAST(ntot AS DOUBLE) / n)"""))
          // The numerator is computed EXPLICITLY as (Σ n_c·w_c)²
          // rather than assuming Σ n_c·w_c = N: the identity holds
          // only in exact arithmetic, and w is a floating product, so
          // the shortcut could report ess slightly above the true
          // (Σw)²/Σw² (r10 ADVICE). Both terms are quantized to the
          // same DECIMAL(38,12) so the two engines sum identically.
          // ROUND(...,12) BEFORE the decimal cast (ADVICE r11): the
          // rounding rule at the 12th digit is spelled out explicitly
          // on both engines instead of inherited from each engine's
          // DOUBLE->DECIMAL cast behavior at the quantization boundary.
          .withColumn("t1",
            expr("CAST(ROUND(n * w, 12) AS DECIMAL(38,12))"))
          .withColumn("t2",
            expr("CAST(ROUND(n * (w * w), 12) AS DECIMAL(38,12))"))
          .agg(max("ntot").as("n_docs"), max("n_cells").as("n_cells"),
            sum("t1").as("sw1"), sum("t2").as("sw2"))
          .select(col("n_docs"), col("n_cells"),
            expr("""CASE WHEN CAST(sw2 AS DOUBLE) <= 0.0D THEN NULL
                    ELSE ROUND(CAST(sw1 AS DOUBLE)
                         * CAST(sw1 AS DOUBLE)
                         / CAST(sw2 AS DOUBLE), 2) + 0.0D END""")
              .as("ess"),
            expr("""CASE WHEN CAST(sw2 AS DOUBLE) <= 0.0D THEN NULL
                    ELSE ROUND(CAST(sw1 AS DOUBLE)
                         * CAST(sw1 AS DOUBLE)
                         / CAST(sw2 AS DOUBLE)
                         / CAST(n_docs AS DOUBLE), 6) + 0.0D END""")
              .as("ess_ratio"))
      },
      """WITH cells AS (
           SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(sqrt(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(18,6))
                    AS s_i
           FROM documents GROUP BY 1, 2),
         tot AS (
           SELECT CAST(SUM(n) AS BIGINT) AS ntot,
                  CAST(COUNT(*) AS BIGINT) AS n_cells,
                  SUM(s_i) AS stot
           FROM cells),
         t AS (
           SELECT ntot, n_cells,
                  CAST(ROUND(n * (((CAST(s_i AS DOUBLE) / CAST(stot AS DOUBLE))
                    * (CAST(ntot AS DOUBLE) / n))
                    * ((CAST(s_i AS DOUBLE) / CAST(stot AS DOUBLE))
                    * (CAST(ntot AS DOUBLE) / n))), 12) AS DECIMAL(38,12))
                    AS t2,
                  CAST(ROUND(n * ((CAST(s_i AS DOUBLE) / CAST(stot AS DOUBLE))
                    * (CAST(ntot AS DOUBLE) / n)), 12) AS DECIMAL(38,12))
                    AS t1
           FROM cells CROSS JOIN tot),
         m AS (
           SELECT MAX(ntot) AS n_docs, MAX(n_cells) AS n_cells,
                  SUM(t1) AS sw1, SUM(t2) AS sw2
           FROM t)
         SELECT n_docs, n_cells,
                CASE WHEN CAST(sw2 AS DOUBLE) <= 0.0 THEN NULL
                ELSE ROUND(CAST(sw1 AS DOUBLE) * CAST(sw1 AS DOUBLE)
                     / CAST(sw2 AS DOUBLE), 2) + 0.0 END AS ess,
                CASE WHEN CAST(sw2 AS DOUBLE) <= 0.0 THEN NULL
                ELSE ROUND(CAST(sw1 AS DOUBLE) * CAST(sw1 AS DOUBLE)
                     / CAST(sw2 AS DOUBLE)
                     / CAST(n_docs AS DOUBLE), 6) + 0.0 END
                  AS ess_ratio
         FROM m"""),
  )
}
