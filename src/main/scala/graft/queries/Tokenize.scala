package graft.queries

import graft.Tables._
import graft.engine.ml.Bpe
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
  )
}
