package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** In-engine trained quality model: fit a linear scorer to document
  * features in ONE corpus pass, then score every document with it —
  * the fastText/logistic "quality classifier" stage of an LLM data
  * pipeline, reduced to what a distributed engine can make EXACT.
  *
  * The fit is ordinary least squares on two features via the normal
  * equations: the only data-dependent quantities are nine moment sums
  * (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y). Each per-doc
  * feature is a deterministic double (integer ratios — identical on
  * every engine) pinned to DECIMAL(12,6) (a double never sits exactly
  * on a decimal midpoint, so the cast is engine-exact), products and
  * sums then stay in exact decimal arithmetic — ORDER-FREE, so the
  * moments are partition-layout-proof and engine-identical. The 3×3
  * Cramer solve runs on doubles cast from those exact decimals with
  * TEXTUALLY IDENTICAL formulas on both engines (the shared string
  * constants below are spliced into the Spark selectExpr AND the
  * DuckDB oracle),
  * so the coefficients — and every downstream score — hash-match
  * bit-for-bit. This is also the honest 100 TB shape: one scan, a
  * 9-number reduce, a driver-free closed-form solve, then a map-side
  * scoring pass with the coefficient row broadcast.
  *
  * Label: the text_quality heuristic y = min(1, nt/200)·(1 − stopword
  * ratio) — a PRODUCT, so the linear fit is honest (R² < 1, residuals
  * carry signal) while remaining fully deterministic.
  */
object Quality {

  /** Feature/label SQL, identical dialect on both engines after the
    * per-engine word-count macro is spliced in. */
  private def featsSql(nt: String, nStop: String): Seq[String] = Seq(
    s"CAST(least(1.0, $nt / 200.0) AS DECIMAL(12,6)) AS x1",
    s"CAST($nStop / CAST($nt AS DOUBLE) AS DECIMAL(12,6)) AS x2",
    s"CAST(least(1.0, $nt / 200.0) * " +
      s"(1.0 - $nStop / CAST($nt AS DOUBLE)) AS DECIMAL(12,6)) AS y")

  private val sparkFeats = featsSql(
    "size(split(text, ' '))",
    "size(filter(split(text, ' '), " +
      "t -> array_contains(array('join','filter','sort','hash','scan'), t)))")

  private val duckFeats = featsSql(
    "len(string_split(text, ' '))",
    "len(list_filter(string_split(text, ' '), " +
      "t -> list_contains(['join','filter','sort','hash','scan'], t)))")
    .mkString(",\n                   ")

  /** The nine exact-decimal moments, one aggregate. */
  private val momentsSeq = Seq(
    "CAST(COUNT(*) AS DOUBLE) AS n",
    "CAST(SUM(x1) AS DOUBLE) AS s1",
    "CAST(SUM(x2) AS DOUBLE) AS s2",
    "CAST(SUM(x1 * x1) AS DOUBLE) AS s11",
    "CAST(SUM(x1 * x2) AS DOUBLE) AS s12",
    "CAST(SUM(x2 * x2) AS DOUBLE) AS s22",
    "CAST(SUM(y) AS DOUBLE) AS sy",
    "CAST(SUM(x1 * y) AS DOUBLE) AS s1y",
    "CAST(SUM(x2 * y) AS DOUBLE) AS s2y")
  private val momentsSql = momentsSeq.mkString(",\n                   ")

  /** Cramer's rule for the symmetric 3×3 normal equations — spliced
    * verbatim into both engines so every float op runs in the same
    * order on the same inputs. */
  private val detSql =
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2))"
  private val b0Sql =
    s"((sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / $detSql)"
  private val b1Sql =
    s"((n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / $detSql)"
  private val b2Sql =
    s"((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / $detSql)"

  val qs: Seq[Q] = Seq(

    // The fit surface: coefficients + R² from one corpus pass. R²'s
    // residual sum replays the per-doc prediction inside the same
    // moments algebra (SSE = Σy² − b·[Sy,S1y,S2y] would reintroduce
    // float-order hazards, so it is computed from a SECOND exact pass
    // with the broadcast coefficients — still scan-local).
    Q("quality_train",
      (s, d) => {
        val feats = documents(s, d)
          .selectExpr("doc_id" +: sparkFeats: _*)
        val m = feats.selectExpr(momentsSeq: _*)
          .selectExpr("n", "sy",
            s"round($b0Sql, 6) AS b0",
            s"round($b1Sql, 6) AS b1",
            s"round($b2Sql, 6) AS b2",
            b0Sql + " AS rb0", b1Sql + " AS rb1", b2Sql + " AS rb2")
        // R² from exact decimal sums of the rounded-coefficient
        // predictions: pin each residual to DECIMAL(12,6) first so the
        // two sums are order-free on both engines
        val scored = feats.crossJoin(broadcast(m))
          .selectExpr("y",
            "CAST(sy / n AS DOUBLE) AS ybar",
            "CAST(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE) AS DECIMAL(12,6)) AS yhat")
          .selectExpr(
            "CAST(SUM(CAST((CAST(y AS DOUBLE) - CAST(yhat AS DOUBLE)) * (CAST(y AS DOUBLE) - CAST(yhat AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE) AS sse",
            "CAST(SUM(CAST((CAST(y AS DOUBLE) - ybar) * (CAST(y AS DOUBLE) - ybar) AS DECIMAL(18,12))) AS DOUBLE) AS sst")
        m.crossJoin(broadcast(scored))
          .selectExpr("CAST(n AS BIGINT) AS n_docs", "b0", "b1", "b2",
            "round(1.0 - sse / sst, 6) AS r2")
      },
      s"""WITH feats AS (
            SELECT doc_id, $duckFeats
            FROM documents),
          m AS (
            SELECT $momentsSql
            FROM feats),
          coef AS (
            SELECT n,
                   round($b0Sql, 6) AS b0,
                   round($b1Sql, 6) AS b1,
                   round($b2Sql, 6) AS b2,
                   $b0Sql AS rb0, $b1Sql AS rb1, $b2Sql AS rb2,
                   sy
            FROM m),
          scored AS (
            SELECT CAST(SUM(CAST((CAST(y AS DOUBLE) - CAST(yhat AS DOUBLE)) * (CAST(y AS DOUBLE) - CAST(yhat AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE) AS sse,
                   CAST(SUM(CAST((CAST(y AS DOUBLE) - ybar) * (CAST(y AS DOUBLE) - ybar) AS DECIMAL(18,12))) AS DOUBLE) AS sst
            FROM (
              SELECT y, CAST(sy / n AS DOUBLE) AS ybar,
                     CAST(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE) AS DECIMAL(12,6)) AS yhat
              FROM feats CROSS JOIN coef))
          SELECT CAST(n AS BIGINT) AS n_docs, b0, b1, b2,
                 round(1.0 - sse / sst, 6) AS r2
          FROM coef CROSS JOIN scored"""),

    // The apply surface: every document scored map-side with the
    // broadcast coefficient row; residual = heuristic label − linear
    // prediction (the docs the linear model mis-ranks are exactly the
    // ones a human would audit when promoting the scorer); the + 0.0
    // normalizes IEEE -0.0 residuals so both engines emit +0.0.
    Q("quality_score",
      (s, d) => {
        val feats = documents(s, d)
          .selectExpr("doc_id" +: sparkFeats: _*)
        val m = feats.selectExpr(momentsSeq: _*)
          .selectExpr(b0Sql + " AS rb0", b1Sql + " AS rb1", b2Sql + " AS rb2")
        feats.crossJoin(broadcast(m))
          .selectExpr("doc_id",
            "round(CAST(y AS DOUBLE), 4) AS label",
            "round(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE), 4) AS predicted",
            "round(CAST(y AS DOUBLE) - (rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE)), 4) + 0.0 AS residual")
          .orderBy("doc_id")
      },
      s"""WITH feats AS (
            SELECT doc_id, $duckFeats
            FROM documents),
          m AS (
            SELECT $momentsSql
            FROM feats),
          coef AS (
            SELECT $b0Sql AS rb0, $b1Sql AS rb1, $b2Sql AS rb2
            FROM m)
          SELECT doc_id,
                 round(CAST(y AS DOUBLE), 4) AS label,
                 round(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE), 4) AS predicted,
                 round(CAST(y AS DOUBLE) - (rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE)), 4) + 0.0 AS residual
          FROM feats CROSS JOIN coef
          ORDER BY doc_id"""),

    // The missing third of the scorer lifecycle: HELD-OUT evaluation.
    // Train on the md5-90% split, evaluate on the unseen 10% — the
    // out-of-sample MSE/R² that decides whether the scorer is promoted
    // (in-sample R² from quality_train always flatters). Same exact-
    // decimal moments + Cramer solve, fit ONLY on train rows; test
    // residuals pinned to decimals so both sums are order-free. The
    // honest 100 TB shape: the split is a map-side hash predicate, the
    // fit is still one 9-number reduce over train, the eval one
    // decimal reduce over test.
    Q("quality_eval",
      (s, d) => {
        val isTrain =
          "conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) % 10 < 9"
        val feats = documents(s, d)
          .selectExpr("doc_id" +: s"($isTrain) AS is_train" +: sparkFeats: _*)
        val m = feats.filter(col("is_train"))
          .selectExpr(momentsSeq: _*)
          .selectExpr("CAST(n AS BIGINT) AS n_train",
            s"round($b0Sql, 6) AS b0",
            s"round($b1Sql, 6) AS b1",
            s"round($b2Sql, 6) AS b2",
            b0Sql + " AS rb0", b1Sql + " AS rb1", b2Sql + " AS rb2")
        val test = feats.filter(!col("is_train"))
        val tstats = test.agg(
          count(lit(1)).as("n_test"),
          (sum(col("y")).cast("double") / count(lit(1))).as("ybar_t"))
        val ev = test.crossJoin(broadcast(m))
          .crossJoin(broadcast(tstats))
          .selectExpr("n_test", "ybar_t",
            "CAST(y AS DOUBLE) AS yd",
            "CAST(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE) AS DECIMAL(12,6)) AS yhat")
          .groupBy("n_test")
          .agg(
            expr("CAST(SUM(CAST((yd - CAST(yhat AS DOUBLE)) * (yd - CAST(yhat AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE)").as("sse"),
            expr("CAST(SUM(CAST((yd - ybar_t) * (yd - ybar_t) AS DECIMAL(18,12))) AS DOUBLE)").as("sst"))
        m.crossJoin(broadcast(ev))
          .selectExpr("n_train", "n_test", "b0", "b1", "b2",
            "round(sse / n_test, 6) AS mse_test",
            "round(1.0 - sse / sst, 6) AS r2_test")
      },
      s"""WITH feats AS (
            SELECT doc_id,
                   (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 9) AS is_train,
                   $duckFeats
            FROM documents),
          m AS (
            SELECT $momentsSql
            FROM feats WHERE is_train),
          coef AS (
            SELECT CAST(n AS BIGINT) AS n_train,
                   round($b0Sql, 6) AS b0,
                   round($b1Sql, 6) AS b1,
                   round($b2Sql, 6) AS b2,
                   $b0Sql AS rb0, $b1Sql AS rb1, $b2Sql AS rb2
            FROM m),
          tstats AS (
            SELECT COUNT(*) AS n_test,
                   CAST(SUM(y) AS DOUBLE) / COUNT(*) AS ybar_t
            FROM feats WHERE NOT is_train),
          ev AS (
            SELECT n_test,
                   CAST(SUM(CAST((yd - CAST(yhat AS DOUBLE)) * (yd - CAST(yhat AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE) AS sse,
                   CAST(SUM(CAST((yd - ybar_t) * (yd - ybar_t) AS DECIMAL(18,12))) AS DOUBLE) AS sst
            FROM (
              SELECT n_test, ybar_t, CAST(y AS DOUBLE) AS yd,
                     CAST(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE) AS DECIMAL(12,6)) AS yhat
              FROM feats CROSS JOIN coef CROSS JOIN tstats
              WHERE NOT is_train)
            GROUP BY n_test)
          SELECT n_train, n_test, b0, b1, b2,
                 round(sse / n_test, 6) AS mse_test,
                 round(1.0 - sse / sst, 6) AS r2_test
          FROM coef CROSS JOIN ev"""),

    // CALIBRATION (reliability table) — the eval-ops verb after
    // quality_eval's MSE/R²: bucket predictions into FIXED-WIDTH 0.1
    // bins (map-side floor, never an ntile — a bin boundary must not
    // depend on a global sort) and compare mean prediction to mean
    // label per bin; a well-calibrated scorer tracks the diagonal.
    // Same fit-once moments + broadcast coefficients; per-bin means
    // from exact decimal sums, n-weighted.
    Q("quality_calibration",
      (s, d) => {
        val feats = documents(s, d)
          .selectExpr("doc_id" +: sparkFeats: _*)
        val m = feats.selectExpr(momentsSeq: _*)
          .selectExpr(b0Sql + " AS rb0", b1Sql + " AS rb1",
            b2Sql + " AS rb2")
        feats.crossJoin(broadcast(m))
          .selectExpr("y",
            "CAST(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE) AS DECIMAL(12,6)) AS yhat")
          // bin on the DOUBLE form exactly as the oracle does —
          // decimal×10 floor could disagree with double×10 floor at
          // an exact bin boundary
          .withColumn("bin",
            greatest(lit(0L), least(lit(10L),
              floor(col("yhat").cast("double") * 10))).cast("int"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            round(sum(col("yhat")).cast("double") / count(lit(1)), 6)
              .as("mean_pred"),
            round(sum(col("y")).cast("double") / count(lit(1)), 6)
              .as("mean_label"))
          .orderBy("bin")
      },
      s"""WITH feats AS (
            SELECT doc_id, $duckFeats
            FROM documents),
          m AS (
            SELECT $momentsSql
            FROM feats),
          coef AS (
            SELECT $b0Sql AS rb0, $b1Sql AS rb1, $b2Sql AS rb2
            FROM m),
          scored AS (
            SELECT y,
                   CAST(rb0 + rb1 * CAST(x1 AS DOUBLE) + rb2 * CAST(x2 AS DOUBLE) AS DECIMAL(12,6)) AS yhat
            FROM feats CROSS JOIN coef)
          SELECT CAST(greatest(0, least(10,
                   floor(CAST(yhat AS DOUBLE) * 10))) AS INT) AS bin,
                 COUNT(*) AS n,
                 round(CAST(SUM(yhat) AS DOUBLE) / COUNT(*), 6)
                   AS mean_pred,
                 round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)
                   AS mean_label
          FROM scored GROUP BY 1 ORDER BY bin"""),

    // THRESHOLD SWEEP — the filter-tuning table: for nine candidate
    // cutoffs over the deterministic quality label y, how many
    // documents survive, what corpus share that is, and the mean
    // quality of the kept set. This is the relation a curation team
    // reads to pick curate_corpus's cutoff. The 9-row threshold
    // relation broadcasts against the one-pass features (9× map-side
    // expansion, one partial-agg exchange on t); shares and means are
    // exact integer-unit divisions. y is DECIMAL(12,6); the cutoffs
    // are DECIMAL(3,1), so every comparison is exact on both engines.
    Q("quality_threshold_sweep",
      (s, d) => {
        val feats = documents(s, d).selectExpr("doc_id" +: sparkFeats: _*)
        val tot = feats.agg(count(lit(1)).as("total"))
        val th = s.range(1, 10)
          .selectExpr("CAST(id / 10.0 AS DECIMAL(3,1)) AS t")
        feats.crossJoin(broadcast(th))
          .filter(col("y") >= col("t"))
          .groupBy("t")
          .agg(count(lit(1)).as("n_kept"),
            sum((col("y") * 1000000).cast("long")).as("sy_u"))
          .crossJoin(broadcast(tot))
          .select(col("t").cast("double").as("threshold"),
            col("n_kept"),
            (expr("(n_kept * 1000000L + total div 2) div total")
              .cast("double") / 10000.0).as("kept_pct"),
            (expr("(sy_u + n_kept div 2) div n_kept")
              .cast("double") / 1000000.0).as("mean_y_kept"))
          .orderBy("threshold")
      },
      s"""WITH feats AS (
            SELECT doc_id, $duckFeats
            FROM documents),
          th AS (
            SELECT CAST(t / 10.0 AS DECIMAL(3,1)) AS t
            FROM unnest(range(1, 10)) AS r(t)),
          tot AS (SELECT COUNT(*) AS total FROM feats),
          kept AS (
            SELECT t, COUNT(*) AS n_kept,
                   SUM(CAST(y * 1000000 AS BIGINT)) AS sy_u
            FROM feats CROSS JOIN th
            WHERE y >= t GROUP BY t)
          SELECT CAST(t AS DOUBLE) AS threshold,
                 CAST(n_kept AS BIGINT) AS n_kept,
                 CAST((n_kept * 1000000 + total // 2) // total AS DOUBLE)
                   / 10000.0 AS kept_pct,
                 CAST((sy_u + n_kept // 2) // n_kept AS DOUBLE)
                   / 1000000.0 AS mean_y_kept
          FROM kept, tot ORDER BY threshold"""),
  )
}
