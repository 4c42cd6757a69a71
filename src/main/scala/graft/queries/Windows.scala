package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.5).
  *
  * Every window `orderBy` carries a unique tiebreak column (R3) so
  * rank/lag results are total-order deterministic and hash-comparable.
  *
  * Scale note: a window over `partitionBy(k)` shuffles once on k and
  * sorts within partitions — same cost shape as a groupBy on k. The
  * pathological case is a window with no partitionBy (single-partition
  * global sort); none of these do that except via the final presentation
  * `orderBy`, which is a driver-bound small result anyway.
  */
object Windows {

  val qs: Seq[Q] =
    baseQs :+ rollingSlope :+ shareOfGroup :+ frameExclude :+ ytdReset

  private def baseQs: Seq[Q] = Seq(
    Q("win_rank", (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 10)
        .orderBy("c_mktsegment", "rn")
    },
      """SELECT * FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
           FROM customer
           WINDOW w AS (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC, c_custkey ASC))
         WHERE rn <= 10
         ORDER BY c_mktsegment, rn"""),

    Q("win_topk_per_group", (s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(desc("p_retailprice"), asc("p_partkey"))
      part(s, d).select(col("p_brand"), col("p_partkey"),
          col("p_retailprice"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    },
      """SELECT * FROM (
           SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
           FROM part)
         WHERE rn <= 3 ORDER BY p_brand, rn"""),

    // Inter-event gap per user in integer µs (R2: epoch-µs on both sides).
    Q("win_lag_lead", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t"))
        .select(col("user_id"), col("event_id"),
          (col("t") - lag(col("t"), 1).over(w)).as("gap_us"),
          (lead(col("t"), 1).over(w) - col("t")).as("next_gap_us"))
        .orderBy("user_id", "event_id")
    },
      """SELECT user_id, event_id,
                t - LAG(t, 1) OVER w AS gap_us,
                LEAD(t, 1) OVER w - t AS next_gap_us
         FROM (SELECT user_id, event_id, epoch_us(ts) AS t FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
         ORDER BY user_id, event_id"""),

    Q("win_running_sum", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          dsumOver(col("o_totalprice"), 2, w).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },
      """SELECT o_custkey, o_orderkey,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 2) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey"""),

    // 30-day trailing RANGE frame over an epoch-day key.
    Q("win_range_frame", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rangeBetween(-30, Window.currentRow)
      orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          unix_date(col("o_orderdate").cast("date")).as("day"),
          col("o_totalprice"))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          dsumOver(col("o_totalprice"), 2, w).as("trailing_30d"))
        .orderBy("o_custkey", "o_orderkey")
    },
      """SELECT o_custkey, o_orderkey, day,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY day
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 2) AS trailing_30d
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS day
               FROM orders)
         ORDER BY o_custkey, o_orderkey"""),

    // first/last/nth over the full partition frame (explicit frame so
    // last_value sees the whole partition, not the running default)
    Q("win_first_last", (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"),
        first(col("c_custkey")).over(w).as("richest"),
        last(col("c_custkey")).over(w).as("poorest"),
        nth_value(col("c_custkey"), 2).over(w).as("runner_up"))
        .orderBy("c_mktsegment", "c_custkey")
    },
      """SELECT c_mktsegment, c_custkey,
                FIRST_VALUE(c_custkey) OVER w AS richest,
                LAST_VALUE(c_custkey) OVER w AS poorest,
                NTH_VALUE(c_custkey, 2) OVER w AS runner_up
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
         ORDER BY c_mktsegment, c_custkey"""),

    // ntile/percent_rank/cume_dist over a total order (unique tiebreak ⇒
    // rank == row_number ⇒ all three deterministic; the small rationals
    // they produce are computed identically in both engines).
    Q("win_ntile", (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
        .orderBy("c_mktsegment", "c_custkey")
    },
      """SELECT c_mktsegment, c_custkey,
                NTILE(4) OVER w AS quartile,
                ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
                ROUND(CUME_DIST() OVER w, 6) AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey ASC)
         ORDER BY c_mktsegment, c_custkey"""),

    // Time-interval RANGE frame: per-user trailing 1-hour event count
    // and value sum. Spark has no INTERVAL range frames over timestamps,
    // so both engines run the frame over integer epoch-µs — the exact
    // same 3.6e9-µs lookback, and the formulation that survives any
    // timezone/precision drift. One shuffle on user_id; the frame is
    // evaluated with a sliding two-pointer pass inside each partition.
    Q("win_range_interval",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("t_us"))
          .rangeBetween(-3600000000L, 0L)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h", dsumOver(col("value"), 2, w))
          .select("event_id", "user_id", "t_us", "n_1h", "sum_1h")
          .orderBy("user_id", "t_us", "event_id")
      },
      """SELECT event_id, user_id, epoch_us(ts) AS t_us,
                COUNT(*) OVER w AS n_1h,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
                      AS DOUBLE), 2) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, t_us, event_id"""),

    // Forward fill (last-observation-carried-forward) — the time-series
    // repair for sensor dropout. Every 3rd event's value is nulled
    // deterministically, then last(..., ignoreNulls) carries the prior
    // observation forward per user; a user's leading nulls stay null in
    // both engines. Values pass through un-arithmetic'd, so doubles
    // hash exactly.
    Q("win_forward_fill",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("t_us"),
            when(col("event_id") % 3 === 0, lit(null))
              .otherwise(col("value")).as("v"))
          .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
          .orderBy("user_id", "t_us", "event_id")
      },
      """SELECT user_id, event_id, epoch_us(ts) AS t_us,
                CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v,
                LAST_VALUE(CASE WHEN event_id % 3 = 0 THEN NULL
                           ELSE value END IGNORE NULLS) OVER w AS v_filled
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, t_us, event_id"""),

    // Running COUNT(DISTINCT) — not directly expressible as a window
    // in either engine, so both run the same two-step formulation:
    // flag each (user, type)'s first occurrence with a rank window,
    // then running-sum the flags. Both windows key on user_id first,
    // so the sort-within-partition is the only extra cost over one
    // window.
    Q("win_cumulative_distinct",
      (s, d) => {
        val wFirst = Window.partitionBy("user_id", "event_type")
          .orderBy("t_us", "event_id")
        val wRun = Window.partitionBy("user_id").orderBy("t_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("t_us"))
          .withColumn("first_seen",
            (row_number().over(wFirst) === 1).cast("long"))
          .withColumn("types_so_far", sum(col("first_seen")).over(wRun))
          .select("user_id", "event_id", "t_us", "types_so_far")
          .orderBy("user_id", "t_us", "event_id")
      },
      """WITH flagged AS (
           SELECT user_id, event_id, epoch_us(ts) AS t_us,
                  CASE WHEN ROW_NUMBER() OVER (
                         PARTITION BY user_id, event_type
                         ORDER BY epoch_us(ts), event_id) = 1
                       THEN 1 ELSE 0 END AS first_seen
           FROM events)
         SELECT user_id, event_id, t_us,
                CAST(SUM(first_seen) OVER (PARTITION BY user_id
                  ORDER BY t_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS types_so_far
         FROM flagged ORDER BY user_id, t_us, event_id"""),

    // Per-group standardization (z-score) — the feature-engineering
    // staple before any model consumes a metric. Group stats via one
    // aggregate broadcast back onto the scan (no per-row window state);
    // rounded at 4 decimals since sample-stddev summation order
    // differs between engines at the last ulp.
    Q("win_zscore",
      (s, d) => {
        val stats = events(s, d).groupBy("event_type")
          .agg(avg(col("value")).as("mu"),
            stddev_samp(col("value")).as("sigma"))
        events(s, d)
          .join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            round((col("value") - col("mu")) / col("sigma"), 4)
              .as("zscore"))
          .orderBy("event_id")
      },
      """WITH stats AS (
           SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
           FROM events GROUP BY 1)
         SELECT event_id, e.event_type, value,
                ROUND((value - mu) / sigma, 4) AS zscore
         FROM events e JOIN stats USING (event_type)
         ORDER BY event_id"""),

    // Longest consecutive-day activity streak per user (retention/
    // engagement staple) — the day-level gaps-and-islands: group id =
    // epoch_day − row_number is constant exactly along a run of
    // consecutive days. All-integer arithmetic, so both engines agree
    // bit-for-bit. ONE user_id exchange total: the (user, day) dedup
    // repartitions by user_id and collapses map-side (distinctPairs
    // pattern), and the window + both aggregates all cluster on
    // user_id over that same exchange.
    Q("win_streak",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val days = events(s, d)
          .select(col("user_id"),
            date_trunc("DAY", col("ts")).cast("date").as("day"))
          .repartition(col("user_id"))
          .dropDuplicates("user_id", "day")
        val w = Window.partitionBy("user_id").orderBy("day")
        days
          .withColumn("grp",
            datediff(col("day"), lit("1970-01-01").cast("date"))
              .cast("bigint") - row_number().over(w))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max("len").as("max_streak"),
            count(lit(1)).as("n_streaks"))
          .orderBy("user_id")
      },
      """WITH days AS (
           SELECT DISTINCT user_id,
                  CAST(date_trunc('day', ts) AS DATE) AS day
           FROM events),
         r AS (
           SELECT user_id, day,
                  date_diff('day', DATE '1970-01-01', day) -
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY day) AS grp
           FROM days),
         streaks AS (
           SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2)
         SELECT user_id, MAX(len) AS max_streak, COUNT(*) AS n_streaks
         FROM streaks GROUP BY user_id ORDER BY user_id"""),

    // ROLLING MEDIAN — the robust companion to win_rolling_stats'
    // mean/stddev (one outlier wrecks a rolling mean; the median
    // shrugs): 7-row trailing median of event value per user. A
    // percentile aggregate over a ROWS frame — Spark evaluates
    // percentile() per frame, DuckDB's quantile_cont has a native
    // sliding-window path; both define the 0.5 quantile by linear
    // interpolation on the sorted frame, midpoints are exact IEEE
    // means of identical doubles, rounded once. Same single user_id
    // sort-exchange as every rolling key.
    Q("win_rolling_median",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("t"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t"), col("value"))
          .withColumn("med7",
            round(expr("percentile(value, 0.5D)")
              .over(w), 4))
          .select("event_id", "user_id", "med7")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
                ROUND(quantile_cont(value, 0.5) OVER (
                  PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
         FROM events ORDER BY event_id"""),
  )

  /** Exact decimal windowed sum, emitted as ROUND(CAST(.. AS DOUBLE), s)
    * (same rationale as Tables.dsum). */
  private def dsumOver(c: org.apache.spark.sql.Column, scale: Int,
      w: org.apache.spark.sql.expressions.WindowSpec) =
    round(sum(c.cast(org.apache.spark.sql.types.DecimalType(18, scale)))
      .over(w).cast("double"), scale)

  /** ROLLING OLS SLOPE — the local-trend feature every forecasting
    * pipeline engineers: per user, the least-squares slope of value
    * vs. in-series position over the trailing 7 rows. All four frame
    * sums (Σt, Σt², Σv, Σtv) are EXACT (BIGINT positions from a
    * row_number over the same user partition; value quantized to
    * DECIMAL(12,4) once, the cross term widened to DECIMAL(24,4)), so
    * the closed-form slope is one deterministic double expression on
    * hash-stable inputs. The row_number and the four frame aggregates
    * share ONE user-keyed sort exchange. Positions are in-partition
    * ranks, so the denominator n·Σt²−(Σt)² is never zero for n ≥ 2.
    */
  /** PERCENT-OF-GROUP — each order's share of its customer's lifetime
    * spend: one partitioned window sum (no ordering — a full-partition
    * frame, so no sort exchange beyond the hash partition), share in
    * exact 1e-4 integer units of exact cents. The per-row
    * normalization every contribution/mix report uses.
    */
  private def shareOfGroup: Q = Q("win_share_of_group",
    (s, d) => {
      val o = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("pc"))
      val w = Window.partitionBy("o_custkey")
      o.withColumn("tot", sum(col("pc")).over(w))
        .select(col("o_orderkey"), col("o_custkey"),
          (col("pc").cast("double") / 100.0).as("price"),
          (expr("(pc * 1000000L + tot div 2) div tot")
            .cast("double") / 10000.0).as("share_of_customer_pct"))
        .orderBy("o_orderkey")
    },
    """WITH o AS (
         SELECT o_orderkey, o_custkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS pc
         FROM orders),
       t AS (
         SELECT o_orderkey, o_custkey, pc,
                SUM(pc) OVER (PARTITION BY o_custkey) AS tot
         FROM o)
       SELECT o_orderkey, o_custkey,
              CAST(pc AS DOUBLE) / 100.0 AS price,
              CAST((pc * 1000000 + tot // 2) // tot AS DOUBLE)
                / 10000.0 AS share_of_customer_pct
       FROM t ORDER BY o_orderkey""")

  // def (not val): referenced from qs above, which initializes first
  private def rollingSlope: Q = Q("win_rolling_slope",
    (s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(12, 4))
          .as("v"))
      val wo = Window.partitionBy("user_id").orderBy("t", "event_id")
      val wf = wo.rowsBetween(-6, 0)
      val pos = ev.withColumn("rn",
        row_number().over(wo).cast("long"))
        .withColumn("tv", (col("rn") * col("v"))
          .cast(org.apache.spark.sql.types.DecimalType(24, 4)))
      pos
        .withColumn("n", count(lit(1)).over(wf))
        .withColumn("st", sum(col("rn")).over(wf))
        .withColumn("st2", sum(col("rn") * col("rn")).over(wf))
        .withColumn("sv", sum(col("v")).over(wf))
        .withColumn("stv", sum(col("tv")).over(wf))
        .select(col("event_id"), col("user_id"), col("n").as("roll_n"),
          when(col("n") > 1,
            round((col("n") * col("stv").cast("double") -
              col("st") * col("sv").cast("double")) /
              (col("n") * col("st2") - col("st") * col("st"))
                .cast("double"), 6) + 0.0)
            .as("slope"))
        .orderBy("event_id")
    },
    """WITH ev AS (
         SELECT event_id, user_id, epoch_us(ts) AS t,
                CAST(value AS DECIMAL(12,4)) AS v
         FROM events),
       p AS (
         SELECT event_id, user_id, t, v,
                CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY t, event_id) AS BIGINT) AS rn
         FROM ev),
       r AS (
         SELECT event_id, user_id,
                COUNT(*) OVER fr AS n,
                SUM(rn) OVER fr AS st,
                SUM(rn * rn) OVER fr AS st2,
                SUM(v) OVER fr AS sv,
                SUM(CAST(rn * v AS DECIMAL(24,4))) OVER fr AS stv
         FROM p
         WINDOW fr AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       SELECT event_id, user_id, n AS roll_n,
              CASE WHEN n > 1 THEN
                ROUND((n * CAST(stv AS DOUBLE) -
                       st * CAST(sv AS DOUBLE)) /
                      CAST(n * st2 - st * st AS DOUBLE), 6) + 0.0
              END AS slope
       FROM r ORDER BY event_id""")

  // Frame EXCLUDE CURRENT ROW (peer average: "how do my ±3 neighbours
  // price, not counting me") — Spark frames have no EXCLUDE clause, so
  // the engine computes the inclusive frame's sum/count once and
  // subtracts the current row: identical relation, one window pass, and
  // the subtraction form is actually cheaper than a second frame. The
  // oracle spells the literal EXCLUDE CURRENT ROW. Money goes through
  // the DECIMAL(18,2)→integer-cents path and the peer mean is an exact
  // integer division in 1e-4 dollar units (ROUND-tie-proof; verify-skill
  // rule), NULL when the customer has a lone order (empty peer frame on
  // both engines).
  private def frameExclude: Q = Q("win_frame_exclude",
    (s, d) => {
      val fr = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey").rowsBetween(-3, 3)
      orders(s, d)
        .withColumn("cents",
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .withColumn("sum_fr", sum("cents").over(fr))
        .withColumn("n_fr", count("cents").over(fr))
        .select(col("o_custkey"), col("o_orderkey"),
          (col("n_fr") - 1).as("n_peers"),
          expr("""CASE WHEN n_fr > 1 THEN
                    ((sum_fr - cents) * 100 + (n_fr - 1) div 2)
                      div (n_fr - 1) / 10000.0D END""").as("peer_avg"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS cents FROM orders),
         w AS (SELECT o_custkey, o_orderkey,
           sum(cents) OVER fr AS sum_ex,
           count(cents) OVER fr AS n_peers
          FROM c WINDOW fr AS (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
            EXCLUDE CURRENT ROW))
       SELECT o_custkey, o_orderkey, CAST(n_peers AS BIGINT) AS n_peers,
              CASE WHEN n_peers > 0 THEN
                (sum_ex * 100 + n_peers // 2) // n_peers / 10000.0
              END AS peer_avg
       FROM w ORDER BY o_custkey, o_orderkey""")

  // YTD RUNNING TOTAL WITH FISCAL RESET — the finance-report staple:
  // cumulative revenue that restarts every January. The window
  // partitions by YEAR over the month-grain aggregate (≤12 rows per
  // partition — the reset is free, it's just the partition boundary);
  // sums are exact integer cents emitted as dollars.
  private def ytdReset: Q = Q("win_ytd_reset",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))*100) AS BIGINT)")
          .as("cents"))
      val w = Window.partitionBy("y").orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
      monthly
        .withColumn("ytd_cents", sum("cents").over(w))
        .select(col("y"), col("m"),
          expr("cents / 100.0D").as("month_rev"),
          expr("ytd_cents / 100.0D").as("ytd_rev"))
        .orderBy("y", "m")
    },
    """WITH m AS (SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))*100) AS BIGINT)
             AS cents
         FROM orders GROUP BY 1, 2)
       SELECT y, m, cents / 100.0 AS month_rev,
              sum(cents) OVER (PARTITION BY y ORDER BY m
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                / 100.0 AS ytd_rev
       FROM m ORDER BY y, m""")
}
