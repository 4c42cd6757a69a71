package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Advanced analytics shapes: Pareto skyline and event funnels.
  *
  * `skyline_2d` runs the distributive formulation (Scale.skyline2D):
  * each partition computes its local skyline with an in-memory
  * sort-scan, then the tiny union is re-skylined — skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B)), so the result is identical to a
  * global O(n log n) sort-scan but no single reducer ever sees more
  * than its partition + the union of local skylines.
  */
object Analytics {

  val qs: Seq[Q] = Seq(
    Q("skyline_2d",
      (s, d) => {
        val pts = orders(s, d)
          .select(col("o_totalprice").as("price"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
        // distributive path (Scale.skyline2D): per-partition sort-scan
        // skyline, then re-skyline the tiny union — no global window, no
        // single-reducer sort. t survives the double roundtrip exactly
        // (epoch-µs < 2^53); cast back to long for the oracle's BIGINT.
        graft.engine.ops.Scale.skyline2D(pts, "price", "t")
          .select(col("price"), col("t").cast("long").as("t"))
          .orderBy(desc("price"))
      },
      """WITH pts AS (
           SELECT DISTINCT o_totalprice AS price,
                  epoch_us(o_orderdate) AS t
           FROM orders),
         scanned AS (
           SELECT price, t,
                  MAX(t) OVER (ORDER BY price DESC, t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS max_prev_t
           FROM pts)
         SELECT price, t FROM scanned
         WHERE max_prev_t IS NULL OR max_prev_t < t
         ORDER BY price DESC"""),

    // click→purchase conversion within 24h of the user's first click
    Q("funnel_conversion",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
        val firstClick = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min(col("t")).as("click_t"))
        val firstPurchase = ev.filter(col("event_type") === "purchase")
          .join(firstClick, "user_id")
          .filter(col("t") >= col("click_t"))
          .groupBy("user_id").agg(min(col("t")).as("purchase_t"))
        firstClick.join(firstPurchase, Seq("user_id"), "left")
          .select(col("user_id"), col("click_t"),
            when(col("purchase_t") - col("click_t") <= 86400000000L, 1L)
              .otherwise(0L).as("converted_24h"))
          .agg(count(lit(1)).as("n_clickers"),
            sum(col("converted_24h")).as("n_converted"),
            round(sum(col("converted_24h")) /
              count(lit(1)).cast("double"), 4).as("conversion_rate"))
      },
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t
                     FROM events),
         first_click AS (
           SELECT user_id, MIN(t) AS click_t FROM ev
           WHERE event_type = 'click' GROUP BY 1),
         first_purchase AS (
           SELECT e.user_id, MIN(e.t) AS purchase_t
           FROM ev e JOIN first_click c
             ON e.user_id = c.user_id AND e.t >= c.click_t
           WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT COUNT(*) AS n_clickers,
                CAST(SUM(CASE WHEN purchase_t - click_t <= 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
                ROUND(SUM(CASE WHEN purchase_t - click_t <= 86400000000
                          THEN 1 ELSE 0 END)
                      / CAST(COUNT(*) AS DOUBLE), 4) AS conversion_rate
         FROM first_click LEFT JOIN first_purchase USING (user_id)"""),
  )
}
