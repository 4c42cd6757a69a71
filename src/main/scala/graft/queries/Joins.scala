package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3).
  *
  * Scale notes (100 TB):
  *  - Dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *    broadcast — the fact side never shuffles for those joins.
  *  - Large-large joins (orders⋈customer, lineitem⋈orders) shuffle on the
  *    join key; AQE picks shuffled-hash vs sort-merge and splits skewed
  *    partitions at runtime. Co-partitioning via bucketing is the cluster
  *    deployment's job (`Storage.writeBucketed`), not the query's.
  *  - The range join keeps its user_id equi-term so it executes as an
  *    equi-join with a residual range filter, never a cartesian product.
  */
object Joins {

  val qs: Seq[Q] = Seq(
    Q("join_broadcast",
      (s, d) => nation(s, d)
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"), "inner")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey"),
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey"""),

    Q("join_shuffle",
      (s, d) => orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_custkey", "c_name", "c_mktsegment",
          "o_totalprice")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey"""),

    // TPC-H Q5-style: revenue per nation for one region. lineitem⋈orders
    // shuffles; customer/nation/region sides broadcast.
    Q("join_multiway",
      (s, d) => lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("n_name")),
      """SELECT n_name,
                ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'AMERICA'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name"""),

    // Co-located join: both sides written bucketed+sorted on the join
    // key (Scale.writeBucketed), so the join compiles with NO exchange
    // on either side — the recurring-large-large-join layout a 100 TB
    // deployment bakes in at write time. ScaleSpec asserts the no-
    // shuffle plan; the oracle checks the join semantics are unchanged.
    Q("join_bucketed",
      (s, d) => {
        // a fresh session's in-memory catalog forgets managed tables but
        // their warehouse dirs persist — drop both metadata AND location
        // so the bucketed write never hits LOCATION_ALREADY_EXISTS
        val wh = s.conf.get("spark.sql.warehouse.dir")
        Seq("graft_orders_bq", "graft_customer_bq").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
          p.getFileSystem(s.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
        graft.engine.ops.Scale.writeBucketed(
          orders(s, d), "graft_orders_bq", 8, Seq("o_custkey"))
        graft.engine.ops.Scale.writeBucketed(
          customer(s, d).withColumnRenamed("c_custkey", "o_custkey"),
          "graft_customer_bq", 8, Seq("o_custkey"))
        s.table("graft_orders_bq")
          .join(s.table("graft_customer_bq"), "o_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("revenue"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    Q("join_left_outer",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice"), 2), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name,
                COUNT(o_orderkey) AS n_orders,
                COALESCE(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name
         ORDER BY c_custkey"""),

    Q("join_semi",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey"""),

    // anti vs the urgent subset so both branches are non-empty at sf0.01
    Q("join_anti",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey"""),

    Q("join_full_outer",
      (s, d) => supplier(s, d).groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"))
        .join(customer(s, d).groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_customers")),
          col("s_nationkey") === col("c_nationkey"), "full")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .orderBy("nationkey"),
      """SELECT COALESCE(s.k, c.k) AS nationkey,
                COALESCE(s.n_suppliers, 0) AS n_suppliers,
                COALESCE(c.n_customers, 0) AS n_customers
         FROM (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY 1) s
         FULL JOIN (SELECT c_nationkey AS k, COUNT(*) AS n_customers
                    FROM customer GROUP BY 1) c ON s.k = c.k
         ORDER BY nationkey"""),

    Q("join_cross",
      (s, d) => region(s, d)
        .crossJoin(orders(s, d).select("o_orderstatus").distinct())
        .select("r_name", "o_orderstatus")
        .orderBy("r_name", "o_orderstatus"),
      """SELECT r_name, o_orderstatus
         FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
         ORDER BY r_name, o_orderstatus"""),

    // Interval/theta join: pairs of events of the same user ≤1h apart.
    // Comparisons are on integer epoch-µs so Spark's µs truncation of the
    // parquet ns timestamps can't drift from DuckDB's ns (SURVEY §7.4 R2).
    Q("join_range",
      (s, d) => {
        val e1 = events(s, d).select(
          col("user_id").as("u1"), unix_micros(col("ts")).as("t1"))
        val e2 = events(s, d).select(
          col("user_id").as("u2"), unix_micros(col("ts")).as("t2"))
        e1.join(e2, col("u1") === col("u2") &&
            col("t2") > col("t1") &&
            col("t2") <= col("t1") + expr("3600000000"))
          .groupBy(col("u1").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      """SELECT e1.user_id AS user_id, COUNT(*) AS n_pairs
         FROM events e1 JOIN events e2
           ON e1.user_id = e2.user_id
          AND epoch_us(e2.ts) > epoch_us(e1.ts)
          AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 3600000000
         GROUP BY 1 ORDER BY user_id"""),

    // The SCALE path for the interval join above: quantize time into
    // window-width buckets and join on (user, bucket) with the probe
    // side expanded to its two candidate buckets — every qualifying
    // pair lands in exactly one of them (distinct jb values ⇒ no
    // double count). The equi-join key gains the bucket, so a hot
    // user's join group is bounded by bucket occupancy instead of the
    // user's whole history — the difference between O(history²) and
    // O(history × bucket) on a power user at 100 TB. Same output as
    // join_range (bucketing must be invisible).
    Q("join_range_bucketed",
      (s, d) => {
        val B = 3600000000L
        val e1 = events(s, d).select(
          col("user_id").as("u1"), unix_micros(col("ts")).as("t1"))
          .withColumn("b1", expr(s"t1 div $B"))
        val e2 = events(s, d).select(
          col("user_id").as("u2"), unix_micros(col("ts")).as("t2"))
          .withColumn("b2", expr(s"t2 div $B"))
        e1.withColumn("jb", explode(array(col("b1"), col("b1") + 1)))
          .join(e2, col("jb") === col("b2") && col("u1") === col("u2") &&
            col("t2") > col("t1") && col("t2") <= col("t1") + B)
          .groupBy(col("u1").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      """SELECT e1.user_id AS user_id, COUNT(*) AS n_pairs
         FROM events e1 JOIN events e2
           ON e1.user_id = e2.user_id
          AND epoch_us(e2.ts) > epoch_us(e1.ts)
          AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 3600000000
         GROUP BY 1 ORDER BY user_id"""),

    // As-of join (no native Spark operator): each purchase event matched
    // to the same user's latest prior click. Expressed as a window scan
    // over the union — O(n log n) per user partition, one shuffle. At
    // 100 TB the same shape holds: range-partition by (user, time),
    // carry the last-click watermark per partition.
    Q("join_asof",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("last_click_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "last_click_id")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id, last_click_id FROM (
           SELECT event_id, user_id, event_type,
                  LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_click_id
           FROM events WHERE event_type IN ('click', 'purchase'))
         WHERE event_type = 'purchase' ORDER BY event_id"""),

    // Skew-treated join (Scale.saltedJoin): documents join their
    // per-language stats dim on `lang` — ~10 distinct values, so a
    // plain shuffle join piles each language onto ONE reducer while the
    // rest of the cluster idles. Salting spreads every language across
    // 16 reducers; the dim rides along replicated 16×. The oracle runs
    // the plain join — salting must be invisible in the result.
    Q("join_skew_salted",
      (s, d) => {
        val docs = documents(s, d)
        val dim = docs.groupBy("lang")
          .agg(round(avg(col("n_chars")), 4).as("lang_avg_chars"),
            count(lit(1)).as("lang_docs"))
        graft.engine.ops.Scale
          .saltedJoin(docs.select("doc_id", "lang", "n_chars"), dim,
            Seq("lang"), 16)
          .select("doc_id", "lang", "lang_avg_chars", "lang_docs")
          .orderBy("doc_id")
      },
      """WITH dim AS (
           SELECT lang, ROUND(AVG(n_chars), 4) AS lang_avg_chars,
                  COUNT(*) AS lang_docs
           FROM documents GROUP BY lang)
         SELECT doc_id, d.lang, lang_avg_chars, lang_docs
         FROM documents d JOIN dim ON d.lang = dim.lang
         ORDER BY doc_id"""),

    // Forward as-of: each click matched to the same user's EARLIEST
    // subsequent purchase (the "next conversion" lookup) — the mirror
    // of join_asof's backward scan, same one-shuffle window formulation
    // with the frame reversed.
    Q("join_asof_forward",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(1, Window.unboundedFollowing)
        ev.withColumn("next_purchase_id",
            first(when(col("event_type") === "purchase", col("event_id")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "click")
          .select("event_id", "user_id", "next_purchase_id")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id, next_purchase_id FROM (
           SELECT event_id, user_id, event_type,
                  FIRST_VALUE(CASE WHEN event_type = 'purchase'
                    THEN event_id END IGNORE NULLS) OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                    AS next_purchase_id
           FROM events WHERE event_type IN ('click', 'purchase'))
         WHERE event_type = 'click' ORDER BY event_id"""),

    // Nearest as-of (pandas merge_asof direction='nearest'): each
    // purchase matched to the temporally closest click in EITHER
    // direction — min absolute gap, ties prefer the earlier (backward)
    // side, event_id tiebreak inside the frames. Completes the as-of
    // family (backward/forward exist); still the one-shuffle window
    // formulation — the backward and forward anchors ride the SAME
    // user_id exchange, no join at all.
    Q("join_asof_nearest",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
        val ord = Window.partitionBy("user_id").orderBy("t", "event_id")
        val wb = ord.rowsBetween(Window.unboundedPreceding, -1)
        val wf = ord.rowsBetween(1, Window.unboundedFollowing)
        def clickOnly(c: org.apache.spark.sql.Column) =
          when(col("event_type") === "click", c)
        ev
          .withColumn("pb_id",
            last(clickOnly(col("event_id")), ignoreNulls = true).over(wb))
          .withColumn("pb_t",
            last(clickOnly(col("t")), ignoreNulls = true).over(wb))
          .withColumn("nf_id",
            first(clickOnly(col("event_id")), ignoreNulls = true).over(wf))
          .withColumn("nf_t",
            first(clickOnly(col("t")), ignoreNulls = true).over(wf))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            when(col("pb_id").isNull, col("nf_id"))
              .when(col("nf_id").isNull, col("pb_id"))
              .when(col("t") - col("pb_t") <= col("nf_t") - col("t"),
                col("pb_id"))
              .otherwise(col("nf_id")).as("nearest_click_id"))
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
                CASE WHEN pb_id IS NULL THEN nf_id
                     WHEN nf_id IS NULL THEN pb_id
                     WHEN t - pb_t <= nf_t - t THEN pb_id
                     ELSE nf_id END AS nearest_click_id
         FROM (
           SELECT event_id, user_id, event_type, t,
                  LAST_VALUE(CASE WHEN event_type = 'click'
                    THEN event_id END IGNORE NULLS) OVER wb AS pb_id,
                  LAST_VALUE(CASE WHEN event_type = 'click'
                    THEN t END IGNORE NULLS) OVER wb AS pb_t,
                  FIRST_VALUE(CASE WHEN event_type = 'click'
                    THEN event_id END IGNORE NULLS) OVER wf AS nf_id,
                  FIRST_VALUE(CASE WHEN event_type = 'click'
                    THEN t END IGNORE NULLS) OVER wf AS nf_t
           FROM (SELECT event_id, user_id, event_type,
                        epoch_us(ts) AS t
                 FROM events
                 WHERE event_type IN ('click', 'purchase'))
           WINDOW wb AS (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  wf AS (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         WHERE event_type = 'purchase' ORDER BY event_id"""),

    // NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // MATCH each other instead of silently dropping — the semantics a
    // dimension join needs when "unknown" is itself a category. Keys
    // are nullified deterministically on both sides; plain equality
    // would lose the NULL↔NULL row.
    Q("join_null_safe",
      (s, d) => {
        val a = orders(s, d)
          .groupBy(expr("nullif(o_orderstatus, 'P')").as("k"))
          .agg(count(lit(1)).as("n_orders"))
        val b = lineitem(s, d)
          .groupBy(expr("nullif(l_linestatus, 'F')").as("k"))
          .agg(count(lit(1)).as("n_lines"))
        a.join(b, a("k") <=> b("k"), "left")
          .select(a("k").as("k"), col("n_orders"), col("n_lines"))
          .orderBy(col("k").asc_nulls_first)
      },
      """WITH a AS (
           SELECT NULLIF(o_orderstatus, 'P') AS k, COUNT(*) AS n_orders
           FROM orders GROUP BY 1),
         b AS (
           SELECT NULLIF(l_linestatus, 'F') AS k, COUNT(*) AS n_lines
           FROM lineitem GROUP BY 1)
         SELECT a.k, n_orders, n_lines
         FROM a LEFT JOIN b ON a.k IS NOT DISTINCT FROM b.k
         ORDER BY a.k NULLS FIRST"""),

    // Interval-OVERLAP join (both sides are intervals — distinct from
    // join_range's point-in-interval and join_temporal's
    // fact-to-version): per customer, which 7-day order windows
    // overlap? The scale path is week bucketing: a 7-day interval spans
    // EXACTLY its start bucket and the next, so each side expands 2×
    // into (custkey, bucket) equi-keys and the join is a plain hash
    // join whose group size is bounded by per-customer-per-week
    // occupancy — never history². A pair overlapping in both shared
    // buckets would emit twice; instead of a distinct (a second
    // shuffle), each pair is claimed only by the unique bucket
    // containing its overlap START — dedup by arithmetic, no exchange.
    // The oracle writes the plain quadratic inequality join: bucketing
    // must be invisible.
    Q("join_interval_overlap",
      (s, d) => {
        val iv = orders(s, d).select(
          col("o_custkey"),
          col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("bigint").as("sd"))
        def expand(keyAs: String, sdAs: String) = iv.select(
          col("o_custkey"),
          col("o_orderkey").as(keyAs),
          col("sd").as(sdAs),
          explode(array(floor(col("sd") / 7).cast("bigint"),
            floor(col("sd") / 7).cast("bigint") + 1)).as("bkt"))
        expand("key_a", "sa").join(expand("key_b", "sb"),
            Seq("o_custkey", "bkt"))
          .where(col("key_a") < col("key_b") &&
            col("sa") < col("sb") + 7 && col("sb") < col("sa") + 7 &&
            floor(greatest(col("sa"), col("sb")) / 7).cast("bigint")
              === col("bkt"))
          .select(col("o_custkey"), col("key_a"), col("key_b"),
            (least(col("sa"), col("sb")) + 7 -
              greatest(col("sa"), col("sb"))).as("overlap_days"))
          .orderBy("o_custkey", "key_a", "key_b")
      },
      """WITH iv AS (
           SELECT o_custkey, o_orderkey,
                  date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS sd
           FROM orders)
         SELECT a.o_custkey AS o_custkey, a.o_orderkey AS key_a,
                b.o_orderkey AS key_b,
                LEAST(a.sd, b.sd) + 7 - GREATEST(a.sd, b.sd) AS overlap_days
         FROM iv a JOIN iv b
           ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
          AND a.sd < b.sd + 7 AND b.sd < a.sd + 7
         ORDER BY a.o_custkey, key_a, key_b"""),

    // JOIN-STRATEGY HINTS — the operator-level override for when the
    // optimizer's cost model is wrong about YOUR data: SHUFFLE_HASH
    // forces a shuffled hash join (the right call when both sides are
    // large but one fits a per-partition hash map, and the sort in SMJ
    // is pure waste); the result must be hint-invisible. The oracle is
    // the plain join; PlanSpec pins that the hint actually flipped the
    // physical operator — hint surface without result risk.
    Q("join_hint_shuffle_hash",
      (s, d) => {
        val li = lineitem(s, d).select("l_orderkey", "l_extendedprice")
        val o = orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority"))
        li.hint("shuffle_hash")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice"), 2).as("rev"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
                ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS rev
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY o_orderpriority"""),

    // Toleranced as-of (pandas merge_asof tolerance=...): the backward
    // as-of match is DISCARDED when the anchor is staler than the
    // tolerance window (1 h here) — the semantics attribution/feature
    // pipelines need ("last click, but only if recent enough"; a
    // day-old click must not claim the conversion). Same one-shuffle
    // window formulation as join_asof — id and timestamp anchors ride
    // the same frame (total order ⇒ same source row), the tolerance is
    // a map-side post-filter on the µs gap, NOT a join: no extra
    // exchange over the plain as-of at any scale.
    Q("join_asof_tolerance",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tolUs = 3600000000L // 1 hour
        val ev = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("lc_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .withColumn("lc_t",
            last(when(col("event_type") === "click", col("t")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            when(col("t") - col("lc_t") <= tolUs, col("lc_id"))
              .as("click_in_window"),
            when(col("t") - col("lc_t") <= tolUs, col("t") - col("lc_t"))
              .as("gap_us"))
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
                CASE WHEN t - lc_t <= 3600000000 THEN lc_id END
                  AS click_in_window,
                CASE WHEN t - lc_t <= 3600000000 THEN t - lc_t END
                  AS gap_us
         FROM (
           SELECT event_id, user_id, event_type, t,
                  LAST_VALUE(CASE WHEN event_type = 'click'
                    THEN event_id END IGNORE NULLS) OVER wb AS lc_id,
                  LAST_VALUE(CASE WHEN event_type = 'click'
                    THEN t END IGNORE NULLS) OVER wb AS lc_t
           FROM (SELECT event_id, user_id, event_type,
                        epoch_us(ts) AS t
                 FROM events
                 WHERE event_type IN ('click', 'purchase'))
           WINDOW wb AS (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         WHERE event_type = 'purchase' ORDER BY event_id"""),

    // EXISTENCE-FLAG enrichment — the "semi-join as a column" pattern:
    // instead of filtering (join_semi), annotate every customer with
    // boolean has-flags from three child relations. Spark plans each
    // flag as an ExistenceJoin (a left-outer semi variant that emits
    // the match bit instead of dropping rows) when phrased as EXISTS
    // in SQL; here the equivalent distinct-key left joins keep the
    // child side pre-aggregated to one row per key, so each flag costs
    // one key-partitioned exchange of DISTINCT keys — never a row
    // multiplication. At 100 TB the distinct-key relations are the
    // cheap side and broadcast or bucket cleanly.
    Q("join_exists_flags",
      (s, d) => {
        val cust = customer(s, d).select(col("c_custkey"),
          col("c_mktsegment"))
        val hasOrder = orders(s, d).select(col("o_custkey")).distinct()
          .withColumn("f1", lit(1))
        val hasBig = orders(s, d)
          .filter(col("o_totalprice") > 300000.0)
          .select(col("o_custkey")).distinct().withColumn("f2", lit(1))
        val hasUrgent = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct().withColumn("f3", lit(1))
        cust
          .join(hasOrder, cust("c_custkey") === hasOrder("o_custkey"),
            "left").drop(hasOrder("o_custkey"))
          .join(hasBig, cust("c_custkey") === hasBig("o_custkey"),
            "left").drop(hasBig("o_custkey"))
          .join(hasUrgent, cust("c_custkey") === hasUrgent("o_custkey"),
            "left").drop(hasUrgent("o_custkey"))
          .select(col("c_custkey"), col("c_mktsegment"),
            col("f1").isNotNull.as("has_order"),
            col("f2").isNotNull.as("has_big_order"),
            col("f3").isNotNull.as("has_urgent_order"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_mktsegment,
                EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey) AS has_order,
                EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000.0)
                  AS has_big_order,
                EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
                  AS has_urgent_order
         FROM customer ORDER BY c_custkey"""),

    // NULL-KEY ISOLATION JOIN — the production skew fix nobody writes
    // down: a LEFT JOIN whose key is heavily null ships every
    // null-key row to ONE reducer (all nulls hash alike) where they
    // match nothing anyway. Isolate them: non-null rows take the real
    // join, null rows bypass it entirely (union of the two branches) —
    // same relation as the plain left join, but the null mass never
    // enters the exchange. Null keys are PLANTED deterministically
    // (suppkey nulled when orderkey ≡ 0 mod 13 — ~7.7% of rows); the
    // oracle runs the PLAIN left join on the same planted relation,
    // proving semantic equality; Round8Spec pins the plan (a union
    // whose join branch filters nulls out before the exchange).
    Q("join_null_isolated",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_orderkey"),
          when(col("l_orderkey") % 13 === 0, lit(null))
            .otherwise(col("l_suppkey")).as("sk"),
          col("l_quantity"))
        val sup = supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        val matched = li.filter(col("sk").isNotNull)
          .join(sup, col("sk") === col("s_suppkey"), "left")
          .select(col("l_orderkey"), col("sk"), col("l_quantity"),
            col("s_nationkey"))
        val nulls = li.filter(col("sk").isNull)
          .select(col("l_orderkey"), col("sk"), col("l_quantity"),
            lit(null).cast("long").as("s_nationkey"))
        matched.unionByName(nulls)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("sk").isNull, 1L).otherwise(0L))
              .as("n_null_key"),
            dsum(col("l_quantity"), 2).as("qty"))
          .orderBy(asc_nulls_first("s_nationkey"))
      },
      """WITH li AS (
           SELECT l_orderkey,
                  CASE WHEN l_orderkey % 13 = 0 THEN NULL
                       ELSE l_suppkey END AS sk,
                  l_quantity
           FROM lineitem)
         SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN sk IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_key,
                ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS qty
         FROM li LEFT JOIN supplier ON sk = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey NULLS FIRST"""),

    // ROLE-PLAYING DIMENSION (TPC-H Q7 shape): the SAME nation table
    // joined twice under two roles — the customer's nation through
    // orders→customer and the supplier's nation through supplier —
    // for the cross-border trade matrix. Both role joins broadcast
    // (nation/customer/supplier are dims); the only shuffle is
    // lineitem⋈orders on the order key, then one partial-agg
    // exchange on the ≤|nations|² group keys. Self-aliasing keeps
    // the two roles unambiguous.
    Q("join_role_playing",
      (s, d) => {
        val custNation = nation(s, d)
          .select(col("n_nationkey").as("cn_key"),
            col("n_name").as("cust_nation"))
        val suppNation = nation(s, d)
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
          .join(broadcast(supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .filter(col("cust_nation") =!= col("supp_nation"))
          .groupBy("cust_nation", "supp_nation")
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice"), 2).as("revenue"))
          .orderBy("cust_nation", "supp_nation")
      },
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                CAST(count(*) AS BIGINT) AS n_items,
                ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer cu ON o.o_custkey = cu.c_custkey
         JOIN nation cn ON cu.c_nationkey = cn.n_nationkey
         JOIN supplier su ON l.l_suppkey = su.s_suppkey
         JOIN nation sn ON su.s_nationkey = sn.n_nationkey
         WHERE cn.n_name <> sn.n_name
         GROUP BY 1, 2 ORDER BY 1, 2"""),
  )
}
