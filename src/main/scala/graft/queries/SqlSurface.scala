package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining ANSI-SQL surface a reference user exercised through Athena
  * passthrough (SURVEY §1.2 implication): correlated scalar subqueries,
  * bag semantics for EXCEPT, ordered string aggregation, interpolated
  * percentiles, unpivot. Catalyst decorrelates the scalar subquery into
  * a left outer aggregate-join — same shuffle shape as writing the join
  * by hand.
  */
object SqlSurface {

  /** The passthrough statement: one identical ANSI string runs through
    * [[graft.engine.sql.Query]] on Spark and verbatim in DuckDB — the
    * point of the passthrough surface is that users bring whole SQL
    * statements, not DataFrame programs. Joins + aggregate + window in
    * one statement; decimal-cast per row before SUM so the aggregate is
    * addition-order independent. */
  private val passthroughSql = """
    SELECT n_name, yr, revenue,
           RANK() OVER (PARTITION BY yr
                        ORDER BY revenue DESC, n_name) AS rnk
    FROM (
      SELECT n_name, year(o_orderdate) AS yr,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(1 - l_discount   AS DECIMAL(18,2)))
                  AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name, year(o_orderdate))
    ORDER BY yr, rnk, n_name"""

  /** Shared statement for sql_recursive — table name `part` patched to
    * the temp-view name on the Spark side, otherwise verbatim. */
  private val recursiveSql = """
    WITH RECURSIVE walk AS (
      SELECT p_partkey, 0 AS depth,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DECIMAL(28,2))
               AS path_cost
      FROM part WHERE p_partkey = 1
      UNION ALL
      SELECT p.p_partkey, w.depth + 1,
             CAST(w.path_cost + CAST(p.p_retailprice AS DECIMAL(18,2))
                  AS DECIMAL(28,2))
      FROM walk w
      JOIN part p ON CAST(FLOOR(p.p_partkey / 2) AS BIGINT) = w.p_partkey)
    SELECT p_partkey, depth, CAST(path_cost AS DOUBLE) AS path_cost
    FROM walk ORDER BY p_partkey"""

  val qs: Seq[Q] = Seq(
    // The reference's PRIMARY surface (SURVEY §1.2 `athena.py`
    // [RECONSTRUCTED]): register the dataset's tables once, then run an
    // arbitrary multi-table SQL statement against them. Catalyst plans
    // it like any DataFrame program: region/nation/customer broadcast
    // under the 10 MB threshold, the lineitem⋈orders join shuffles on
    // the 64-bit key, partial aggregation precedes the exchange, and
    // the window sorts only within its yr partitions.
    Q("sql_passthrough",
      (s, d) => {
        graft.engine.sql.Query.registerAll(s, d)
        graft.engine.sql.Query.sql(s, passthroughSql)
      },
      passthroughSql),
    // correlated scalar subquery → decorrelated aggregate join
    Q("subquery_scalar",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_sq")
        lineitem(s, d).createOrReplaceTempView("graft_lineitem_sq")
        s.sql("""
          SELECT o_orderkey,
                 (SELECT CAST(MAX(l_shipdate) AS DATE)
                  FROM graft_lineitem_sq
                  WHERE l_orderkey = o_orderkey) AS last_ship
          FROM graft_orders_sq
          ORDER BY o_orderkey""")
      },
      """SELECT o_orderkey,
                (SELECT CAST(MAX(l_shipdate) AS DATE) FROM lineitem
                 WHERE l_orderkey = o_orderkey) AS last_ship
         FROM orders ORDER BY o_orderkey"""),

    // correlated EXISTS / NOT EXISTS → LeftSemi + LeftAnti hash joins
    // after decorrelation; both subqueries push their own predicate
    // into the orders scan before the join
    Q("subquery_exists",
      (s, d) => {
        customer(s, d).createOrReplaceTempView("graft_customer_ex")
        orders(s, d).createOrReplaceTempView("graft_orders_ex")
        s.sql("""
          SELECT c_custkey, c_mktsegment
          FROM graft_customer_ex c
          WHERE EXISTS (SELECT 1 FROM graft_orders_ex o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
            AND NOT EXISTS (SELECT 1 FROM graft_orders_ex o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F')
          ORDER BY c_custkey""")
      },
      """SELECT c_custkey, c_mktsegment
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F')
         ORDER BY c_custkey"""),

    // FILTER-clause aggregates: per-aggregate predicates without
    // CASE-wrapping every argument — one scan, one agg, N conditions
    Q("agg_filter_clause",
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("graft_lineitem_fc")
        s.sql("""
          SELECT l_returnflag,
                 COUNT(*) AS n_all,
                 COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
                 COUNT(*) FILTER (WHERE l_discount = 0) AS n_no_disc,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   FILTER (WHERE l_quantity > 25) AS DOUBLE) AS bulk_price
          FROM graft_lineitem_fc
          GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      """SELECT l_returnflag,
                COUNT(*) AS n_all,
                COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
                COUNT(*) FILTER (WHERE l_discount = 0) AS n_no_disc,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  FILTER (WHERE l_quantity > 25) AS DOUBLE) AS bulk_price
         FROM lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // bag (ALL) semantics: multiplicities subtract instead of vanish
    Q("set_except_all",
      (s, d) => {
        val li = lineitem(s, d)
        li.select("l_partkey")
          .exceptAll(li.filter(col("l_returnflag") === "A")
            .select("l_partkey"))
          .groupBy("l_partkey").agg(count(lit(1)).as("n"))
          .orderBy("l_partkey")
      },
      """SELECT l_partkey, COUNT(*) AS n FROM (
           SELECT l_partkey FROM lineitem
           EXCEPT ALL
           SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
         GROUP BY l_partkey ORDER BY l_partkey"""),

    // ordered, distinct string aggregation
    Q("agg_stringagg",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(concat_ws(",", array_sort(collect_set(col("l_linestatus"))))
          .as("statuses"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
                string_agg(DISTINCT l_linestatus, ','
                           ORDER BY l_linestatus) AS statuses
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),

    // interpolated percentiles (same linear-interpolation definition in
    // both engines; rounded — interpolation arithmetic may differ in
    // the last ulp)
    Q("agg_percentile",
      (s, d) => orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
        .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
                ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
                ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90
         FROM orders GROUP BY 1 ORDER BY o_orderstatus"""),

    // percentile_disc — the DISCRETE quantile (an actual data value,
    // never an interpolation; what SLO/latency reporting wants, since
    // an interpolated latency was never observed). Paired with the
    // continuous form so the declared relation shows exactly where
    // they diverge. ANSI WITHIN GROUP syntax on both engines.
    Q("agg_percentile_disc",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_pdisc")
        s.sql("""SELECT o_orderstatus,
                        ROUND(percentile_disc(0.5)
                          WITHIN GROUP (ORDER BY o_totalprice), 2)
                          AS p50_disc,
                        ROUND(percentile_cont(0.5)
                          WITHIN GROUP (ORDER BY o_totalprice), 2)
                          AS p50_cont
                 FROM graft_orders_pdisc
                 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      """SELECT o_orderstatus,
                ROUND(quantile_disc(o_totalprice, 0.5), 2) AS p50_disc,
                ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50_cont
         FROM orders GROUP BY 1 ORDER BY o_orderstatus"""),

    // boolean aggregates + conditional count
    Q("agg_bool",
      (s, d) => orders(s, d).groupBy("o_orderpriority")
        .agg(
          expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
          expr("bool_or(o_totalprice > 400000)").as("any_over_400k"),
          expr("count_if(o_orderstatus = 'F')").as("n_finished"))
        .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
                bool_and(o_totalprice > 1000) AS all_over_1k,
                bool_or(o_totalprice > 400000) AS any_over_400k,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
         FROM orders GROUP BY 1 ORDER BY o_orderpriority"""),

    // correlated LATERAL subquery: per-region top-2 nations — the
    // "top-N per outer row" SQL shape; Catalyst decorrelates it into a
    // ranked window join (same plan family as win_topk_per_group)
    Q("join_lateral",
      (s, d) => {
        region(s, d).createOrReplaceTempView("graft_region_lat")
        nation(s, d).createOrReplaceTempView("graft_nation_lat")
        s.sql("""
          SELECT r_name, n_name FROM graft_region_lat,
            LATERAL (SELECT n_name FROM graft_nation_lat
                     WHERE n_regionkey = r_regionkey
                     ORDER BY n_name LIMIT 2)
          ORDER BY r_name, n_name""")
      },
      """SELECT r_name, n_name FROM region,
           LATERAL (SELECT n_name FROM nation
                    WHERE n_regionkey = r_regionkey
                    ORDER BY n_name LIMIT 2) t
         ORDER BY r_name, n_name"""),

    // unpivot/melt: wide per-status sums back to long form
    Q("agg_unpivot",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity"), 2))
        .na.fill(0.0)
        .unpivot(Array(col("l_returnflag")),
          Array(col("F"), col("O")), "status", "qty")
        .orderBy("l_returnflag", "status"),
      """SELECT l_returnflag, status, qty FROM (
           -- COALESCE inside the subquery: DuckDB UNPIVOT drops NULL
           -- cells, so fill them to 0 BEFORE unpivoting (Spark's na.fill
           -- happens pre-unpivot too — same rows on both sides)
           SELECT l_returnflag,
                  COALESCE(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                    FILTER (WHERE l_linestatus = 'F') AS DOUBLE), 2), 0.0) AS F,
                  COALESCE(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                    FILTER (WHERE l_linestatus = 'O') AS DOUBLE), 2), 0.0) AS O
           FROM lineitem GROUP BY l_returnflag)
         UNPIVOT (qty FOR status IN (F, O))
         ORDER BY l_returnflag, status"""),

    // DataFrame.transpose (Spark 4) — rows↔columns flip as a native
    // op: the per-status revenue summary turns into one row per
    // metric with a column per status (the report orientation), keyed
    // by the first column. The oracle rebuilds the transposed shape
    // from conditional aggregates — same relation, orthodox SQL.
    Q("fn_transpose",
      (s, d) => {
        val wide = orders(s, d).groupBy("o_orderstatus")
          .agg(round(count(lit(1)).cast("double"), 1).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("revenue"))
          .orderBy("o_orderstatus")
        wide.transpose()
          .withColumnRenamed("key", "metric")
          .orderBy("metric")
      },
      """SELECT metric, F, O, P FROM (
           SELECT 'n_orders' AS metric,
                  ROUND(CAST(COUNT(CASE WHEN o_orderstatus = 'F'
                    THEN 1 END) AS DOUBLE), 1) AS F,
                  ROUND(CAST(COUNT(CASE WHEN o_orderstatus = 'O'
                    THEN 1 END) AS DOUBLE), 1) AS O,
                  ROUND(CAST(COUNT(CASE WHEN o_orderstatus = 'P'
                    THEN 1 END) AS DOUBLE), 1) AS P
           FROM orders
           UNION ALL
           SELECT 'revenue',
                  ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                    AS DOUBLE), 2),
                  ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                    AS DOUBLE), 2),
                  ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                    AS DOUBLE), 2)
           FROM orders)
         ORDER BY metric"""),

    // Inline VALUES relation — the lookup-list join every analyst
    // writes (priority → SLA days mapping typed straight into the
    // statement, no table needed); the constructor must behave as a
    // first-class relation: joinable, broadcastable, type-coerced.
    Q("sql_values",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_val")
        s.sql("""
          SELECT o.o_orderpriority, sla.sla_days, COUNT(*) AS n
          FROM graft_orders_val o
          JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 5),
                       ('4-NOT SPECIFIED', 10), ('5-LOW', 30))
               AS sla(o_orderpriority, sla_days)
            ON o.o_orderpriority = sla.o_orderpriority
          GROUP BY 1, 2 ORDER BY o.o_orderpriority""")
      },
      """SELECT o.o_orderpriority, sla.sla_days, COUNT(*) AS n
         FROM orders o
         JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 5),
                      ('4-NOT SPECIFIED', 10), ('5-LOW', 30))
              AS sla(o_orderpriority, sla_days)
           ON o.o_orderpriority = sla.o_orderpriority
         GROUP BY 1, 2 ORDER BY o.o_orderpriority"""),

    // EXECUTE IMMEDIATE (Spark 4) — dynamic SQL with positional
    // binding: statement text arrives as a string at runtime (the
    // metadata-driven-pipeline case: the statement is DATA), values
    // bind typed via USING — no string splicing, same safety contract
    // as sql_params but for statements composed at runtime.
    Q("sql_exec_immediate",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_ei")
        s.sql("""EXECUTE IMMEDIATE
          'SELECT o_orderstatus, COUNT(*) AS n,
                  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE), 2) AS revenue
           FROM graft_orders_ei WHERE o_totalprice > ?
           GROUP BY o_orderstatus ORDER BY o_orderstatus'
          USING 250000""")
      },
      """SELECT o_orderstatus, COUNT(*) AS n,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS revenue
         FROM orders WHERE o_totalprice > 250000
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // ANSI LISTAGG ... WITHIN GROUP (Spark 4's ListAgg) — the ordered
    // string aggregation as its standard SQL surface (agg_stringagg is
    // the collect_set composition; this is the syntax an Athena/Trino
    // user types). DISTINCT + explicit WITHIN GROUP order makes the
    // result deterministic under any partitioning; DuckDB mirrors with
    // ordered string_agg.
    Q("agg_listagg",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_la")
        s.sql("""
          SELECT o_orderpriority,
                 listagg(DISTINCT o_orderstatus, '|')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
                 COUNT(*) AS n
          FROM graft_orders_la
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      """SELECT o_orderpriority,
                string_agg(DISTINCT o_orderstatus, '|'
                           ORDER BY o_orderstatus) AS statuses,
                COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY o_orderpriority"""),

    // WITH RECURSIVE (Spark 4's UnionLoop execution) — the BOM/hierarchy
    // rollup no window can express: part keys form an implicit binary
    // tree (parent(k) = floor(k/2), root = 1, TPC-H keys contiguous), and
    // the walk accumulates a PATH-dependent cost (ancestor-chain retail
    // price sum) that is only computable by carrying state down the
    // recursion. Each iteration is one distributed hash join of the
    // frontier against the part scan on the derived parent key — the
    // frontier doubles per level, depth = log2(n) ≈ 15 at sf0.1, so at
    // 100 TB the recursion is log-deep with equi-join iterations, never
    // a driver loop. Decimal path sums keep every engine's add exact;
    // the identical statement runs verbatim in DuckDB.
    Q("sql_recursive",
      (s, d) => {
        part(s, d).createOrReplaceTempView("graft_part_rec")
        s.sql(recursiveSql.replace(" part", " graft_part_rec"))
      },
      recursiveSql),

    // SQL PIPE SYNTAX (Spark 4 / SPARK-49555): the |> operator chain
    // — FROM … |> WHERE … |> AGGREGATE … GROUP BY … |> ORDER BY —
    // parses to EXACTLY the Catalyst plan of the ANSI equivalent (the
    // oracle runs the ANSI form, so the hash-compare IS the proof the
    // two surfaces agree). Decimal-pinned sum, one partial-agg
    // exchange, broadcast-free.
    Q("sql_pipe_syntax",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_pipe")
        s.sql("""
          FROM graft_orders_pipe
          |> WHERE o_orderstatus = 'F'
          |> AGGREGATE COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total
             GROUP BY o_orderpriority
          |> ORDER BY o_orderpriority""")
      },
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS total
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // GROUP BY ALL (Spark 4 / DuckDB-style): every non-aggregate
    // select item becomes a grouping key — the analyst surface that
    // removes the classic silent-bug of a forgotten grouping column.
    // Resolves to the identical Catalyst aggregate as the explicit
    // form (the oracle runs GROUP BY 1, 2 — hash-equality IS the
    // resolution proof).
    Q("sql_group_by_all",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_gba")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                        COUNT(*) AS n,
                        ROUND(CAST(SUM(CAST(o_totalprice
                          AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
                 FROM graft_orders_gba
                 GROUP BY ALL
                 ORDER BY o_orderstatus, o_orderpriority""")
      },
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS total
         FROM orders GROUP BY 1, 2
         ORDER BY o_orderstatus, o_orderpriority"""),

    // Named WINDOW clause — one window spec declared once and shared
    // by several window functions (the ANSI form dashboards generate);
    // Catalyst expands every OVER w to the same window family, so ONE
    // user_id sort-exchange carries all three functions (the
    // win_lag_lead plan, reached through the SQL surface).
    Q("sql_named_window",
      (s, d) => {
        events(s, d).createOrReplaceTempView("graft_events_nw")
        s.sql("""SELECT user_id, event_id,
                        ROW_NUMBER() OVER w AS rn,
                        LAG(event_type, 1) OVER w AS prev_type,
                        LEAD(event_type, 1) OVER w AS next_type
                 FROM graft_events_nw
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY ts, event_id)
                 ORDER BY user_id, rn""")
      },
      """SELECT user_id, event_id,
                ROW_NUMBER() OVER w AS rn,
                LAG(event_type, 1) OVER w AS prev_type,
                LEAD(event_type, 1) OVER w AS next_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, rn"""),

    // NOT IN null semantics — the classic three-valued-logic footgun,
    // declared as an audit relation: the same NOT IN anti filter run
    // against a clean subquery and against one poisoned with a single
    // NULL (which per ANSI makes EVERY row's predicate UNKNOWN → zero
    // survivors). Spark plans the poisoned side as a null-aware anti
    // join (BroadcastNestedLoopJoin + null check), the clean side as a
    // plain LeftAnti — both rows of this relation prove the engine
    // implements the standard, not the intuition. Counts only; both
    // engines evaluate the identical ANSI semantics.
    Q("sql_not_in_nulls",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("g_nin_orders")
        customer(s, d).createOrReplaceTempView("g_nin_cust")
        s.sql("""
          SELECT 'clean_subquery' AS variant, COUNT(*) AS n_rows
          FROM g_nin_orders
          WHERE o_custkey NOT IN
            (SELECT c_custkey FROM g_nin_cust WHERE c_custkey % 3 = 0)
          UNION ALL
          SELECT 'null_poisoned', COUNT(*)
          FROM g_nin_orders
          WHERE o_custkey NOT IN
            (SELECT CASE WHEN c_custkey % 1000 = 0 THEN NULL
                         ELSE c_custkey END
             FROM g_nin_cust WHERE c_custkey % 3 = 0)
          ORDER BY variant""")
      },
      """SELECT 'clean_subquery' AS variant, COUNT(*) AS n_rows
         FROM orders
         WHERE o_custkey NOT IN
           (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
         UNION ALL
         SELECT 'null_poisoned', COUNT(*)
         FROM orders
         WHERE o_custkey NOT IN
           (SELECT CASE WHEN c_custkey % 1000 = 0 THEN NULL
                        ELSE c_custkey END
            FROM customer WHERE c_custkey % 3 = 0)
         ORDER BY variant"""),

    // SQL SESSION VARIABLES (Spark 4 DECLARE VARIABLE / SET VAR) —
    // the parameterization surface scripts use where sql_params uses
    // the programmatic API: declare, overwrite with SET VAR (proving
    // the second assignment is the one the query sees), and reference
    // the variables in a query. The oracle replays the query with the
    // variables' final values inlined — a session variable is a
    // planning-time constant, so the plans are identical and the
    // filter still pushes into the scan.
    Q("sql_variables",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_var")
        s.sql("DECLARE OR REPLACE VARIABLE graft_min_price DOUBLE " +
          "DEFAULT 50000.0D")
        s.sql("DECLARE OR REPLACE VARIABLE graft_status STRING " +
          "DEFAULT 'X'")
        s.sql("SET VAR graft_min_price = 150000.0D")
        s.sql("SET VAR graft_status = 'O'")
        s.sql("""
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DOUBLE), 2) AS revenue
          FROM graft_orders_var
          WHERE o_totalprice > graft_min_price
            AND o_orderstatus = graft_status
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS revenue
         FROM orders
         WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // IDENTIFIER() DYNAMIC NAMES (Spark 4) — templated SQL that picks
    // the table AND the grouping column at runtime without string
    // concatenation (the SQL-injection-safe form of "SELECT ... FROM
    // $table GROUP BY $col"). IDENTIFIER is resolved at analysis
    // time, so the plan is identical to the literal query — the
    // oracle replays it with the names inlined.
    Q("sql_identifier",
      (s, d) => {
        customer(s, d).createOrReplaceTempView("graft_customer_idf")
        s.sql("""
          SELECT IDENTIFIER('c_mktsegment') AS segment,
                 CAST(COUNT(*) AS BIGINT) AS n_customers,
                 ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                   AS DOUBLE), 2) AS total_balance
          FROM IDENTIFIER('graft_customer_idf')
          GROUP BY IDENTIFIER('c_mktsegment')
          ORDER BY segment""")
      },
      """SELECT c_mktsegment AS segment,
                CAST(COUNT(*) AS BIGINT) AS n_customers,
                ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS total_balance
         FROM customer GROUP BY c_mktsegment ORDER BY segment"""),

    // SELECT * EXCEPT — the wide-table ergonomics clause (Spark 4;
    // DuckDB spells it EXCLUDE): project everything but the noisy
    // columns without enumerating the keep-set, the daily idiom on
    // 200-column fact tables. The declared relation proves the
    // remaining column set and order match the engine's star
    // expansion.
    Q("sql_select_except",
      (s, d) => {
        part(s, d).createOrReplaceTempView("graft_part_exc")
        s.sql("""
          SELECT * EXCEPT (p_name, p_type)
          FROM graft_part_exc
          ORDER BY p_partkey""")
      },
      """SELECT * EXCLUDE (p_name, p_type) FROM part
         ORDER BY p_partkey"""),

    // QUALIFY (filter-on-window-result) — OSS Spark has no QUALIFY
    // clause, so the engine side is the canonical emulation: project
    // the window, then filter on its alias; Catalyst plans the same
    // partitioned Window + Filter a native QUALIFY would. The oracle
    // IS DuckDB's QUALIFY, proving the emulation is semantics-exact.
    // Scale: one hash exchange on the partition key, never global.
    Q("sql_qualify",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        orders(s, d)
          .select(col("o_orderpriority").as("priority"),
            col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 2)
          .orderBy("priority", "rn")
      },
      """SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
         FROM orders
         QUALIFY rn <= 2
         ORDER BY priority, rn"""),

    // DISTINCT ON (first-row-per-key under an order) — the Postgres/
    // DuckDB idiom for "latest order per customer". Spark spells it as
    // a row_number()=1 pick over (key, order) — one hash exchange on
    // the key, per-group heads, no global sort; at 100 TB this is the
    // dedup-to-latest plan every CDC consumer runs.
    Q("sql_distinct_on",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey")
      },
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
         FROM orders
         ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC"""),

    // Quantified subquery comparisons (> ALL / < ALL / ANY-range) —
    // Spark SQL has no ALL/ANY, so the engine reduces the quantifier
    // to its scalar witness (ALL ⇒ compare against max/min) computed
    // once and broadcast — a 1-row cross join, zero shuffle on the
    // probe side. The oracle keeps the literal ALL/ANY spelling.
    // The witness subset is non-empty at every SF (2/29/288 rows), so
    // the vacuous-truth branch of ALL never fires.
    Q("subquery_any_all",
      (s, d) => {
        val o = orders(s, d)
        val sub = o.filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_custkey") % 97 === 0)
          .agg(max("o_totalprice").as("mx"), min("o_totalprice").as("mn"))
        o.crossJoin(broadcast(sub))
          .agg(
            sum(when(col("o_totalprice") > col("mx"), 1L).otherwise(0L))
              .as("n_gt_all"),
            sum(when(col("o_totalprice") < col("mn"), 1L).otherwise(0L))
              .as("n_lt_all"),
            sum(when(col("o_totalprice") >= col("mn") &&
                     col("o_totalprice") <= col("mx"), 1L).otherwise(0L))
              .as("n_within"),
            count(lit(1)).as("n_total"))
      },
      """WITH sub AS (SELECT o_totalprice AS p FROM orders
                      WHERE o_orderpriority = '1-URGENT'
                        AND o_custkey % 97 = 0)
         SELECT CAST(sum(CASE WHEN o_totalprice > ALL (SELECT p FROM sub)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_all,
                CAST(sum(CASE WHEN o_totalprice < ALL (SELECT p FROM sub)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lt_all,
                CAST(sum(CASE WHEN o_totalprice >= ANY (SELECT p FROM sub)
                          AND o_totalprice <= ANY (SELECT p FROM sub)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
                CAST(count(*) AS BIGINT) AS n_total
         FROM orders"""),

    // MULTI-MEASURE UNPIVOT (Spark 4 `UNPIVOT ((a,b) FOR … IN …)`) —
    // wide→long over measure PAIRS: the (qty, revenue) columns for
    // each linestatus fold into one status-keyed row carrying both
    // measures at once, which single-measure unpivot (agg_unpivot)
    // needs two passes + a join to express. DuckDB has no
    // multi-measure form — the oracle is the canonical two-branch
    // UNION ALL the clause desugars to.
    Q("sql_unpivot_multi",
      (s, d) => {
        lineitem(s, d).groupBy("l_returnflag")
          .agg(
            dsum(when(col("l_linestatus") === "F", col("l_quantity")), 2)
              .as("qty_f"),
            dsum(when(col("l_linestatus") === "O", col("l_quantity")), 2)
              .as("qty_o"),
            dsum(when(col("l_linestatus") === "F", col("l_extendedprice")),
              2).as("rev_f"),
            dsum(when(col("l_linestatus") === "O", col("l_extendedprice")),
              2).as("rev_o"))
          .createOrReplaceTempView("graft_unpivot_multi")
        s.sql("""
          SELECT l_returnflag, status, qty, revenue
          FROM graft_unpivot_multi
          UNPIVOT ((qty, revenue) FOR status IN
            ((qty_f, rev_f) AS `F`, (qty_o, rev_o) AS `O`))
          ORDER BY l_returnflag, status""")
      },
      """WITH base AS (
           SELECT l_returnflag,
             ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2)
               AS qty_f,
             ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
               THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2)
               AS qty_o,
             ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
               AS DOUBLE), 2) AS rev_f,
             ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
               THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
               AS DOUBLE), 2) AS rev_o
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'F' AS status, qty_f AS qty, rev_f AS revenue
         FROM base WHERE qty_f IS NOT NULL OR rev_f IS NOT NULL
         UNION ALL
         SELECT l_returnflag, 'O' AS status, qty_o AS qty, rev_o AS revenue
         FROM base WHERE qty_o IS NOT NULL OR rev_o IS NOT NULL
         ORDER BY l_returnflag, status"""),

    // ORDER BY ALL — the companion of GROUP BY ALL (both Spark 4 and
    // DuckDB speak it natively): total-order by every projected
    // column left-to-right, the ergonomic way to make a small report
    // deterministic without enumerating the sort list.
    Q("sql_order_by_all",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_oba")
        s.sql("""
          SELECT o_orderpriority, o_orderstatus,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM graft_oba
          GROUP BY ALL
          ORDER BY ALL""")
      },
      """SELECT o_orderpriority, o_orderstatus,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY ALL ORDER BY ALL"""),
  )
}
