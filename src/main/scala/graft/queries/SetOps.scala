package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Sort / limit / set operators (SURVEY.md §2.6).
  *
  * Scale notes: global top-k compiles to `TakeOrderedAndProject` — each
  * partition keeps k rows, the driver merges; no global sort. UNION ALL
  * is a zero-shuffle concatenation; the distinct set ops hash-shuffle
  * once on the full row.
  */
object SetOps {

  val qs: Seq[Q] = Seq(
    Q("sort_limit_topk",
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""),

    // PAGINATION (LIMIT + OFFSET under a total order) — page 3 of a
    // 50-row listing: Spark plans offset+limit as one
    // TakeOrderedAndProject(limit=150, offset=100) — per-partition
    // top-150 heaps, a 150-row driver merge, never a global sort —
    // so a deep page costs O(offset+limit) heap space, the documented
    // pagination contract (and why offset must stay bounded; cursor
    // pagination replaces it at depth).
    Q("sort_limit_offset",
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .offset(100).limit(50),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 50 OFFSET 100"""),

    // Bag union: the src tag keeps the total order unique even where the
    // two slices overlap (R3).
    Q("set_union_all",
      (s, d) => {
        val o = orders(s, d)
        o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), lit("u").as("src"))
          .unionByName(
            o.filter(col("o_totalprice") > 400000)
              .select(col("o_orderkey"), lit("h").as("src")))
          .orderBy("o_orderkey", "src")
      },
      """SELECT o_orderkey, 'u' AS src FROM orders
         WHERE o_orderpriority = '1-URGENT'
         UNION ALL
         SELECT o_orderkey, 'h' AS src FROM orders
         WHERE o_totalprice > 400000
         ORDER BY o_orderkey, src"""),

    Q("set_union_distinct",
      (s, d) => {
        val o = orders(s, d)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .union(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .distinct()
          .orderBy("o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         UNION
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey"""),

    Q("set_intersect",
      (s, d) => {
        val o = orders(s, d)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersect(
            o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .orderBy("o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey"""),

    // bag (ALL) intersection: multiplicities take the minimum
    Q("set_intersect_all",
      (s, d) => {
        val li = lineitem(s, d)
        li.filter(col("l_returnflag") === "A").select("l_partkey")
          .intersectAll(
            li.filter(col("l_returnflag") === "R").select("l_partkey"))
          .groupBy("l_partkey").agg(count(lit(1)).as("n"))
          .orderBy("l_partkey")
      },
      """SELECT l_partkey, COUNT(*) AS n FROM (
           SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
           INTERSECT ALL
           SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
         GROUP BY l_partkey ORDER BY l_partkey"""),

    Q("set_except",
      (s, d) => {
        val o = orders(s, d)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .except(
            o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .orderBy("o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey"""),
  )
}
