package graft

import graft.engine.expr.{GraftExtensions, GraftFunctions}
import graft.engine.ml.Similarity
import graft.engine.ops.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale machinery: native codegen expression parity, bucketed
  * co-located joins (no exchange), salted aggregation exactness. */
class ScaleSpec extends AnyFunSuite with SparkFixture {

  test("native graft_cosine is bit-identical to the HOF-composed cosine") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(2000)
    val diff = pairs.select(
      (expr("graft_cosine(a, b)") -
        Similarity.cosine(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0, s"native vs HOF cosine drifted by $diff")
  }

  test("graft_cosine runs inside a codegen span and handles nulls") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val df = emb.select(expr("graft_cosine(embedding, embedding)").as("c"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString().contains("*(1)"))
    // null propagation
    val n = emb.select(
      expr("graft_cosine(CAST(NULL AS ARRAY<FLOAT>), embedding)").as("c"))
      .filter(col("c").isNull).count()
    assert(n === emb.count())
    // mismatched lengths → NULL, never a prefix similarity
    val mm = emb.select(
      expr("graft_cosine(slice(embedding, 1, 3), embedding)").as("c"))
      .filter(col("c").isNull).count()
    assert(mm === emb.count())
    // arity misuse fails at analysis, not at runtime
    assertThrows[Exception](
      spark.sql("SELECT graft_cosine(1)").collect())
  }

  test("GraftExtensions injects the same function builders") {
    // builder-level check: the extension wires every registered name
    assert(GraftFunctions.builders.map(_._1) ===
      Seq("graft_cosine", "graft_intersect_count", "graft_kmv"))
    new GraftExtensions() // constructible; applied at session build time
  }

  test("bucketed tables join with no shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    Scale.writeBucketed(o, "graft_orders_b", 4, Seq("o_custkey"))
    Scale.writeBucketed(c.withColumnRenamed("c_custkey", "o_custkey"),
      "graft_customer_b", 4, Seq("o_custkey"))
    try {
      // pin the large-large path: broadcast would bypass bucketing here
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_customer_b"), "o_custkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    }
  }

  test("distributive skyline equals the single-window formulation, any partitioning") {
    val o = Tables.orders(spark, sf)
      .select(col("o_totalprice").as("price"),
        unix_micros(col("o_orderdate").cast("timestamp"))
          .cast("double").as("t"))
    val reference = SparkEntry.queries("skyline_2d")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1).toDouble)).toSet
    Seq(1, 7).foreach { parts =>
      val got = Scale.skyline2D(o.repartition(parts), "price", "t")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(got === reference, s"with $parts partitions")
    }
  }

  test("salted sum equals the direct aggregation exactly") {
    val o = Tables.orders(spark, sf)
    val salted = Scale.saltedSum(o, Seq("o_orderstatus"),
      col("o_totalprice"), 2, numSalts = 8)
      .orderBy("o_orderstatus").collect()
      .map(r => r.getString(0) -> r.getDecimal(1))
    val direct = o.groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("total"))
      .orderBy("o_orderstatus").collect()
      .map(r => r.getString(0) -> r.getDecimal(1))
    assert(salted.toSeq === direct.toSeq)
  }

  test("salted join equals the plain join exactly, and spreads the salt") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val dim = docs.groupBy("lang")
      .agg(count(lit(1)).as("lang_docs"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "lang_docs")
        .collect().map(_.toSeq).toSet
    assert(rows(Scale.saltedJoin(docs, dim, Seq("lang"), 8)) ===
      rows(docs.join(dim, Seq("lang"))))
    // the salt really fans each key out: >1 distinct salt per lang
    val spread = docs.withColumn("_salt",
        pmod(xxhash64(struct(docs.columns.map(col).toSeq: _*)), lit(8L)))
      .groupBy("lang").agg(countDistinct("_salt").as("nsalts"))
      .agg(min("nsalts")).collect().head.getLong(0)
    assert(spread > 1, s"expected every lang spread over >1 salt, min=$spread")
  }

  test("r3 operators are invariant to input partitioning") {
    import graft.engine.ml.{Dedup, Similarity}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    def resolveOn(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      Dedup.resolvePairs(
        Dedup.ngramJaccardPairs(d, 0.05).select("doc_a", "doc_b"), d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(resolveOn(docs) === resolveOn(docs.repartition(13)))
    Dedup.unpersistTracked()
    def knnOn(e: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      Similarity.knnGraph(e, 3).orderBy("vec_id", "rn")
        .collect().map(_.toSeq).toSeq
    assert(knnOn(emb) === knnOn(emb.repartition(13)))
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~98% of fact rows share one hot key — classic join skew; wide
      // payload pushes the hot partition well past the thresholds
      val fact = spark.range(300000)
        .select(when(col("id") % 50 === 0, col("id")).otherwise(lit(7L))
          .as("k"), concat(lit("x" * 64), col("id")).as("payload"))
      val dim = spark.range(300000)
        .select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "k")
      // materialize THIS QueryExecution (count() would plan a new one
      // and leave this plan un-adapted)
      assert(joined.collect().length === 300000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split join in:\n${plan.take(2000)}")
      // "skew=true" is SortMergeJoinExec's isSkewJoin rendering — the
      // literal marker OptimizeSkewedJoin set on the join node.
      // The split must also be RESULT-INVISIBLE: the same aggregate over
      // (k, v, payload-length) from three executions — AQE-skew,
      // AQE-skew disabled (the unsalted baseline), and the manual
      // salted fallback (what join_skew_salted ships) — is identical.
      // That is the 100x answer: AQE handles planted skew natively,
      // salting remains the equivalent manual fallback.
      def digest(df: org.apache.spark.sql.DataFrame): Seq[Any] =
        df.agg(count(lit(1)), sum(col("k")), sum(col("v")),
          sum(length(col("payload")))).collect()(0).toSeq
      val viaAqeSkew = digest(joined)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val viaPlain = digest(fact.join(dim, "k"))
      val viaSalted = digest(graft.engine.ops.Scale
        .saltedJoin(fact, dim, Seq("k"), 16))
      assert(viaAqeSkew === viaPlain,
        s"AQE skew split changed the result: $viaAqeSkew vs $viaPlain")
      assert(viaSalted === viaPlain,
        s"salted fallback changed the result: $viaSalted vs $viaPlain")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("range-sorted write lays files out for range pruning") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test/range_${System.nanoTime()}"
    Scale.writeSortedByRange(Tables.orders(spark, sf), path,
      Seq("o_orderdate"), 4)
    val back = spark.read.parquet(path)
    assert(back.count() === Tables.orders(spark, sf).count())
    // each file covers a disjoint date range → min/max stats prune
    // o_orderdate is TIMESTAMP_NTZ → rows carry LocalDateTime
    val perFile = back.groupBy(input_file_name())
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._1.toString)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(!hi1.isAfter(lo2))
      case _ =>
    }
  }

  test("compact_files rewrites 64 shards into ≤4 files, same rows") {
    val n = SparkEntry.queries("compact_files")(spark, sf).count()
    assert(n === Tables.events(spark, sf).count())
    // the compacted dir (IoQueries scratch layout) really has ≤4 files
    val big = new java.io.File(queries.IoQueries.scratch(sf, "compact_big"))
    val parts = big.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts > 0 && parts <= 4, s"$parts files in $big")
    val small =
      new java.io.File(queries.IoQueries.scratch(sf, "compact_small"))
    assert(small.listFiles().count(_.getName.endsWith(".parquet")) === 64)
  }

  test("co-occurrence edge store is keyed by input size (invalidation)") {
    // a dataset with a different row count must get its own artifact —
    // a stale store silently serving old edges is the failure mode the
    // (tag, count) key exists to prevent
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
    def mass(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("w")).collect()(0).getLong(0)
    val full = mass(graft.engine.ops.Graph
      .coOccurrenceEdgesFor(li, "spec_inval"))
    val half = mass(graft.engine.ops.Graph
      .coOccurrenceEdgesFor(li.filter(col("pk") % 2 === 0), "spec_inval"))
    // at sf0.001 the K10 projection keeps all 45 edges either way, so
    // the rebuild is visible in the co-occurrence MASS, not edge count
    assert(half < full, s"half-input store not rebuilt: $half vs $full")
  }

  test("graph_triangles on sf0.001 sees the complete K10 projection") {
    // every supplier pair at sf0.001 co-supplies ≥25 parts, so the
    // projection is K10: each node closes C(9,2)=36 triangles
    val rows = SparkEntry.queries("graph_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length === 10)
    assert(rows.forall(_._2 === 36L), rows.mkString(","))
  }
}
