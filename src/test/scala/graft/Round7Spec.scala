package graft

import graft.Tables._
import graft.engine.io.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator pins: properties the DuckDB oracle can NOT express
  * (cross-version replay identity, argmin optimality, peel
  * monotonicity, allocation invariants, brute-force as-of-tolerance
  * equivalence) — each the semantic contract behind one round-7 key. */
class Round7Spec extends AnyFunSuite with SparkFixture {

  test("table_changes: CDF replayed onto the base reconstructs the head") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_r7_cdf"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    CommitLog.init(spark, root)
    import spark.implicits._
    CommitLog.commit(spark, root, "snap") { (dir, _) =>
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
        .toDF("k", "v").write.parquet(dir)
    }
    CommitLog.commit(spark, root, "mut") { (dir, base) =>
      CommitLog.readVersion(spark, root, base)
        .filter($"k" =!= 2L) // delete k=2
        .withColumn("v", when($"k" === 3L, 33.0).otherwise($"v")) // update
        .unionByName(Seq((9L, 9.0)).toDF("k", "v")) // insert
        .write.parquet(dir)
    }
    CommitLog.commit(spark, root, "mut2") { (dir, base) =>
      CommitLog.readVersion(spark, root, base)
        .filter($"k" =!= 9L)
        .write.parquet(dir)
    }
    val chg = CommitLog.changes(spark, root, 1, 3, Seq("k"))
    // a CDF consumer's MERGE: per step, drop deleted/pre-image keys,
    // add inserted/post-image rows — the feed must reconstruct the
    // head snapshot exactly from the base
    def applyStep(base: DataFrame, step: DataFrame): DataFrame = {
      val gone = step.filter(col("_change_type")
        .isin("delete", "update_preimage")).select("k").distinct()
      val added = step.filter(col("_change_type")
        .isin("insert", "update_postimage")).select("k", "v")
      base.join(gone, Seq("k"), "left_anti").unionByName(added)
    }
    val replayed = (2 to 3).foldLeft(
      CommitLog.readVersion(spark, root, 1)) { (acc, v) =>
      applyStep(acc, chg.filter(col("_commit_version") === v))
    }
    val head = CommitLog.readVersion(spark, root, 3)
    assert(replayed.exceptAll(head).isEmpty && head.exceptAll(replayed).isEmpty)
  }

  test("table_changes: NULL-bearing updates stay in the feed " +
      "(null-safe struct compare)") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_r7_cdf_nulls"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    CommitLog.init(spark, root)
    import spark.implicits._
    CommitLog.commit(spark, root, "snap") { (dir, _) =>
      Seq((1L, Option(1.0)), (2L, Option.empty[Double]),
        (3L, Option(3.0))).toDF("k", "v").write.parquet(dir)
    }
    CommitLog.commit(spark, root, "mut") { (dir, base) =>
      CommitLog.readVersion(spark, root, base)
        .withColumn("v",
          when($"k" === 2L, 22.0) // NULL → value
            .when($"k" === 3L, lit(null).cast("double")) // value → NULL
            .otherwise($"v"))
        .write.parquet(dir)
    }
    val chg = CommitLog.changes(spark, root, 1, 2, Seq("k")).cache()
    // both null-transition updates must appear with both images;
    // the unchanged row must not
    assert(chg.filter($"k" === 2L).count() === 2)
    assert(chg.filter($"k" === 3L).count() === 2)
    assert(chg.filter($"k" === 1L).count() === 0)
    chg.unpersist()
  }

  test("table_changes: a column ADDED between versions surfaces its " +
      "updates (union-schema feed)") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_r7_cdf_evolve"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    CommitLog.init(spark, root)
    import spark.implicits._
    CommitLog.commit(spark, root, "snap") { (dir, _) =>
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").write.parquet(dir)
    }
    // v2 keeps v untouched but ADDS column w with per-row values —
    // with old-version-only dataCols this produced an EMPTY feed
    CommitLog.commit(spark, root, "evolve") { (dir, base) =>
      CommitLog.readVersion(spark, root, base)
        .withColumn("w", $"k" * 10).write.parquet(dir)
    }
    val chg = CommitLog.changes(spark, root, 1, 2, Seq("k")).cache()
    assert(chg.filter(col("_change_type") === "update_postimage")
      .count() === 2)
    val post = chg.filter(col("_change_type") === "update_postimage" &&
      $"k" === 2L).collect()(0)
    assert(post.getAs[Long]("w") === 20L)
    // pre-images carry a typed null for the not-yet-existing column
    assert(chg.filter(col("_change_type") === "update_preimage")
      .filter(col("w").isNull).count() === 2)
    chg.unpersist()
  }

  test("readLatest resolves a fresh clone's absolute data reference") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_r7_clone_latest"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val src = s"$base/src"
    val dst = s"$base/dst"
    CommitLog.init(spark, src)
    import spark.implicits._
    CommitLog.commit(spark, src, "snap") { (dir, _) =>
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").write.parquet(dir)
    }
    CommitLog.cloneTable(spark, src, dst, 1)
    // BEFORE any clone-local commit, latest points at the absolute
    // source reference — readLatest must resolve it like readVersion
    assert(CommitLog.readLatest(spark, dst).count() === 2)
  }

  test("conform_validate: fully-disjoint declaration yields a " +
      "missing/surplus-only report") {
    import graft.engine.meta.{ColumnMeta, TableMeta}
    val meta = TableMeta("ghost", Seq(ColumnMeta("absent_a", "long"),
      ColumnMeta("absent_b", "character")))
    val rep = graft.engine.ops.Conform.validateReport(
      orders(spark, sf).select("o_orderkey"), meta)
    val statuses = rep.select("status").collect().map(_.getString(0))
    assert(statuses.count(_ == "missing") === 2)
    assert(statuses.count(_ == "surplus") === 1)
    assert(statuses.forall(s => s == "missing" || s == "surplus"))
  }

  test("sql_recursive: walk depth equals floor(log2(p_partkey))") {
    val df = graft.SparkEntry.queries("sql_recursive")(spark, sf)
    val bad = df.filter(col("depth") =!=
      floor(log(2.0, col("p_partkey").cast("double"))).cast("int"))
    assert(bad.count() === 0)
  }

  test("vec_pq: every emitted code is argmin over its subspace codebook") {
    val df = graft.SparkEntry.queries("vec_pq")(spark, sf)
    assert(df.count() > 0)
    // codes live in [0, 16); reconstruction error is non-negative
    val codeCols = (0 until 8).map(j => col(s"c$j"))
    val bad = df.filter(codeCols.map(c => c < 0 || c > 15)
      .reduce(_ || _) || col("recon_err") < 0)
    assert(bad.count() === 0)
    // optimality spot-check: re-derive best-d2 per (vec, subspace) and
    // confirm the key's pivot picked exactly those codes for a sample
    import org.apache.spark.sql.expressions.Window
    val dims = embeddings(spark, sf)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("i"),
        col("x").cast("double").as("v"))
    val wSeed = Window.orderBy(md5(col("vec_id").cast("string")),
      col("vec_id"))
    val seeds = embeddings(spark, sf).select(col("vec_id"))
      .withColumn("code_id",
        (row_number().over(wSeed) - 1).cast("long"))
      .filter(col("code_id") < 16)
    val cb = seeds.join(dims, Seq("vec_id"))
      .select(col("code_id"), col("i"), col("v").as("cv"))
    val probe = dims.filter(col("vec_id") < 20)
    val d2 = probe.join(broadcast(cb), Seq("i"))
      .withColumn("j", floor((col("i") - 1) / 8.0).cast("int"))
      .withColumn("sq", ((col("v") - col("cv")) * (col("v") - col("cv")))
        .cast(org.apache.spark.sql.types.DecimalType(24, 12)))
      .groupBy("vec_id", "j", "code_id").agg(sum("sq").as("d2"))
    val wB = Window.partitionBy("vec_id", "j")
      .orderBy(col("d2"), col("code_id"))
    val best = d2.withColumn("rn", row_number().over(wB))
      .filter(col("rn") === 1)
    val mismatch = best.join(df.filter(col("vec_id") < 20), Seq("vec_id"))
      .filter((0 until 8).map(j =>
        col("j") === j && col("code_id") =!= col(s"c$j")).reduce(_ || _))
    assert(mismatch.count() === 0)
  }

  test("graph_kcore: peeling is monotone — one more round only shrinks") {
    val out = graft.SparkEntry.queries("graph_kcore")(spark, sf)
    val survivors = out.select(col("node").as("u"))
    val e = graft.engine.ops.Graph.coOccurrenceEdgesFor(
        lineitem(spark, sf).select(col("l_orderkey").as("pk"),
          col("l_partkey").as("sk")), s"${sf}_coorder")
      .filter(col("w") >= 2)
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val next = und.join(survivors, Seq("u"))
      .join(survivors.select(col("u").as("v")), Seq("v"))
      .groupBy("u").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2).select("u")
    // round 5's survivors are a subset of round 4's
    assert(next.join(survivors, Seq("u"), "left_anti").count() === 0)
  }

  test("mix_epochs: caps bind exactly and the budget is never exceeded") {
    val df = graft.SparkEntry.queries("mix_epochs")(spark, sf).cache()
    val capViol = df.filter(col("capped") &&
      col("alloc_final") =!= col("n_tokens") * 2)
    assert(capViol.count() === 0)
    val totals = df.agg(
      sum(col("alloc_final")).as("alloc"),
      sum(col("n_tokens")).as("toks"),
      sum(when(col("capped"), 1).otherwise(0)).as("n_capped"),
      count(lit(1)).as("n")).collect()(0)
    val budget = math.floor(totals.getAs[Long]("toks").toDouble * 1.2).toLong
    assert(totals.getAs[Long]("alloc") <= budget)
    // the cap must actually bind on this corpus (and not on everything)
    assert(totals.getAs[Long]("n_capped") > 0)
    assert(totals.getAs[Long]("n_capped") < totals.getAs[Long]("n"))
    df.unpersist()
  }

  test("conform_validate: a clean conformed frame reports zero defects") {
    import graft.engine.meta.{ColumnMeta, TableMeta}
    val meta = TableMeta("clean", Seq(
      ColumnMeta("o_orderkey", "long"),
      ColumnMeta("o_orderstatus", "character")))
    val rep = graft.engine.ops.Conform.validateReport(
      orders(spark, sf).select("o_orderkey", "o_orderstatus"), meta)
    assert(rep.filter(col("status") =!= "ok").count() === 0)
    assert(rep.filter(col("n_nulls") =!= 0 || col("n_cast_fail") =!= 0)
      .count() === 0)
  }

  test("join_asof_tolerance equals the brute-force windowed max join") {
    val out = graft.SparkEntry.queries("join_asof_tolerance")(spark, sf)
    val ev = events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        col("t").as("c_t"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("t"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_id")
      .orderBy(desc("c_t"), desc("c_id"))
    val brute = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_t") < col("t") &&
        col("t") - col("c_t") <= 3600000000L)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("c_id"))
    val joined = out.join(brute, Seq("event_id"), "full_outer")
    // every non-null tolerance match equals the brute-force winner, and
    // null matches have no brute-force candidate
    assert(joined.filter(
      coalesce(col("click_in_window"), lit(-1L)) =!=
        coalesce(col("c_id"), lit(-1L))).count() === 0)
  }

  test("maintain_cluster_rewrite: shard z-ranges are ordered and disjoint") {
    val df = graft.SparkEntry.queries("maintain_cluster_rewrite")(spark, sf)
    val rows = df.orderBy("shard").collect()
    assert(rows.length === 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("z_max") <= b.getAs[Long]("z_min"),
        s"shards ${a.getAs[Long]("shard")} and ${b.getAs[Long]("shard")} overlap in z")
    }
  }

  test("time_cusum: the scaled cusum telescopes to zero and exactly " +
      "one change-point is flagged") {
    val df = graft.SparkEntry.queries("time_cusum")(spark, sf).cache()
    assert(df.filter(col("is_changepoint") === 1).count() === 1)
    // S_D = D·N − D·N = 0 at the last day by construction
    val last = df.orderBy(desc("day")).limit(1).collect()(0)
    assert(last.getAs[Long]("s_scaled") === 0L)
    df.unpersist()
  }

  test("graph_modularity: Q in [-1, 1] and internal edges never " +
      "exceed the edge total") {
    val df = graft.SparkEntry.queries("graph_modularity")(spark, sf).cache()
    val q = df.select("modularity").distinct().collect()(0).getDouble(0)
    assert(q >= -1.0 && q <= 1.0, q)
    val sums = df.agg(sum("e_in_dir").as("ein"), sum("d_c").as("dc"))
      .collect()(0)
    // Σ d_c counts every directed edge once; internal ⊆ all
    assert(sums.getAs[Long]("ein") <= sums.getAs[Long]("dc"))
    df.unpersist()
  }

  test("sample_neyman: allocations respect the budget and order by " +
      "stratum weight") {
    val rows = graft.SparkEntry.queries("sample_neyman")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum <= 100)
    // monotone: a stratum with strictly larger N_h·σ_h never gets a
    // smaller allocation
    val byW = rows.sortBy(r =>
      r.getAs[Long]("n_h") * r.getAs[Double]("sigma"))
    byW.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("alloc") <= b.getAs[Long]("alloc"))
    }
  }

  test("text_dup_coverage: coverage is bounded by doc length and a " +
      "verbatim duplicate pair is fully covered") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("text_dup_coverage")(spark, sf)
    assert(out.filter(col("covered_tokens") > col("n_tokens"))
      .count() === 0)
    // planted construction: two identical 12-token docs ⇒ dup_frac 1.0
    val twelve = (1 to 12).map(i => s"tok$i").mkString(" ")
    Seq((900001L, twelve), (900002L, twelve), (900003L,
      (1 to 12).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("graft_dupcov_probe")
    val t = spark.table("graft_dupcov_probe")
    // rerun the operator's core on the probe corpus
    val chunks = t.select(col("doc_id"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(w) < 10 THEN array()
           ELSE transform(sequence(1, size(w) - 9),
             i -> md5(array_join(slice(w, i, 10), ' '))) END""").as("cs"))
      .select(col("doc_id"), explode(col("cs")).as("ch"))
    val shared = chunks.distinct().groupBy("ch")
      .agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    val dupDocs = chunks.join(shared.select("ch"), Seq("ch"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dupDocs === Set(900001L, 900002L))
  }

  test("agg_kmv_ops: sketch estimates track the exact set operations") {
    val r = graft.SparkEntry.queries("agg_kmv_ops")(spark, sf).collect()(0)
    val jx = r.getAs[Double]("jaccard_exact")
    val je = r.getAs[Double]("jaccard_est")
    assert(math.abs(jx - je) <= 0.25, s"jaccard est $je vs exact $jx")
    val ux = r.getAs[Long]("union_exact").toDouble
    val ue = r.getAs[Double]("union_est")
    assert(math.abs(ue - ux) / ux <= 0.35, s"union est $ue vs exact $ux")
  }
}
