package graft.engine.ops

import graft.engine.meta.TableMeta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit}

/** Conform a DataFrame to a declared [[TableMeta]]: impose column order,
  * impose types, handle surplus/missing columns. This is the Spark
  * re-expression of the reference's pandas conformance module
  * (SURVEY.md §1.1 / §1.2 [RECONSTRUCTED]: `pd_metadata_conformance`).
  *
  * Scale note: conformance is a pure projection (`Project` node) — it
  * fuses into whole-stage codegen with the scan, adds no shuffle, and
  * preserves column pruning (casts are pushed onto only the selected
  * columns).
  */
object Conform {

  /** Strictly conform: every metadata column must exist. Surplus input
    * columns are dropped; order and types come from the metadata. */
  def conform(df: DataFrame, meta: TableMeta): DataFrame = {
    val missing = meta.columns.map(_.name).filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing columns: ${missing.mkString(", ")}")
    df.select(meta.columns.map(c =>
      col(c.name).cast(c.sparkField.dataType).as(c.name)): _*)
  }

  /** Lenient conform: missing columns become typed nulls. */
  def conformLenient(df: DataFrame, meta: TableMeta): DataFrame =
    df.select(meta.columns.map { c =>
      val dt = c.sparkField.dataType
      if (df.columns.contains(c.name)) col(c.name).cast(dt).as(c.name)
      else lit(null).cast(dt).as(c.name)
    }: _*)

  /** Dirty-data conform: unconvertible values become null instead of
    * failing the job (Spark 4's ANSI mode makes plain cast THROW on a
    * bad value — on a 100 TB dirty CSV ingest that's one poison row
    * killing the pipeline; try_cast quarantines it instead). Pair with
    * [[violations]] / a null-count check to route rejects. */
  def conformSafe(df: DataFrame, meta: TableMeta): DataFrame = {
    val missing = meta.columns.map(_.name).filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing columns: ${missing.mkString(", ")}")
    df.select(meta.columns.map { c =>
      expr(s"try_cast(`${c.name}` AS ${c.sparkField.dataType.sql})")
        .as(c.name)
    }: _*)
  }

  /** The reference's `validate` verb as DATA: a per-column conformance
    * report against the declared metadata, computed in ONE aggregate
    * pass over the input (all conditional counts fold into a single
    * partial-agg shuffle of one row — no per-column scans). Each
    * declared column present in the input gets its null count and its
    * cast-failure count (raw value present but `try_cast` to the
    * declared type returns null — the rows `conformSafe` would
    * quarantine); declared-but-absent and present-but-undeclared
    * columns appear as `missing` / `surplus` rows with null counts.
    * This is the pre-flight report a 100 TB ingest runs BEFORE
    * committing a conform rewrite: one scan decides accept / reject /
    * quarantine per column. */
  def validateReport(df: DataFrame, meta: TableMeta): DataFrame = {
    import org.apache.spark.sql.functions._
    val present = meta.columns.filter(c => df.columns.contains(c.name))
    val aggs = present.flatMap { c =>
      val dt = c.sparkField.dataType
      Seq(
        count(when(col(c.name).isNull, 1)).as(s"${c.name}__nulls"),
        count(when(col(c.name).isNotNull &&
          expr(s"try_cast(`${c.name}` AS ${dt.sql})").isNull, 1))
          .as(s"${c.name}__fail"))
    }
    val spark = df.sparkSession
    import spark.implicits._
    // a fully-disjoint declaration (no declared column present) still
    // yields a well-formed report: missing/surplus rows only
    val longForm =
      if (present.isEmpty)
        Seq.empty[(String, String, String, Long, Long)]
          .toDF("col_name", "declared_type", "status", "n_nulls",
            "n_cast_fail")
      else df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(present.map { c =>
          struct(
            lit(c.name).as("col_name"),
            lit(c.agnosticType).as("declared_type"),
            lit("ok").as("status"),
            col(s"${c.name}__nulls").as("n_nulls"),
            col(s"${c.name}__fail").as("n_cast_fail"))
        }: _*)).as("r")).select(col("r.*"))
    val missing = meta.columns.filterNot(c => df.columns.contains(c.name))
      .map(c => (c.name, c.agnosticType, "missing"))
    val surplus = df.columns.toSeq
      .filterNot(meta.columns.map(_.name).contains)
      .map(n => (n, null: String, "surplus"))
    val shapeRows = (missing ++ surplus)
      .toDF("col_name", "declared_type", "status")
      .withColumn("n_nulls", lit(null).cast("long"))
      .withColumn("n_cast_fail", lit(null).cast("long"))
    if (missing.isEmpty && surplus.isEmpty) longForm
    else longForm.unionByName(shapeRows)
  }

  /** Check conformance without mutating: list of human-readable
    * violations, empty iff `df` already matches `meta` exactly. */
  def violations(df: DataFrame, meta: TableMeta): Seq[String] = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val declared = meta.columns.map(c => c.name -> c.sparkField.dataType)
    val missing = declared.collect {
      case (n, _) if !actual.contains(n) => s"missing column: $n"
    }
    val surplus = df.columns.filterNot(declared.map(_._1).contains)
      .map(n => s"surplus column: $n")
    val mistyped = declared.collect {
      case (n, dt) if actual.get(n).exists(_ != dt) =>
        s"column $n: expected $dt, found ${actual(n)}"
    }
    val misordered =
      if (df.columns.toSeq.filter(declared.map(_._1).contains) ==
          declared.map(_._1)) Nil
      else Seq("column order differs from metadata")
    missing ++ surplus ++ mistyped ++ misordered
  }
}
