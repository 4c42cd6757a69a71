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
