package graft.engine.catalog

import graft.engine.meta.TableMeta
import graft.engine.ops.Conform
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Register declared tables into the Spark session catalog so they are
  * queryable by name via `spark.sql` — the Spark re-expression of the
  * reference's Glue-catalog registration (SURVEY.md §1.2
  * [RECONSTRUCTED]: `glue.py` creates Glue tables from metadata JSON).
  *
  * On a cluster with a persistent metastore the same metadata drives
  * `CREATE TABLE ... USING parquet LOCATION ...`; in this offline harness
  * we register temp views over the declared location, conformed to the
  * declared schema.
  */
object Catalog {

  /** Register `meta` as a temp view named `viewName` (default: the
    * metadata's own table name), reading from `location`. */
  def register(spark: SparkSession, meta: TableMeta, location: String,
      viewName: Option[String] = None): DataFrame = {
    val df = Conform.conform(spark.read.parquet(location), meta)
    df.createOrReplaceTempView(viewName.getOrElse(meta.name))
    df
  }

  /** Persistent (metastore) external table over a parquet location —
    * the closest offline analogue of Glue table creation: the declared
    * schema becomes DDL, the data stays where it is. */
  def registerExternal(spark: SparkSession, meta: TableMeta,
      location: String, table: Option[String] = None): Unit = {
    val name = table.getOrElse(meta.name)
    val cols = meta.columns
      .map(c => s"`${c.name}` ${c.sparkField.dataType.sql}")
      .mkString(", ")
    // escape the interpolated location so a path cannot break (or
    // smuggle clauses into) the DDL statement: backslashes first (Spark
    // SQL literals treat \ as an escape by default), then quotes
    val loc = location.replace("\\", "\\\\").replace("'", "''")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$name` ($cols) " +
      s"USING parquet LOCATION '$loc'")
  }

  def dropExternal(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")

  def drop(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)
}
