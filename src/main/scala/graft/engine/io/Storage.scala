package graft.engine.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Folder/object storage utilities over the Hadoop FileSystem API — the
  * Spark re-expression of the reference's S3 helpers (SURVEY.md §1.2
  * [RECONSTRUCTED]: `s3.py` — upload/download, list folder, copy folder,
  * delete folder, read/write JSON). The same code serves `file://` in
  * this harness and `s3a://`/`hdfs://` on a cluster — the scheme is
  * resolved per-path, so no S3 SDK coupling.
  */
object Storage {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf(spark)), p)
  }

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** Non-recursive listing of a folder's entry paths, sorted. */
  def listFolder(spark: SparkSession, path: String): Seq[String] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Nil
    else f.listStatus(p).map(_.getPath.toString).sorted.toSeq
  }

  /** All file paths under a prefix, recursive, sorted. */
  def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Nil
    else {
      val it = f.listFiles(p, true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) out += it.next().getPath.toString
      out.result().sorted
    }
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** Copy a folder (or file) tree. */
  def copyFolder(spark: SparkSession, src: String, dst: String): Unit = {
    val (fsSrc, pSrc) = fs(spark, src)
    val (fsDst, pDst) = fs(spark, dst)
    FileUtil.copy(fsSrc, pSrc, fsDst, pDst, false, true, conf(spark))
  }

  /** Recursive delete; returns true if anything was removed. */
  def deleteFolder(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p) && f.delete(p, true)
  }

  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val (f, p) = fs(spark, path)
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(spark: SparkSession, path: String): String = {
    val (f, p) = fs(spark, path)
    val in = f.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
  }
}
