package graft.engine.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the fit-once artifact family (keep-lists, IVF
  * quantizers, MinHash/bigram signature stores, co-occurrence edges,
  * language profiles): a CONTENT fingerprint to key stored artifacts
  * and an atomic ensure-built accessor.
  *
  * Why not key by row count: a corpus regenerated with the same
  * cardinality but different content would silently serve stale
  * signatures/centroids — wrong answers, no error. The fingerprint
  * here derives from the scan's file inventory (path, length,
  * modification time of every input file): any rewrite of any input
  * file changes it, and it costs one driver-side listing — NO data
  * pass, which is the property that matters at 100 TB where even one
  * extra corpus scan per query dwarfs the query. Plan shape (filters,
  * projections) is folded in via the canonicalized plan hash so two
  * different subsets of the same files key differently.
  *
  * Inputs with no file scan (in-memory test frames) fall back to a
  * one-pass order-independent content checksum (bit_xor of a per-row
  * xxhash64) — tiny by construction in that case.
  */
object Artifacts {

  /** (sessionId, plan semanticHash) → fingerprint; makes repeat calls
    * within a session free (no listing, no Spark action). */
  private val fpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def fingerprintOf(df: DataFrame): String = {
    val key = System.identityHashCode(df.sparkSession) + ":" +
      df.queryExecution.analyzed.semanticHash()
    fpCache.computeIfAbsent(key, _ => compute(df))
  }

  private def compute(df: DataFrame): String = {
    // Session-STABLE plan signature. semanticHash() is NOT stable
    // across JVMs — it hashes relation objects whose FileIndex uses
    // identity hashCode — so keying on it silently rebuilt every
    // artifact once per session. The default toString is ALSO unsafe:
    // it truncates each node's argument list at
    // spark.sql.debug.maxToStringFields (25), so two plans differing
    // only past the 25th projected column would collide and serve a
    // stale artifact. Render the CANONICALIZED plan (exprIds
    // normalized deterministically — no regex strip that could eat
    // numeric-suffix string literals) with an un-truncated treeString.
    val planHash = df.queryExecution.analyzed.canonicalized
      .treeString(verbose = true, addSuffix = false,
        maxFields = Int.MaxValue, printOperatorId = false)
      .replaceAll("@[0-9a-fA-F]+", "")
    val files = df.inputFiles
    val body: String =
      if (files.nonEmpty) {
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        files.sorted.map { f =>
          val p = new Path(f)
          val st = p.getFileSystem(conf).getFileStatus(p)
          s"$f|${st.getLen}|${st.getModificationTime}"
        }.mkString("\n")
      } else {
        val cols = df.columns.map(c => s"`$c`").mkString(", ")
        val r = df.agg(
          expr(s"coalesce(bit_xor(xxhash64(struct($cols))), 0L)").as("x"),
          count(lit(1)).as("n")).head()
        s"content|${r.getLong(0)}|${r.getLong(1)}"
      }
    // FNV-1a over the inventory string → a short stable hex token
    var h = 0xcbf29ce484222325L
    (s"$planHash\n$body").foreach { c => h ^= c; h *= 0x100000001b3L }
    java.lang.Long.toHexString(h)
  }

  /** Build-once accessor: if `path/_SUCCESS` does not exist, run
    * `build` against a temp sibling and atomically rename it into
    * place. Concurrent sessions race safely: the loser's rename fails
    * against the winner's directory and its temp output is discarded —
    * readers only ever see a complete artifact. */
  def ensure(spark: SparkSession, path: String)(
      build: String => Unit): String = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "_SUCCESS"))) {
      val tmp = new Path(
        path + ".tmp-" + java.util.UUID.randomUUID.toString.take(8))
      build(tmp.toString)
      // re-check: Hadoop rename onto an existing directory would nest
      // tmp inside it — if another session won the race, just discard
      if (fs.exists(new Path(path, "_SUCCESS")) || !fs.rename(tmp, target))
        fs.delete(tmp, true)
    }
    path
  }
}
