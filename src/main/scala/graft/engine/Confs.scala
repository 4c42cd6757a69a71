package graft.engine

import org.apache.spark.sql.SparkSession

/** Temporarily-scoped session configuration — the one save/set/restore
  * idiom shared by every caller that must pin a conf for a bounded
  * lifecycle (dynamic partition overwrite for one write, state-store
  * partition count through a streaming query). Handles the unset case:
  * a key with no session value is restored by UNSETTING, not by
  * writing back a materialized default. */
object Confs {

  def withConf[T](spark: SparkSession, key: String, value: String)
      (body: => T): T = {
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
