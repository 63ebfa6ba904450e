package graft.spark

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: set `key` for the duration of `body` and
  * restore the previous value after, under the session lock — two
  * concurrent togglers would otherwise race the save/restore window and
  * leak the override to unrelated queries on the same session. Used
  * everywhere a read/stream needs a conf Spark exposes no per-operation
  * option for (partition-type inference, stateful shuffle sizing). */
object SessionConf {

  def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A =
    spark.synchronized {
      val previous = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body
      finally previous match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
}
