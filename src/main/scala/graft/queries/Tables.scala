package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst gets full pushdown/pruning;
  * at cluster scale the same queries run over versioned tables resolved by
  * [[graft.spark.VersionedReader]] (reference read model:
  * `examples/src/main/scala/com/gu/tableversions/examples/TableLoader.scala:37-38`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects unless
    // nanos are read back as LONG; `tsTimestamp` rebuilds a timestamp col.
    // One-way idempotent init (never toggled back), so concurrent loads
    // can't race a save/restore window or leak a transient state.
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(nanosKey).contains("true")) spark.conf.set(nanosKey, "true")
    spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** Microsecond-precision timestamp from a nanos-as-long timestamp column.
    * Integer `div` — a double-routed division loses µs precision at
    * 1e18-scale nanosecond values. */
  def tsTimestamp(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"timestamp_micros($colName div 1000)")
}
