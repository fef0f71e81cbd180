package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the graded parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All loaders are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning into the scan; the only special case is `events`.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Oracle parity for every date/timestamp query assumes UTC. The
    // driver builds its own session, so pin the (runtime-settable) conf
    // here rather than trusting session construction — same pattern as
    // nanosAsLong in `events`.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")

  /** `events.parquet`'s `ts` physical type has varied across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) (which Spark 4 refuses
    * at scan time, `PARQUET_TYPE_ILLEGAL`, and must be read as a long via
    * `nanosAsLong` then µs-truncated — bit-identical to DuckDB's read of
    * the same file, SURVEY.md §5) vs. a plain TIMESTAMP(MICROS) that needs
    * no conversion. Dispatch on the scanned schema so both generations
    * load identically; every downstream key sees a µs TimestampType `ts`.
    * The conf is runtime-settable, so each query can depend on this loader
    * regardless of how the driver built the session.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a µs TimestampType
    }
  }
}
