package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column names MUST match between the two:
  * the driver sorts columns by name and hashes values.
  *
  * Cross-engine determinism rules used throughout:
  *   - money/double aggregation goes through DECIMAL casts (exact,
  *     order-independent) and the final value is cast back to DOUBLE;
  *   - integer outputs are always 64-bit (BIGINT) on both sides — DuckDB
  *     `sum(INTEGER)` yields INT128, so counting uses COUNT(...) FILTER;
  *   - no raw timestamp outputs: epoch micros (unix_micros/epoch_us) or
  *     formatted strings;
  *   - every result has a total deterministic ORDER BY on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
      // default. Read it as raw nanos and truncate to micros — exactly
      // what DuckDB (the oracle) does when it loads the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
