package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Mirrors the reference's schema-on-read posture: parquet schema is inferred
  * from footers (reference: `data/emr/etl.py:20` reads with inference), and any
  * narrowing to a fixed contract happens in the ingest operators
  * ([[graft.ops.Ingest]]), not here.
  *
  * Scale note: each loader is a plain parquet scan, so Catalyst pushes column
  * pruning and predicate filters down into the vectorized reader. At 100 TB the
  * same call reads a partitioned directory tree instead of a single file —
  * nothing here assumes single-file input.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** All access routes through here so format quirks are handled once:
    * `events` always arrives with its µs timestamp (see [[events]]) no
    * matter which entry point a caller uses. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else raw(spark, sfDir, name)

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The on-disk schema, BEFORE any loader conversion — what a
    * `readStream.schema(...)` against the files themselves must use (for
    * `events` under nanosAsLong that means `ts: BIGINT`, not the converted
    * timestamp [[events]] exposes). */
  def rawSchema(spark: SparkSession, sfDir: String,
      name: String): org.apache.spark.sql.types.StructType =
    raw(spark, sfDir, name).schema

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` normalization — the driver has shipped this column in two
    * physical forms across fixture generations, and every operator downstream
    * expects an instant (`TimestampType`):
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (Verify / Bench / test
    *    sessions set it); the column arrives as BIGINT nanoseconds and is
    *    floor-divided to µs — the same truncation DuckDB applies on read.
    *    `div` is 64-bit integer division (double division would lose
    *    precision: ns epochs ≈ 1.7e18 > 2^53).
    *  - plain `timestamp[us]` with no UTC-adjustment flag: Spark 4 infers
    *    TIMESTAMP_NTZ. The session TZ is pinned to UTC (build.sbt /
    *    SparkSessionFactory), so casting to TimestampType is a pure
    *    reinterpretation of the same µs value — DuckDB already reads the
    *    column as naive µs, so oracle hashes are unaffected.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = raw(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Unique total-order key for `lineitem` row-level outputs.
    *
    * The synthetic data does NOT make (l_orderkey, l_linenumber) unique
    * (verified at sf0.01: 60000 rows, 45832 distinct pairs), but adding
    * (l_partkey, l_extendedprice) does. Every row-level lineitem query must
    * end with this ordering so the driver's hash compare is deterministic.
    */
  val lineitemKey: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
}
