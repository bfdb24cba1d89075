package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.Tables

/** Reference-parity ingest core.
  *
  * The reference's single Spark job (`/root/reference/data/emr/etl.py:20-55`)
  * is scan → cast two columns (`etl.py:21-26`) → project a fixed column list
  * (`etl.py:28-43`) → append to the warehouse. Its idempotency mechanism is a
  * per-file existence check before downloading a month
  * (`/root/reference/data/airflow/dags/save_nyc_data_to_s3.py:58-78`), which is
  * semantically a left-anti join of candidate months against already-ingested
  * months.
  *
  * Scale notes: q01 is a narrow, shuffle-free pipeline (scan→project→cast) —
  * on a 1000-executor cluster it stays a single stage with column pruning
  * pushed into the parquet footprint; the final orderBy exists ONLY for the
  * driver's deterministic hash compare and would be dropped in production
  * append mode (the reference's JDBC sink has no ordering either,
  * `etl.py:53-55`). q02's anti-join keys are year-months — a few hundred rows
  * at any scale — so Catalyst broadcasts the ingest log; no shuffle of the
  * candidate side is needed.
  */
object Ingest {

  /** q01_ingest — the literal reference capability on the `lineitem` stand-in:
    * cast+rename two columns (mirrors `etl.py:21-26` casting
    * `PULocationID`/`DOLocationID` to int with a snake_case rename), then
    * project a fixed 11-column target list in DDL order (mirrors
    * `etl.py:28-43`).
    */
  def q01Ingest(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.lineitem(spark, sfDir)
    src
      .withColumn("part_id", col("l_partkey").cast(IntegerType))
      .withColumn("line_no", col("l_linenumber").cast(LongType))
      .select(
        col("l_orderkey"), col("line_no"), col("part_id"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("line_no"), col("part_id"),
        col("l_extendedprice"))
  }

  val q01Sql: String =
    """SELECT l_orderkey,
      |       CAST(l_linenumber AS BIGINT) AS line_no,
      |       CAST(l_partkey AS INTEGER) AS part_id,
      |       l_suppkey, l_quantity, l_extendedprice, l_discount, l_tax,
      |       l_returnflag, l_linestatus, l_shipdate
      |FROM lineitem
      |ORDER BY l_orderkey, line_no, part_id, l_extendedprice""".stripMargin

  /** q02_incremental — the reference's idempotent-ingest branch
    * (`save_nyc_data_to_s3.py:58-78`: head-object, skip month if present) as a
    * left-anti join: candidate months (distinct l_shipdate months) minus the
    * ingest log (distinct o_orderdate months). Returns the months still to
    * ingest with their pending row counts.
    */
  def q02Incremental(spark: SparkSession, sfDir: String): DataFrame = {
    val candidates = Tables.lineitem(spark, sfDir)
      .select(date_trunc("month", col("l_shipdate")).as("ym"))
    val ingested = Tables.orders(spark, sfDir)
      .select(date_trunc("month", col("o_orderdate")).as("ym"))
      .distinct()
    candidates
      .join(ingested, Seq("ym"), "left_anti")
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("pending_rows"))
      .orderBy(col("ym"))
  }

  val q02Sql: String =
    """SELECT date_trunc('month', l_shipdate) AS ym,
      |       count(*) AS pending_rows
      |FROM lineitem
      |WHERE date_trunc('month', l_shipdate) NOT IN
      |      (SELECT DISTINCT date_trunc('month', o_orderdate) FROM orders)
      |GROUP BY 1
      |ORDER BY ym""".stripMargin

  /** q05_source — aggregate over the custom DataSource V2 generator
    * ([[graft.sources.SyntheticSource]]): the id-range filter is absorbed
    * into the scan (generation starts at the bound — no generate-then-drop)
    * and only the referenced columns are materialized; the oracle
    * re-derives the same rows from DuckDB's `range`. Columns are pure
    * integer functions of id, so the grouped sums are exact. */
  def q05Source(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", 100000L).option("partitions", 16).load()
      .filter(col("id") >= 60000L && col("id") < 90000L)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("val")).as("sum_val"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .orderBy(col("bucket"))

  val q05Sql: String =
    """SELECT ((id * 2654435761) % 1000000007) % 100 AS bucket,
      |       count(*) AS n,
      |       CAST(sum((id * 31 + 7) % 997) AS BIGINT) AS sum_val,
      |       min(id) AS min_id, max(id) AS max_id
      |FROM (SELECT range AS id FROM range(60000, 90000))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q153_source_agg — the aggregate-pushdown path of the q05 custom
    * source: an ungrouped COUNT/MIN/MAX over a filtered 50M-row synthetic
    * slice. The source answers from its closed form (SyntheticSource's
    * `SupportsPushDownAggregates`) — the plan contains NO aggregate node
    * and generates NO rows; the same query without pushdown would
    * enumerate 30M ids. The oracle computes the identical closed form
    * from `range()` endpoints (kept small corpus-side: DuckDB evaluates
    * its range lazily for min/max/count too). */
  def q153SourceAgg(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", 50000000L).option("partitions", 16).load()
      .filter(col("id") >= 1000000L && col("id") < 31000000L)
      .agg(count(lit(1)).as("n_rows"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))

  val q153Sql: String =
    """SELECT count(*) AS n_rows, min(id) AS min_id, max(id) AS max_id
      |FROM (SELECT range AS id FROM range(1000000, 31000000))""".stripMargin
}
