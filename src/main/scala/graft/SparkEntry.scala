package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here as a pure function
  * `(SparkSession, sfDir) => DataFrame` plus (where SQL-expressible) a
  * DuckDB oracle query over the same parquet tables. Determinism rules
  * (FIXTURES.md): total order on a unique key set; aggregated doubles go
  * through DECIMAL(18,4) sums cast back to double (exact in both engines);
  * row-level double arithmetic is left unrounded (IEEE-identical).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Ingest.q01Ingest(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_ingest"      -> (Ingest.q01Ingest _),
    "q02_incremental" -> (Ingest.q02Incremental _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_ingest"      -> Ingest.q01Sql,
    "q02_incremental" -> Ingest.q02Sql,
  )
}
