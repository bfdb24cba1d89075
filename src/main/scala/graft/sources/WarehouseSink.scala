package graft.sources

import org.apache.spark.sql.functions.{col, year}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks — the reference's output surface re-expressed (SURVEY.md §2.1).
  *
  * The reference appends to Redshift over JDBC with an S3 staging dir
  * (`/root/reference/data/emr/etl.py:45-55`) and lands raw files in a
  * year-partitioned S3 layout (`save_nyc_data_to_s3.py:36-48`). Locally the
  * JDBC path cannot be exercised (zero egress, no warehouse), so the writer
  * builders are thin and the parquet forms are the tested paths — the driver
  * harness itself is the parquet sink (Verify.scala).
  *
  * Scale notes: JDBC append parallelism is per-partition (one connection per
  * partition — size with repartition(n) to match the warehouse's ingest
  * concurrency); the raw-zone writer partitions by year so downstream reads
  * prune partitions (the layout the reference builds by hand with f-strings).
  */
object WarehouseSink {

  /** JDBC append writer, configured like the reference's Redshift sink
    * (`etl.py:45-55`): blind append, driver-supplied URL/table. Returns the
    * configured writer so callers decide when to `.save()`. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      properties: Map[String, String] = Map.empty) = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(SaveMode.Append)
    properties.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Raw-zone writer: the reference's `raw/fhvhv/{year}/...` layout
    * (`save_nyc_data_to_s3.py:42-44`) as a real partitioned parquet write —
    * read-side partition pruning replaces its hand-built key strings. */
  def rawZoneAppend(df: DataFrame, root: String, tsCol: String): Unit =
    df.withColumn("year", year(col(tsCol)))
      .write.partitionBy("year")
      .mode(SaveMode.Append)
      .parquet(root)

  /** Deduplicated append — closes the reference's double-load hole (its
    * idempotency branch guards the download, but the JDBC append is blind,
    * `etl.py:53-55`): left-anti join against the existing sink keys before
    * appending. */
  def dedupAppend(df: DataFrame, existing: DataFrame,
      keys: Seq[String]): DataFrame =
    df.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
