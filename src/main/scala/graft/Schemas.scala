package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Fixed schema contracts — SURVEY.md §1.2/§1.3.
  *
  * The reference reads with schema inference and narrows to a fixed
  * 13-column warehouse DDL (`/root/reference/setup.py:78-96`, casts at
  * `data/emr/etl.py:21-26`, projection at `etl.py:28-43`), failing loudly if
  * a source column is missing (implicit strict contract — `etl.py:43` would
  * throw AnalysisException). [[conform]] reproduces that policy for any
  * target schema: validate presence, cast, project in DDL order.
  */
object Schemas {

  /** The reference warehouse table, `fhvhv_tripdata` (`setup.py:80-95`).
    * CHAR(6) → StringType (validated, not padded — SURVEY §7.4); FLOAT money
    * → DoubleType for behavioral parity. */
  val fhvhvTripdata: StructType = StructType(Seq(
    StructField("hvfhs_license_num", StringType),
    StructField("dispatching_base_num", StringType),
    StructField("request_datetime", TimestampType),
    StructField("on_scene_datetime", TimestampType), // nullable in public data
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("pu_location_id", IntegerType),
    StructField("do_location_id", IntegerType),
    StructField("sales_tax", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType),
    StructField("tips", DoubleType),
    StructField("driver_pay", DoubleType)))

  /** Source→target column renames the reference ETL applies
    * (`etl.py:21-26`). */
  val fhvhvRenames: Map[String, String] = Map(
    "PULocationID" -> "pu_location_id",
    "DOLocationID" -> "do_location_id")

  /** Conform an inferred-schema frame to a fixed target schema: apply
    * renames, fail loudly on missing columns, cast each column to its target
    * type, project in target order. This is the reference's ingest boundary
    * policy as a reusable operator. */
  def conform(df: DataFrame, target: StructType,
      renames: Map[String, String] = Map.empty): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val missing = target.fieldNames.filterNot(renamed.columns.contains)
    require(missing.isEmpty,
      s"source is missing required columns: ${missing.mkString(", ")}")
    renamed.select(target.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Test-fixture ON-DISK schemas (FIXTURES.md §B), for streaming readers
    * that cannot infer (readStream requires an explicit schema matching the
    * files — for `events` that is the raw nanos-as-long BIGINT `ts`, not the
    * converted timestamp the batch loader exposes). */
  def tableSchema(spark: SparkSession, sfDir: String, name: String): StructType =
    Tables.rawSchema(spark, sfDir, name)
}
