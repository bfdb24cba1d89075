package graft

import org.apache.spark.sql.SparkSession

/** One place for local-session construction so the configs every entry point
  * must agree on (UTC, nanosAsLong for the events fixture, the graft SQL
  * extensions, CPU-matched shuffle partitions) cannot drift between Verify,
  * Bench, Explain, Soak, and the test suites. */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
