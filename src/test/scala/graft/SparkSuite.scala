package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (same configs as Verify/Bench,
  * via the shared [[graft.Sessions]] builder). */
object SparkSuite {
  lazy val session: SparkSession = Sessions.local("4", "graft-test")

  val sf: String = "/root/testdata/sf0.001"
}
