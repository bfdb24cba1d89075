package graft.plans

/** Ledger-wide scale audit: run [[PlanAudit.suspectGlobalWindows]] and
  * [[PlanAudit.sfProportionalBroadcasts]] over EVERY registered query and
  * print one line per finding. The per-query pins in BenchContractSpec
  * guard the historically weak sites; this sweep is how a NEW weak site
  * in a NEW query gets noticed at all. AuditSweepSpec asserts the sweep
  * output against a written exemption census; this main is the local
  * discovery form (`sbt "runMain graft.plans.AuditSweep <sfDir>"`).
  *
  * Queries are built with lineage cuts ACTIVE — this audits the plan as
  * registered and executed. Iterative queries execute their bounded
  * sf0.001 loops during construction; that is the price of seeing the
  * real plan, and at the smoke scale it is cheap.
  */
object AuditSweep {
  final case class Finding(query: String, kind: String, detail: String)

  /** All findings across the ledger, one row per suspect window /
    * forced SF-proportional broadcast. */
  def sweep(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[Finding] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        PlanAudit.suspectGlobalWindows(df)
          .map(w => Finding(name, "global-window", w.toString)) ++
          PlanAudit.sfProportionalBroadcasts(df)
            .map(b => Finding(name, "forced-broadcast", b.toString)) ++
          PlanAudit.unguardedHashBuilds(df)
            .map(b => Finding(name, "fixed-hash-build", b.toString))
      } catch { case scala.util.control.NonFatal(e) =>
        // a query that cannot even build is its own loud failure in
        // the correctness gate; the audit reports and moves on
        Seq(Finding(name, "build-error", e.toString))
      } finally {
        // audit ISOLATION, not just memory hygiene: a frame one query
        // persists during construction (q268/q270/q273 cache shared
        // components) is substituted BY PLAN EQUALITY into
        // every later query's optimized plan (q66 builds the same
        // quantized frame), hiding leaves behind InMemoryRelation and
        // silently changing that query's audit findings. Each query
        // must be audited as it would run alone — the same per-query
        // unpersist Verify and Bench already do.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-audit-sweep")
    spark.sparkContext.setLogLevel("WARN")
    val findings = sweep(spark, sfDir)
    findings.foreach(f => println(s"[audit] ${f.query} ${f.kind}: ${f.detail}"))
    println(s"[audit] total findings: ${findings.size} across " +
      s"${graft.SparkEntry.queries.size} queries")
    spark.stop()
  }
}
