package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Ledger-wide recompute audit — the machine-readable form of the
  * round-9 shared-frame lesson (SCALE_POINT_r9 §E): a frame consumed by
  * several downstream joins/aggregates MAY be re-derived per consumer
  * unless materialized, and a single-shot query with a diamond-shaped
  * plan pays that silently (measured 2.3× at the 20× point on q270
  * before its persist). Spark performs no common-subexpression
  * elimination across LOGICAL plan branches, so the duplicate subtrees
  * are visible statically: this audit finds MAXIMAL duplicated subtrees
  * (a duplicated node whose parent is not itself duplicated) whose
  * canonicalized form contains at least one shuffle-bearing operator
  * (Join/Aggregate/Window/Generate), i.e. potentially recomputed work
  * rather than a shared scan Parquet will serve from cache anyway.
  *
  * Report-only BY MEASURED NECESSITY, not politeness: a logical-plan
  * duplicate is usually already deduplicated physically. Spark's
  * ReuseExchange rule executes identical exchange subtrees ONCE, so a
  * diamond whose duplicate sides end at a shuffle boundary recomputes
  * nothing but the post-shuffle pipeline, and an InMemoryRelation scan
  * can replace a whole-stage-codegen pipeline at a net loss. The
  * round-9 A/Bs (leak-free bench — see the §E correction record):
  * eight flagged sites converted and REVERTED (q113 +33%, q161 +26%,
  * q169 +13%, rest wash), q269/q271's persists REVERTED
  * (q271 2× worse at 20×). Materialization paid in exactly two cases:
  * q270's 1024-row stats frame broadcasts once its size is known
  * instead of shuffling the corpus into a low-cardinality SMJ (2.3×),
  * and q268's four-way-consumed assignment (1.35×). Flag → measure →
  * then decide; the full record lives in SCALE_POINT_r9 §E.
  *
  * Usage: `sbt "runMain graft.plans.RecomputeAudit <sfDir> [minCost]"`.
  */
object RecomputeAudit {

  /** One maximal duplicated subtree: how many times it occurs in the
    * plan, how many shuffle-bearing operators it contains, and its root
    * node name for orientation. */
  final case class Dup(occurrences: Int, cost: Int, root: String)

  private def cost(p: LogicalPlan): Int = p.collect {
    case _: Join => 1
    case _: Aggregate => 1
    case _: Window => 1
    case _: Generate => 1
  }.size

  /** Maximal duplicated subtrees in `df`'s optimized plan with at least
    * `minCost` shuffle-bearing operators. Subtrees under an
    * InMemoryRelation never appear here — a persisted frame IS the fix —
    * so adopting the q268/q270 persist pattern clears its finding. */
  def duplicates(df: DataFrame, minCost: Int = 1): Seq[Dup] = {
    val plan = df.queryExecution.optimizedPlan
    val counts = new scala.collection.mutable.HashMap[LogicalPlan, Int]
    plan.foreach { p => counts(p.canonicalized) =
      counts.getOrElse(p.canonicalized, 0) + 1 }
    def maximalDups(p: LogicalPlan, parentDup: Boolean): Seq[LogicalPlan] = {
      val dup = counts(p.canonicalized) > 1
      val here = if (dup && !parentDup) Seq(p) else Nil
      here ++ p.children.flatMap(maximalDups(_, dup))
    }
    maximalDups(plan, parentDup = false)
      .groupBy(_.canonicalized).values.map(_.head).toSeq
      .map(p => Dup(counts(p.canonicalized), cost(p), p.nodeName))
      .filter(_.cost >= minCost)
      .sortBy(d => (-d.cost * d.occurrences, d.root))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minCost = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-recompute-audit")
    spark.sparkContext.setLogLevel("WARN")
    var total = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val dups = duplicates(fn(spark, sfDir), minCost)
        dups.foreach { d =>
          total += 1
          println(s"[recompute] $name: ${d.occurrences}x ${d.root} " +
            s"subtree with ${d.cost} shuffle-bearing ops")
        }
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[recompute] $name: build-error ${e.getMessage}")
      } finally {
        // clearCache first, mirroring AuditSweep/Bench/Verify: releasing
        // RDD blocks alone leaves the CacheManager ENTRY alive, and
        // plan-equality substitution would splice one query's persisted
        // frame (q268/q270/q273 persist shared components) into every
        // later query that builds the same subtree. duplicates() skips
        // subtrees under InMemoryRelation, so a leaked entry silently
        // MASKS later queries' duplicate-subtree findings — the exact
        // cross-query leak this audit exists to surface.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    println(s"[recompute] total findings: $total across " +
      s"${graft.SparkEntry.queries.size} queries (minCost=$minCost)")
    spark.stop()
  }
}
