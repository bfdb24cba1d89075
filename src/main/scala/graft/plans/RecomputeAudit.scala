package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Ledger-wide recompute audit — the machine-readable form of the
  * round-9 shared-frame lesson (SCALE_POINT_r9 §E): a frame consumed by
  * several downstream joins/aggregates is RE-DERIVED per consumer unless
  * materialized, and a single-shot query with a diamond-shaped plan pays
  * that silently (measured up to 36× at the 20× point on q270 before its
  * persist). Spark performs no common-subexpression elimination across
  * plan branches, so the duplicate subtrees are visible statically: this
  * audit finds MAXIMAL duplicated subtrees (a duplicated node whose
  * parent is not itself duplicated) whose canonicalized form contains at
  * least one shuffle-bearing operator (Join/Aggregate/Window/Generate),
  * i.e. real recomputed work rather than a shared scan Parquet will
  * serve from cache anyway.
  *
  * Report-only BY MEASURED NECESSITY, not politeness: a logical-plan
  * duplicate is usually already deduplicated physically. Spark's
  * ReuseExchange rule executes identical exchange subtrees ONCE, so a
  * diamond whose duplicate sides end at a shuffle boundary recomputes
  * nothing but the post-shuffle pipeline. The round-9 A/B (8 flagged
  * sites converted to cuts/persists, measured at the 10× point) found
  * three regressions (q113 +33%, q161 +26%, q169 +13% — materializing
  * wide array frames or blocking pipelining costs more than the
  * ReusedExchange-served "recompute"), five washes, and no wins; all
  * eight were reverted. Materialization pays only when (a) substantial
  * POST-shuffle compute re-runs per consumer — q268's row_number
  * assignment re-ran four times, 31× at the 20× point — or (b) the
  * materialized statistics flip a join strategy — q270's unpersisted
  * 1024-row stats frame shuffled the corpus instead of broadcasting,
  * 36×. Flag → measure → then decide; the fix record lives in
  * SCALE_POINT_r9 §E.
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
      } finally
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
    }
    println(s"[recompute] total findings: $total across " +
      s"${graft.SparkEntry.queries.size} queries (minCost=$minCost)")
    spark.stop()
  }
}
