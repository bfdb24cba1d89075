package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Static scale-audits over optimized logical plans — the machine-checkable
  * form of the 100 TB design contract. Two families of scale-killer are
  * pinned here so a refactor cannot silently reintroduce them:
  *
  *  - a FORCED `broadcast()` hint on a frame whose cardinality grows with
  *    the scale factor (TPC-H customer/supplier/part/orders/lineitem and
  *    the corpus tables all scale linearly — a hint that is harmless at
  *    sf0.1 pins billions of rows to the driver at the 100 TB point; the
  *    right call is no hint, letting AQE read the real post-shuffle size);
  *  - a partitionBy-less `Window.orderBy` over an SF-proportional frame,
  *    which Spark executes by routing the WHOLE frame through one task
  *    (`Exchange SinglePartition`) — correct, sub-second at sf0.1, and
  *    serial at 100×. The scalable form is [[graft.ops.Scale.globalRank]] /
  *    [[graft.ops.Scale.globalCumSum]] (range-partition, rank locally, add
  *    broadcast per-partition offsets).
  *
  * The audits run against `optimizedPlan` (hints are resolved onto Join
  * nodes there) with [[graft.ops.Checkpoints.NoCutKey]] set, so subtrees
  * normally executed eagerly behind a localCheckpoint stay visible.
  */
object PlanAudit {

  /** Tables whose row count grows linearly with the scale factor. A
    * broadcast of (an unreduced projection of) one of these is a
    * scale-killer; nation/region are genuinely bounded dimensions. */
  val SfProportional: Set[String] = Set("customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Hinted-side subtrees with a statically-proven row bound at or below
    * this are always broadcastable (1-row totals, literal frames). */
  val MaxRowsAllowed = 1000L

  /** Leaf tables a subtree scans, by parquet file name; leaves whose
    * provenance is invisible (LogicalRDD from a checkpoint, LocalRelation)
    * contribute nothing — run under NoCutKey for full visibility. */
  def leafTables(p: LogicalPlan): Set[String] = {
    val file = "([A-Za-z0-9_]+)\\.parquet".r
    p.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.flatMap(rp =>
            file.findAllMatchIn(rp.toString).map(_.group(1)))
        case _ => Nil
      }
      case _ => Nil
    }.toSet
  }

  /** One offending join side. */
  final case class BadBroadcast(side: String, tables: Set[String]) {
    override def toString = s"broadcast-hinted $side side scans " +
      s"SF-proportional ${tables.mkString("{", ",", "}")}"
  }

  private def isBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  /** Every broadcast-HINTED join side in `df`'s optimized plan whose
    * subtree (a) has no small static row bound and (b) reaches an
    * SF-proportional leaf. AQE's own runtime-sized broadcasts are
    * invisible here by construction — only forced hints are audited,
    * which is the point: a hint overrides the size check that makes a
    * broadcast safe. */
  def sfProportionalBroadcasts(df: DataFrame): Seq[BadBroadcast] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(("left", j.hint.leftHint, j.left),
            ("right", j.hint.rightHint, j.right))
          .filter { case (_, h, _) => isBroadcast(h) }
          .filter { case (_, _, side) =>
            !side.maxRows.exists(_ <= MaxRowsAllowed) }
          .flatMap { case (name, _, side) =>
            val bad = leafTables(side).intersect(SfProportional)
            if (bad.nonEmpty) Some(BadBroadcast(name, bad)) else None
          }
    }.flatten

  /** All broadcast-hinted join sides (allowed or not) — for pins that
    * assert an exact expected hint census (q251's delta-only contract). */
  def broadcastHintedSides(df: DataFrame): Seq[(String, LogicalPlan)] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(("left", j.hint.leftHint, j.left),
            ("right", j.hint.rightHint, j.right))
          .collect { case (n, h, side) if isBroadcast(h) => (n, side) }
    }.flatten

  /** One partitionBy-less window. `offsetFrame` marks the one shape that
    * is ALWAYS fine: the ≤ #partitions-row per-partition offset frame
    * inside globalRank/globalCumSum (grouped by the synthetic `_pid`). */
  final case class GlobalWindow(orderCols: Seq[String],
      childTables: Set[String], offsetFrame: Boolean) {
    override def toString =
      s"Window.orderBy(${orderCols.mkString(",")}) over " +
        s"${childTables.mkString("{", ",", "}")}" +
        (if (offsetFrame) " [partition-offset frame]" else "")
  }

  /** Every empty-partitionSpec Window in `df`'s optimized plan, with the
    * order columns, the leaf tables its child reaches, and whether its
    * immediate input is a `_pid`-grouped offset frame. */
  def globalWindows(df: DataFrame): Seq[GlobalWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        val order = w.orderSpec.map(_.child.references.toSeq
          .map(_.name).mkString("+"))
        val pidFrame = w.child.collectFirst {
          case a: Aggregate if a.groupingExpressions.exists(
            _.references.exists(_.name == "_pid")) => a
        }.isDefined
        GlobalWindow(order, leafTables(w.child), pidFrame)
    }

  /** The audit verdict for one query: global windows whose child reaches
    * an SF-proportional leaf and is NOT the bounded partition-offset
    * frame. Tiny-frame windows (per-decile, per-round audit frames) pass
    * automatically when their child is an aggregate over a bounded
    * domain — the caller pins those by exact census where they exist. */
  def suspectGlobalWindows(df: DataFrame): Seq[GlobalWindow] =
    globalWindows(df).filter(w =>
      w.childTables.intersect(SfProportional).nonEmpty && !w.offsetFrame)
}
