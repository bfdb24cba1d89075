package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.graftplans.PlanBridge

/** Grouped top-k as a first-class operator — SURVEY §2's custom-operator
  * tier (c): a `LogicalPlan` + `Strategy` + `SparkPlan` triple registered
  * through `SparkSessionExtensions`, for semantics the built-in operators
  * only express wastefully.
  *
  * The built-in form — `row_number().over(Window.partitionBy(g).orderBy(o))
  * .filter(rn <= k)` — SORTS every group's full row set (a per-partition
  * sort of the whole table after a shuffle of the whole table) just to
  * discard all but k rows per group. This operator keeps a bounded k-row
  * heap per group instead, in two phases mirroring partial aggregation:
  *
  *  - PARTIAL: per input partition, pre-shuffle — each map task reduces
  *    its slice to ≤ k rows per group, so the exchange moves at most
  *    (#partitions × groups × k) rows, not the table. (The window form
  *    cannot do this: row_number is not algebraic.)
  *  - FINAL: after a hash exchange on the group keys (declared via
  *    `requiredChildDistribution`, so EnsureRequirements plans the
  *    exchange), the same heap pass merges the partials exactly.
  *
  * State per task is O(groups-per-task × k) rows — no sort buffer, no
  * spill proportional to the table. At 100 TB with k=3 this is the
  * difference between shuffling gigabytes and shuffling the fact table.
  *
  * The ordering must be TOTAL within a group (add a unique tie-break
  * column) or the retained set at the k-boundary is partition-dependent —
  * same determinism contract the q33 global top-k documents.
  */
object GroupedTopK {

  /** Logical node: `child` restricted to the first `k` rows per group
    * under `ordering`. Output schema = child schema (a pure row filter). */
  final case class GroupedTopKPlan(groupExprs: Seq[Expression],
      ordering: Seq[SortOrder], k: Int, child: LogicalPlan)
      extends UnaryNode {
    require(k > 0, s"k must be positive, got $k")
    require(groupExprs.nonEmpty,
      "grouped top-k needs group columns — global top-k is orderBy().limit(k)" +
        " (TakeOrderedAndProject), see q33")
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(
        newChild: LogicalPlan): GroupedTopKPlan = copy(child = newChild)
  }

  /** Physical heap pass. `partial = true` runs pre-shuffle (any
    * distribution); `partial = false` declares the clustered requirement
    * that makes EnsureRequirements insert the hash exchange. */
  final case class GroupedTopKExec(groupExprs: Seq[Expression],
      ordering: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) Seq(UnspecifiedDistribution)
      else Seq(ClusteredDistribution(groupExprs))
    override protected def withNewChildInternal(
        newChild: SparkPlan): GroupedTopKExec = copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val groupOut = groupExprs
      val orderOut = ordering
      val schema = child.output
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupOut, schema)
        // total order over rows; PriorityQueue dequeues its MAX, i.e. the
        // worst retained row under ascending sort — exactly the eviction
        // candidate
        implicit val ord: Ordering[InternalRow] =
          new LazilyGeneratedOrdering(orderOut, schema)
        val heaps =
          mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        iter.foreach { row =>
          // keyProj reuses one buffer — probe with it, copy ONLY on first
          // insert (a per-row key copy would allocate O(rows) garbage on
          // exactly the billion-row path this operator exists for)
          val probe = keyProj(row)
          val heap = heaps.get(probe) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[InternalRow]
              heaps.put(probe.copy(), h)
              h
          }
          if (heap.size < kLocal) heap += row.copy()
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap += row.copy()
          }
        }
        // intra-group emit order is unspecified (a consumer that needs
        // order sorts k rows, not the table)
        heaps.valuesIterator.flatMap(_.iterator)
      }, preservesPartitioning = true)
    }
  }

  /** Planner rule: logical node → partial heap → (exchange) → final heap. */
  object GroupedTopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupedTopKPlan(g, o, k, child) =>
        val pre =
          GroupedTopKExec(g, o, k, partial = true, planLater(child))
        GroupedTopKExec(g, o, k, partial = false, pre) :: Nil
      case _ => Nil
    }
  }

  /** Injection hook — wired into [[graft.functions.GraftExtensions]]. */
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
    ext.injectOptimizerRule(_ => RankFilterToTopK)
  }

  /** DataFrame-level API: first `k` rows per `groupCols` group under
    * `orderSpec` — (column, descending?) pairs; include a unique
    * tie-break. Catalyst `SortOrder`s are built directly from the resolved
    * attributes (a `.desc` Column carries Spark 4's internal ColumnNode
    * sort state, which is not task-serializable). */
  def topKPerKey(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val sortOrders = orderSpec.map { case (name, desc) =>
      SortOrder(GraftColumnBridge.expression(df.col(name)),
        if (desc) Descending else Ascending)
    }
    val groupExprs =
      groupCols.map(c => GraftColumnBridge.expression(df.col(c)))
    PlanBridge.ofRows(df.sparkSession,
      GroupedTopKPlan(groupExprs, sortOrders, k,
        df.queryExecution.analyzed))
  }

  /** q94_grouped_topk — top-3 orders per priority by (totalprice desc,
    * orderkey asc): the custom operator end-to-end, oracle-checked against
    * the window form it replaces. */
  def q94GroupedTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    topKPerKey(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey"))
  }

  val q94Sql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice DESC, o_orderkey)
      |           AS rn
      |  FROM orders)
      |SELECT o_orderpriority, o_orderkey, o_totalprice
      |FROM ranked WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin
  /** Optimizer rule: recognize the window-form grouped top-k users
    * actually write —
    * `row_number().over(partitionBy(g).orderBy(o)) ≤ k` with the rank
    * column then dropped — and substitute [[GroupedTopKPlan]], so the
    * heap operator kicks in WITHOUT anyone calling [[topKPerKey]]. This
    * is the §2 tier-(c) extension path completed: expression, physical
    * operator, planner strategy, and now the `Rule[LogicalPlan]` that
    * retargets existing workloads onto it.
    *
    * Fires only when the rewrite is airtight:
    *  - exactly ONE window expression, and it is `row_number()` (rank()/
    *    dense_rank() ties admit >k rows — different semantics, the
    *    built-in WindowGroupLimit pre-filter handles them);
    *  - the filter is `rn ≤ intLit` / `rn < intLit` directly above the
    *    Window;
    *  - the projection above keeps only child columns (the rank column is
    *    discarded — if it survives, row numbers must be materialized and
    *    a window over k rows per group is still required);
    *  - the partition spec is non-empty (global top-k already plans as
    *    TakeOrderedAndProject, q33).
    * Spark's own InferWindowGroupLimit may have landed first and tucked a
    * WindowGroupLimit under the Window; the rewrite strips it (the heap
    * subsumes the pre-filter).
    */
  object RankFilterToTopK
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, LessThan, LessThanOrEqual, Literal, NamedExpression, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}
    import org.apache.spark.sql.types.IntegerType

    private def limit(cond: Expression,
        rn: NamedExpression): Option[Int] = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
          if a.exprId == rn.exprId => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
          if a.exprId == rn.exprId => Some(k - 1)
      // MEASURED-REJECTION (r15 optimization round): extending the match
      // to the rn = 1 argmax/mode idiom (EqualTo(rn, 1) → k=1 heap) was
      // implemented, plan-verified (q108's mode pick lowered to heaps,
      // zero Window), and then A/B'd worse — q108 window 2.31/2.36 s vs
      // heap 2.39–2.79 s over five runs, q66 0.90/1.02 vs 1.01–1.14
      // (sf0.1 timed min-of-2, alternating binaries). Spark 4's
      // InferWindowGroupLimit already pre-filters rank ≤ k per partition
      // INSIDE codegen before the sort, so for k=1 the window form is a
      // streaming min pass; the heap exec's row-at-a-time projection
      // breaks whole-stage codegen and loses. The </<= rewrites stay:
      // their wins were measured at larger k against full sorts (q126).
      case _ => None
    }

    private def isRowNumber(e: NamedExpression): Boolean = e match {
      case Alias(WindowExpression(
        _: org.apache.spark.sql.catalyst.expressions.RowNumber, _), _) => true
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case Project(projList,
          Filter(cond, Window(Seq(rn), partitionSpec, orderSpec, child, _)))
          if isRowNumber(rn) && partitionSpec.nonEmpty &&
            limit(cond, rn).exists(_ > 0) &&
            projList.forall(_.references.subsetOf(child.outputSet)) =>
        val grandchild = child match {
          case WindowGroupLimit(_, _, _, _, c) => c
          case c => c
        }
        Project(projList,
          GroupedTopKPlan(partitionSpec, orderSpec,
            limit(cond, rn).get, grandchild))
    }
  }

  /** q126_rank_filter — the window form VERBATIM (withColumn(row_number)
    * → filter ≤ 3 → drop), executed through [[RankFilterToTopK]]: the
    * optimized plan must contain no WindowExec. Oracle: the same ranked
    * filter in SQL. */
  def q126RankFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, desc, row_number}
    val w = W.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    graft.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey"))
  }

  val q126Sql: String = q94Sql
}
