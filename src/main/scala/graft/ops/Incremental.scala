package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Incremental aggregate maintenance — the materialized-view pattern: keep
  * per-group ALGEBRAIC partial states (sum/count/min/max), fold each new
  * batch into them by re-aggregating states, and never rescan history.
  * This is how a 100 TB warehouse keeps daily rollups: the nightly job
  * aggregates ONLY the new partition and merges ~|groups| state rows.
  *
  * Correctness hinges on the merge being exact: decimal sums make the
  * partial-then-merge path bit-identical to a full recompute, which is
  * precisely what the oracle checks (q106's oracle SQL is the FULL
  * recompute — the incremental plan must match it to the hash).
  */
object Incremental {

  /** One batch's partial state per group. */
  def partialState(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("s_price"),
        count(lit(1)).as("n_rows"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))

  /** Merge any number of partial-state frames into the current view. All
    * four aggregates are algebraic, so merging = re-aggregating states. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("s_price")).as("s_price"),
        sum(col("n_rows")).as("n_rows"),
        min(col("first_ship")).as("first_ship"),
        max(col("last_ship")).as("last_ship"))

  /** q106_incremental_agg — split the fact table into a "history" batch and
    * a "new arrivals" batch at a date cutoff, maintain the view
    * incrementally, and emit the merged state (avg derived at read time).
    * The oracle recomputes from scratch — hash equality proves the
    * incremental path is exact. */
  /** Delta membership predicates for q251 — deterministic "new arrivals"
    * slices of each side of the view. */
  val IvmOrderMod = 20L
  val IvmOrderRem = 7L
  val IvmCustMod = 25L
  val IvmCustRem = 3L

  /** q251_ivm_join — incremental view maintenance for a JOIN view, the
    * companion to q106's aggregate maintenance: V = orders ⋈ customer is
    * kept up to date under simultaneous inserts on BOTH sides by the
    * textbook delta algebra
    * `V_new = V_old ∪ (ΔO ⋈ C_old) ∪ (O_old ⋈ ΔC) ∪ (ΔO ⋈ ΔC)` — three
    * delta joins whose inputs are the small new batches (and one
    * old-fact × new-dim term that prunes to the ΔC keys), never a rescan
    * of V_old's join. The Spark side BUILDS the view incrementally and
    * reports per market segment, attributing every row to the term that
    * produced it; the ORACLE computes the full join from scratch and
    * derives the same attribution from the membership predicates — so
    * the hash match IS the proof that the maintenance algebra loses and
    * invents nothing.
    *
    * Scale: the three delta terms join |Δ|-sized frames (broadcast the
    * delta side); the V_old term is carried as counts only here — a real
    * maintenance job appends the delta rows to the stored view, cost
    * O(|Δ| + |ΔC-matched history|), the entire point of IVM at 100 TB. */
  def q251IvmJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        (pmod(col("o_orderkey"), lit(IvmOrderMod)) === IvmOrderRem)
          .as("is_new"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"),
        (pmod(col("c_custkey"), lit(IvmCustMod)) === IvmCustRem)
          .as("c_new"))
    val oldO = o.filter(!col("is_new")); val dO = o.filter(col("is_new"))
    val oldC = c.filter(!col("c_new"));  val dC = c.filter(col("c_new"))
    // Broadcast ONLY the delta side of each term — the IVM contract is
    // that |Δ| is batch-bounded (a day's arrivals), never SF-bounded, so
    // ΔO/ΔC are the only frames a 100 TB run may pin to every executor.
    // The base term joins two ~full-size frames: no hint, AQE picks (it
    // broadcasts oldC at fixture scale because it MEASURES small, which
    // is exactly the decision a hint would have frozen wrongly at 100×).
    // Plan-pinned in BenchContractSpec: base term unhinted, exactly the
    // three delta terms hinted, hinted side always the Δ frame.
    def term(fact: DataFrame, dim: DataFrame, name: String) = fact
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("cents"), lit(name).as("term"))
    val vNew = term(oldO, oldC, "base")
      .unionAll(term(broadcast(dO), oldC, "dO_C"))
      .unionAll(term(oldO, broadcast(dC), "O_dC"))
      .unionAll(term(dO, broadcast(dC), "dO_dC"))
    vNew.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents")).as("sum_cents"),
        sum(when(col("term") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("term") === "dO_C", 1L).otherwise(0L)).as("n_do_c"),
        sum(when(col("term") === "O_dC", 1L).otherwise(0L)).as("n_o_dc"),
        sum(when(col("term") === "dO_dC", 1L).otherwise(0L)).as("n_do_dc"))
      .orderBy(col("c_mktsegment"))
  }

  val q251Sql: String =
    s"""WITH v AS (
       |  SELECT c.c_mktsegment,
       |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
       |              AS BIGINT) AS cents,
       |         o.o_orderkey % $IvmOrderMod = $IvmOrderRem AS o_new,
       |         c.c_custkey % $IvmCustMod = $IvmCustRem AS c_new
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
       |SELECT c_mktsegment,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(cents) AS BIGINT) AS sum_cents,
       |       CAST(sum(CASE WHEN NOT o_new AND NOT c_new THEN 1 ELSE 0
       |                END) AS BIGINT) AS n_base,
       |       CAST(sum(CASE WHEN o_new AND NOT c_new THEN 1 ELSE 0
       |                END) AS BIGINT) AS n_do_c,
       |       CAST(sum(CASE WHEN NOT o_new AND c_new THEN 1 ELSE 0
       |                END) AS BIGINT) AS n_o_dc,
       |       CAST(sum(CASE WHEN o_new AND c_new THEN 1 ELSE 0
       |                END) AS BIGINT) AS n_do_dc
       |FROM v GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  /** Delta membership predicates for q260 — the held-out insert batch and
    * the base subset the delete delta removes (disjoint by remainder). */
  val IvmAggMod = 20L
  val IvmAggInsRem = 7L
  val IvmAggDelRem = 11L

  /** Signed per-group partial state: n_rows/sum_cents fold the row SIGN
    * (+1 insert, −1 delete), n_inserted/n_deleted record the attribution.
    * Signed states form a group (every delta has an inverse), which is
    * what makes DELETE maintainable for sum/count — and precisely what
    * min/max lack (no inverse: a deleted minimum forces a per-group
    * rescan), which is why q260's view carries none. */
  def signedState(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        sum(col("sign")).as("n_rows"),
        sum(col("sign") * col("cents")).as("sum_cents"),
        sum(when(col("sign") > 0, 1L).otherwise(0L)).as("n_inserted"),
        sum(when(col("sign") < 0, 1L).otherwise(0L)).as("n_deleted"))

  /** Fold one signed delta state into the view: union the state rows,
    * re-aggregate (all four columns are sums — merging IS adding), and
    * evict groups the deltas emptied (n_rows = 0). Associative and
    * batchable: delta ∘ delta = batch of both, which the spec asserts. */
  def applyDelta(view: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame =
    view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_cents")).as("sum_cents"),
        sum(col("n_inserted")).as("n_inserted"),
        sum(col("n_deleted")).as("n_deleted"))
      .filter(col("n_rows") > 0)

  /** q260_ivm_agg — incremental maintenance of a GROUPED-AGGREGATE view
    * under inserts AND deletes, completing q106 (insert-only aggregate
    * maintenance) and q251 (join-view delta algebra): the per-(returnflag,
    * linestatus) revenue view is maintained by folding SIGNED deltas —
    * insert rows at +1, delete rows at −1 — into the stored state, never
    * rescanning the base. The oracle recomputes the final membership
    * (base − deletes + inserts) from scratch; hash equality proves the
    * signed fold loses and invents nothing, including the per-group
    * insert/delete attribution carried through the merge.
    *
    * Scale: each maintenance step aggregates ONLY the delta batch
    * (map-side combine to |groups| state rows) and merges state frames —
    * O(|Δ| + |groups|) per batch, the nightly-rollup shape at 100 TB.
    * Exact-integer cents keep the fold order-independent; the one IEEE
    * division (avg) happens at read time. */
  def q260IvmAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Seq("l_returnflag", "l_linestatus")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        pmod(col("l_orderkey"), lit(IvmAggMod)).as("slot"))
    val base = li.filter(col("slot") =!= IvmAggInsRem)
      .withColumn("sign", lit(1L))
    val delta = li.filter(col("slot") === IvmAggInsRem)
      .withColumn("sign", lit(1L))
      .unionByName(li.filter(col("slot") === IvmAggDelRem)
        .withColumn("sign", lit(-1L)))
    val v0 = signedState(base, keys)
      // the stored view's own attribution columns start at zero — only
      // maintenance traffic counts as inserted/deleted
      .withColumn("n_inserted", lit(0L)).withColumn("n_deleted", lit(0L))
    applyDelta(v0, signedState(delta, keys), keys)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        col("sum_cents"), col("n_inserted"), col("n_deleted"),
        (col("sum_cents").cast("double") / col("n_rows").cast("double"))
          .as("avg_cents"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q260Sql: String =
    // the FULL recompute of base − deletes + inserts (membership
    // collapses to slot <> delete-remainder since inserts re-enter)
    s"""WITH li AS (
       |  SELECT l_returnflag, l_linestatus,
       |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
       |              AS BIGINT) AS cents,
       |         l_orderkey % $IvmAggMod AS slot
       |  FROM lineitem)
       |SELECT l_returnflag, l_linestatus,
       |       CAST(count(*) FILTER (WHERE slot <> $IvmAggDelRem)
       |            AS BIGINT) AS n_rows,
       |       CAST(sum(cents) FILTER (WHERE slot <> $IvmAggDelRem)
       |            AS BIGINT) AS sum_cents,
       |       CAST(count(*) FILTER (WHERE slot = $IvmAggInsRem)
       |            AS BIGINT) AS n_inserted,
       |       CAST(count(*) FILTER (WHERE slot = $IvmAggDelRem)
       |            AS BIGINT) AS n_deleted,
       |       CAST(sum(cents) FILTER (WHERE slot <> $IvmAggDelRem)
       |            AS DOUBLE) /
       |         CAST(count(*) FILTER (WHERE slot <> $IvmAggDelRem)
       |              AS DOUBLE) AS avg_cents
       |FROM li GROUP BY l_returnflag, l_linestatus
       |HAVING count(*) FILTER (WHERE slot <> $IvmAggDelRem) > 0
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def q106IncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val cutoff = "1997-01-01"
    val keys = Seq("l_returnflag", "l_linestatus")
    val base = partialState(li.filter(col("l_shipdate") < lit(cutoff)), keys)
    val delta = partialState(li.filter(col("l_shipdate") >= lit(cutoff)), keys)
    mergeStates(Seq(base, delta), keys)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("s_price").cast("double").as("sum_price"),
        col("n_rows"),
        (col("s_price").cast("double") / col("n_rows")).as("avg_price"),
        col("first_ship"), col("last_ship"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q106Sql: String =
    // the FULL recompute — the incremental merge must match it exactly
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         AS sum_price,
      |       count(*) AS n_rows,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / count(*) AS avg_price,
      |       min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
