package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Scale utilities: skew mitigation and co-located joins — the two shuffle
  * techniques SURVEY.md's 100 TB contract calls for beyond what AQE does
  * automatically.
  *
  * AQE (on by default) already splits skewed SHUFFLE partitions for joins
  * and adjusts partition counts at runtime; these helpers cover the cases it
  * does not: a single group key so hot that one reducer's hash-map entry
  * becomes the bottleneck (salted two-phase aggregation), and repeated
  * fact-fact joins on a stable key (bucketed tables eliminate the shuffle
  * entirely).
  */
object Scale {

  /** Default rows-per-task for [[hashBuildParallelism]]: 250k rows of a
    * few columns ≈ ~10 MB of hashed payload per task. */
  val HashBuildRowsPerTask = 250000L

  /** Upper clamp for every count-derived partition count
    * ([[hashBuildParallelism]], `Centroids.assignParallelism`). The Long
    * arithmetic on counted work can exceed Int.MaxValue exactly at the
    * 100 TB design point these devices exist for — n ≈ 3.5·10⁹ vectors
    * with k = √n makes n·k/budget ≈ 2.1·10⁹ tasks — and a raw `.toInt`
    * WRAPS (usually negative), which `max(session, _)` then silently
    * swallows back to the session floor: the one-task collapse the
    * counted spread was built to fix, reintroduced at scale with no
    * error. 2²⁰ tasks is beyond any real cluster's useful fan-out (and
    * far under Spark's 2²⁴ sort-shuffle partition-id ceiling); when the
    * clamp binds, per-task work grows with the data again — the right
    * failure mode (bigger tasks and a visible knee, not a silent
    * single-task cliff). */
  val MaxCountedTasks = 1 << 20

  /** Rows-per-task budget for FIXED-NARROW build rows (two longs — a
    * rank or label frame): ~32 B/entry hashed → 2M rows ≈ 64 MB per
    * task. Sizing by the BUILD side with this wider budget matters:
    * sizing q114's pinned edge partitioning by its PROBE side (edges ≈
    * 70× nodes) pushed the partition count past the session floor at
    * the 10× point and cost 2.4× in wave quantization for zero memory
    * benefit — the build was never the risk there until ~10⁸ nodes. */
  val NarrowBuildRowsPerTask = 2000000L

  /** Partition count for a join whose BUILD side grows with the data
    * (a SHUFFLE_HASH hint, or an explicit co-partitioning feeding one).
    * A hash join's build map must FIT in task memory — unlike sort-merge
    * it cannot spill — so with the session's fixed shuffle partition
    * count, per-task build size is rows/partitions and grows linearly
    * with the data until it outgrows the execution pool (measured: the
    * triangle closing join OOMed at the 24M-edge sf2 point under
    * local[32]). AQE cannot save this plan shape: it only COALESCES
    * partitions (making builds bigger) and its skew split does not apply
    * to the build side. The fix is to derive parallelism from the
    * materialized row count the caller already has (iterative ops count
    * their checkpointed frames anyway): ~[[HashBuildRowsPerTask]] rows
    * per task keeps the build a few MB at ANY scale — 10^10 rows → 40k
    * tasks, a normal cluster fan-out. Never below the session's shuffle
    * parallelism, so small data keeps its full CPU fan-out. */
  def hashBuildParallelism(spark: SparkSession, rows: Long,
      rowsPerTask: Long = HashBuildRowsPerTask): Int =
    math.max(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      // clamp in Long BEFORE the Int conversion: rows/rowsPerTask
      // exceeds Int.MaxValue past ~5·10¹⁴ rows and a raw toInt wraps
      // negative — see [[MaxCountedTasks]]
      math.min(rows / rowsPerTask + 1, MaxCountedTasks.toLong).toInt)

  /** Two-phase salted aggregation for skewed group keys: phase 1 aggregates
    * on (key, salt) — spreading a hot key over `salts` reducers — phase 2
    * merges the partials per key. `partials` maps each input-measure column
    * to its partial aggregate; `merges` re-aggregates the partial columns.
    * Exactness requires algebraic aggregates (sum/count/min/max — the
    * decimal-sum pattern composes fine).
    *
    * saltedAggregate(df, Seq("k"), 32,
    *   Seq(sum($"x").as("sx"), count(lit(1)).as("n")),
    *   Seq(sum($"sx").as("sum_x"), sum($"n").as("n")))
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[Column], merges: Seq[Column],
      saltCols: Seq[String] = Nil): DataFrame = {
    // The salt must be a pure function of row CONTENT: partition-id or
    // monotonic ids change when a shuffle-fetch failure re-executes a task,
    // which could route already-consumed rows to a different salt — a
    // double-count/loss hazard. Content-hashed salts are retry-stable.
    // Identical rows share a salt, which narrows the spread for EXACT
    // duplicates — harmless here because the algebraic-aggregate contract
    // means map-side partial combine collapses duplicates per partition
    // before the shuffle (a reducer sees ≤ #partitions rows per salt
    // group). If a workload needs salting for non-combinable buffers over
    // duplicate-heavy data, dedup first (q36) — a deterministic salt
    // cannot split byte-identical rows.
    //
    // `saltCols` narrows which columns feed the hash. The default (all
    // columns) is always correct but forces the scan to read EVERY column —
    // on a wide fact table that defeats column pruning just to pick 1 of
    // `salts` buckets. Callers should pass the group key plus one cheap
    // high-cardinality discriminator already in the projection (e.g.
    // key + order id): same retry stability, scan stays pruned to the
    // columns the aggregate needs anyway.
    val hashCols = if (saltCols.nonEmpty) saltCols else df.columns.toSeq
    val salted = df.withColumn("__salt",
      pmod(xxhash64(hashCols.map(col): _*), lit(salts.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  // Bucketed co-located joins live in [[graft.sources.Bucketing]] — the
  // "pre-shuffle once, join many times" pattern is a storage-layout
  // concern (it needs a catalog-registered external path), exercised
  // end-to-end by q18_join_bucketed + the PlanSpec exchange-free assertion.

  /** Salted skew equi-join: the fact side gets a content-derived salt
    * (retry-stable, like [[saltedAggregate]] — an unstable salt changes the
    * row→reducer mapping when a shuffle-fetch failure re-executes a map
    * task, the classic nondeterministic-repartition loss/duplication
    * hazard); the dimension side is exploded ×`salts` so every (key, salt)
    * bucket finds its match. The fact shuffle then spreads each hot key
    * over `salts` partitions instead of funneling it into one.
    *
    * Caveat the aggregate form doesn't share: there is no map-side combine
    * in a join, so BYTE-IDENTICAL duplicate fact rows (same content ⇒ same
    * salt) still land on one reducer. If a key's skew comes from repeated
    * identical rows rather than many distinct ones, dedup first (q36) or
    * carry a stable discriminator column into the hash — a deterministic
    * salt cannot split byte-identical rows.
    *
    * When to reach for it vs trusting AQE's skew-join (measured in
    * SKEW_AQE_NOTE_r7.md, pinned in ScaleSpec): AQE CAN split a skewed
    * reduce partition (duplicating the matching dim rows), but only when
    * all of (a) the key has an OUTLIER hot value — skew is defined
    * relative to the median partition, so a low-cardinality key whose
    * few partitions are all equally huge never qualifies; (b) the hot
    * key's rows arrive through MANY map tasks — splitting happens at
    * mapper boundaries, so a layout that concentrates the key per task
    * (clustered/sorted input, one row group, a coalesced upstream)
    * silently defeats it; and (c) both join children are bare
    * Sort(shuffle) — a dim that passes through distinct()/an aggregate
    * disqualifies the join from the rule entirely. Salt when any of the
    * three fails; it is layout- and shape-independent. Replication cost
    * is |dim| × salts rows — keep `salts` ~ (hot-key rows / target
    * partition rows), not in the hundreds. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    // saltCols: same narrowing contract as [[saltedAggregate]] — default
    // all-columns is correct but reads the full row width; pass key + a
    // high-cardinality column from the join's own projection to keep the
    // scan pruned.
    val hashCols = if (saltCols.nonEmpty) saltCols else fact.columns.toSeq
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(hashCols.map(col): _*), lit(salts.toLong)))
    val expDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(expDim, keys :+ "__salt").drop("__salt")
  }

  /** q48_salted — the salted two-phase aggregate against the WORST group-key
    * skew lineitem offers: 3 distinct return flags, so an unsalted plan
    * funnels the whole table into 3 reducers no matter how many executors
    * exist. Salting spreads each flag over 32 (key, salt) partials first.
    *
    * Exactness across the extra phase: partials stay DECIMAL (never cast to
    * double between phases — decimal addition is associative, double
    * addition is not), so the merged result is bit-identical to the plain
    * single-phase aggregate, which is exactly what the oracle runs.
    *
    * The salt hashes only (l_returnflag, l_extendedprice) — the key plus a
    * high-cardinality measure the aggregate reads anyway — so the parquet
    * scan prunes to exactly the 4 needed columns instead of all 16
    * (a full-width row hash would force the scan to read the whole table
    * just to pick 1 of 32 buckets). Still content-derived ⇒ retry-stable. */
  def q48Salted(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    saltedAggregate(li, Seq("l_returnflag"), salts = 32,
      saltCols = Seq("l_returnflag", "l_extendedprice"),
      partials = Seq(
        sum(col("l_quantity").cast(DecimalType(18, 1))).as("pq"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("pr"),
        count(lit(1)).as("pn")),
      merges = Seq(
        sum(col("pq")).cast("double").as("sum_qty"),
        sum(col("pr")).cast("double").as("revenue"),
        sum(col("pn")).as("line_count")))
      .orderBy(col("l_returnflag"))
  }

  val q48Sql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,1))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS line_count
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q84_salted_join — [[saltedJoin]] against maximal key skew: lineitem
    * joined to a 3-row derived flag dimension on l_returnflag, so an
    * unsalted shuffle join lands the whole table on 3 reducers. The merge
    * hint forces the shuffle path the technique exists for (at fixture
    * scale Spark would otherwise just broadcast the 3 rows — the 100 TB
    * case this models is a dimension past the broadcast threshold). The
    * post-join aggregate proves every fact row matched exactly once with
    * the right label: any join loss, duplication, or mislabel shifts the
    * exact decimal sums/counts the oracle's plain join computes. */
  def q84SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val dim = li.select(col("l_returnflag")).distinct()
      .select(col("l_returnflag"),
        concat(lit("flag_"), col("l_returnflag")).as("flag_label"))
    saltedJoin(li, dim.hint("merge"), Seq("l_returnflag"), salts = 16,
      saltCols = Seq("l_returnflag", "l_extendedprice"))
      .groupBy(col("flag_label"))
      .agg(decSum(col("l_extendedprice"), 2).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("flag_label"))
  }

  val q84Sql: String =
    """WITH dim AS (
      |  SELECT DISTINCT l_returnflag, 'flag_' || l_returnflag AS flag_label
      |  FROM lineitem)
      |SELECT flag_label,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       count(*) AS line_count
      |FROM lineitem JOIN dim USING (l_returnflag)
      |GROUP BY flag_label ORDER BY flag_label""".stripMargin

  /** The lineitem key columns q111 diagnoses (cast to string so one melted
    * frame covers them all). */
  private def skewKeys: Seq[String] =
    Seq("l_orderkey", "l_partkey", "l_returnflag", "l_suppkey")

  /** q111_skew_report — the diagnostic that decides WHEN to reach for the
    * salting utilities above: per candidate join/group key, its cardinality,
    * the hottest value's row count and share, and the skew factor
    * (hottest-key count over the mean per-key count — 1.0 is uniform; a
    * shuffle on a key with factor ≫ 1 funnels that key's rows into one
    * reducer, the q48/q84 problem).
    *
    * Scale: one scan melted to (key_name, key_val) map-side; the first
    * aggregate shuffles at Σ per-key cardinality with map-side combine, the
    * second at |keys| rows. Spark 4's WindowGroupLimit bounds the
    * hottest-value pick. */
  def q111SkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val melted = Tables.lineitem(spark, sfDir)
      .select(explode(array(skewKeys.map { k =>
        struct(lit(k).as("key_name"), col(k).cast("string").as("key_val"))
      }: _*)).as("kv"))
      .select(col("kv.key_name").as("key_name"), col("kv.key_val").as("key_val"))
    val perVal = melted.groupBy(col("key_name"), col("key_val"))
      .agg(count(lit(1)).as("cnt"))
    val hottest = perVal
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key_name"))
          .orderBy(desc("cnt"), col("key_val"))))
      .filter(col("rn") === 1)
      .select(col("key_name"), col("key_val").as("top_key"),
        col("cnt").as("top_count"))
    perVal.groupBy(col("key_name"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      .join(hottest, "key_name")
      .select(col("key_name"), col("n_rows"), col("n_distinct"),
        col("top_key"), col("top_count"),
        (col("top_count").cast("double") / col("n_rows")).as("top_share"),
        (col("top_count").cast("double") * col("n_distinct") / col("n_rows"))
          .as("skew_factor"))
      .orderBy(col("key_name"))
  }

  val q111Sql: String = {
    val arms = Seq("l_orderkey", "l_partkey", "l_returnflag", "l_suppkey")
      .map { k =>
        s"SELECT '$k' AS key_name, CAST($k AS VARCHAR) AS key_val FROM lineitem"
      }.mkString("\n  UNION ALL ")
    s"""WITH melted AS (
       |  $arms),
       |per_val AS (
       |  SELECT key_name, key_val, count(*) AS cnt
       |  FROM melted GROUP BY key_name, key_val),
       |hottest AS (
       |  SELECT key_name, key_val AS top_key, cnt AS top_count
       |  FROM (SELECT key_name, key_val, cnt,
       |               row_number() OVER (PARTITION BY key_name
       |                 ORDER BY cnt DESC, key_val) AS rn
       |        FROM per_val)
       |  WHERE rn = 1),
       |stats AS (
       |  -- CAST: DuckDB sums BIGINT into HUGEINT; Spark stays BIGINT
       |  SELECT key_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
       |         count(*) AS n_distinct
       |  FROM per_val GROUP BY key_name)
       |SELECT s.key_name, s.n_rows, s.n_distinct, h.top_key, h.top_count,
       |       CAST(h.top_count AS DOUBLE) / s.n_rows AS top_share,
       |       CAST(h.top_count AS DOUBLE) * s.n_distinct / s.n_rows
       |         AS skew_factor
       |FROM stats s JOIN hottest h ON s.key_name = h.key_name
       |ORDER BY s.key_name""".stripMargin
  }

  /** q198_join_size — exact join-cardinality prediction from per-key
    * histograms: |A ⋈_k B| = Σ_k n_A(k)·n_B(k). The identity every
    * cost-based optimizer approximates with sampled histograms, computed
    * here exactly for the events↔orders shared-id join and verified
    * in-row (predicted = Σ products; the top-10 contributing keys show
    * WHERE the fan-out concentrates — the pre-join diagnostic that says
    * "this key alone produces 4M output rows, salt it"). All-integer.
    *
    * Scale: two map-side-combinable key-count aggregates (never the
    * joined fan-out itself — the whole point is predicting it WITHOUT
    * materializing it), one key-cardinality equi-join between the
    * histograms, TakeOrdered(10) + a one-row total. */
  def q198JoinSize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ha = Tables.events(spark, sfDir)
      .groupBy(col("user_id").as("key")).agg(count(lit(1)).as("n_a"))
    val hb = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n_b"))
    val contrib = ha.join(hb, "key")
      .select(col("key"), col("n_a"), col("n_b"),
        (col("n_a") * col("n_b")).as("out_rows"))
      .localCheckpoint() // matched-key cardinality; feeds total + top-10
    val tot = contrib.agg(sum(col("out_rows")).as("predicted_total"),
      count(lit(1)).as("n_matched_keys"))
    contrib
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("out_rows"), col("key"))))
      .filter(col("rank") <= 10)
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("key"), col("n_a"), col("n_b"),
        col("out_rows"), col("n_matched_keys"), col("predicted_total"),
        (col("out_rows").cast("double") /
          col("predicted_total").cast("double")).as("share_of_output"))
      .orderBy(col("rank"))
  }

  val q198Sql: String =
    """WITH ha AS (
      |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_a
      |  FROM events GROUP BY 1),
      |hb AS (
      |  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_b
      |  FROM orders GROUP BY 1),
      |contrib AS (
      |  SELECT ha.key, ha.n_a, hb.n_b, ha.n_a * hb.n_b AS out_rows
      |  FROM ha JOIN hb USING (key)),
      |tot AS (
      |  SELECT CAST(sum(out_rows) AS BIGINT) AS predicted_total,
      |         CAST(count(*) AS BIGINT) AS n_matched_keys
      |  FROM contrib),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY out_rows DESC, key) AS rank
      |  FROM contrib)
      |SELECT r.rank, r.key, r.n_a, r.n_b, r.out_rows,
      |       t.n_matched_keys, t.predicted_total,
      |       CAST(r.out_rows AS DOUBLE) / CAST(t.predicted_total AS DOUBLE)
      |         AS share_of_output
      |FROM ranked r CROSS JOIN tot t
      |WHERE r.rank <= 10 ORDER BY r.rank""".stripMargin

  /** The q111 skew-report shape as decision inputs for [[skewAwareJoin]]:
    * key cardinality, the hottest value's share, and how many MAP tasks
    * the hottest key's rows arrive through (AQE can only split a skewed
    * reduce partition at mapper boundaries). */
  final case class SkewStats(nRows: Long, nDistinct: Long,
      topShare: Double, topKeyMapperSpread: Int) {
    /** q111's skew factor: hottest-key count over the mean per-key
      * count. ≈1 means uniform; AQE's OptimizeSkewedJoin needs an
      * OUTLIER (skew is defined against the MEDIAN partition). */
    def skewFactor: Double = topShare * nDistinct
  }

  sealed trait SkewStrategy
  /** Manual two-phase salt ([[saltedJoin]]). */
  case object Salt extends SkewStrategy
  /** Plain shuffle join; AQE's runtime skew split handles the outlier. */
  case object TrustAqe extends SkewStrategy

  /** An outlier below this skew factor is no outlier: the hot partition
    * is within ~2× the mean, so the median-relative trigger of
    * `OptimizeSkewedJoin` never fires — and doesn't need to. */
  val OutlierSkewFactor = 2.0

  /** SKEW_AQE_NOTE_r7's measured decision rule, as code. Salt when ANY
    * of AQE's three documented preconditions fails (each is a unit-tested
    * case in ScaleSpec):
    *
    *  1. the dim side passes through an aggregate/distinct — the skew
    *     rule pattern-matches BOTH children as bare Sort(shuffle); a
    *     HashAggregate between shuffle and sort disqualifies the join
    *     silently (note finding 3);
    *  2. uniform low-cardinality key — skew is defined relative to the
    *     MEDIAN partition, so N equally-huge partitions have no outlier
    *     and AQE does nothing while most reducers idle (finding 1:
    *     q84's 3-flag shape, "number of skewed partitions: 0");
    *  3. the hot key's rows arrive through ONE map task — splits happen
    *     at mapper boundaries, so clustered/sorted layouts, one huge
    *     row group, or a coalesced upstream defeat the split (finding
    *     2: `createSkewPartitionSpecs` returned None until the input
    *     had real mapper spread).
    *
    * Otherwise — genuine outlier key, multi-mapper spread, bare shuffle
    * children — trust AQE: it splits with the REAL runtime sizes and
    * costs no dim replication (salting costs |dim|×salts). */
  def chooseSkewStrategy(stats: SkewStats, dimAggregated: Boolean,
      partitions: Int = 32): SkewStrategy = {
    val lowCardinality = stats.nDistinct < partitions
    val noOutlier = stats.skewFactor < OutlierSkewFactor
    val mapperConcentrated = stats.topKeyMapperSpread <= 1
    if (dimAggregated || (lowCardinality && noOutlier) || mapperConcentrated)
      Salt
    else TrustAqe
  }

  /** True when `dim`'s plan contains an aggregate (incl. `distinct()`)
    * — the shape that silently disqualifies AQE's skew rule. Checked on
    * the OPTIMIZED plan, where Distinct has been rewritten to Aggregate. */
  def dimAggregated(dim: DataFrame): Boolean =
    dim.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined

  /** Skew-aware equi-join: consult the q111-shaped `stats` (and the dim
    * plan shape) and pick [[saltedJoin]] or a plain join that AQE's
    * runtime skew split will handle. The demo/manual form stays q84;
    * this is the policy a pipeline calls when the key profile comes from
    * a prior q111 run rather than a human. */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      stats: SkewStats, salts: Int = 16, saltCols: Seq[String] = Nil,
      partitions: Int = 32): DataFrame =
    chooseSkewStrategy(stats, dimAggregated(dim), partitions) match {
      case Salt     => saltedJoin(fact, dim, keys, salts, saltCols)
      case TrustAqe => fact.join(dim, keys)
    }

  /** Distributed exact global rank (0-based, dense input order) over a total
    * order — the scalable replacement for a global-window `row_number()`,
    * which Spark executes in ONE partition. Three phases, all distributed:
    * range-partition + sort locally on `order`; per-partition row_number
    * (windows partitioned by `spark_partition_id` — parallel); then add each
    * partition's start offset, computed from the tiny per-partition count
    * frame (≤ #partitions rows — its single-partition cumulative window is
    * over that frame, not the data). The rank values are independent of
    * where the sampled range boundaries fall: ranges are ordered and
    * contiguous, and offsets are derived from actual partition counts, so
    * the result is deterministic even though the partitioning isn't.
    *
    * `order` must be a provably total order (include a unique tiebreaker) or
    * ranks are nondeterministic — same contract as the oracle sort. */
  def globalRank(df: DataFrame, order: Seq[Column],
      partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Checkpoints.CutOps
    // The CUT below is load-bearing for CORRECTNESS, not a cost tweak:
    // the sorted frame feeds two consumers (the per-partition offset
    // aggregate and the final ranked join). RangePartitioner SAMPLES its
    // child with an RDD-id-derived seed, so if the planner fails to
    // reuse the exchange the two consumers see DIFFERENT partition
    // boundaries — offsets computed under one partitioning applied to
    // pids of another, silently shifting every rank near a boundary
    // (observed live at sf0.01 before the cut: q179's decile-1 count
    // moved by 2 between runs). Materializing once pins one boundary
    // set for both reads; cost is one row-size write of the frame, the
    // same class as every iterative cut.
    val sorted = df.repartitionByRange(partitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .cutLineage()
    val offsets = sorted.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    val within = Window.partitionBy(col("_pid")).orderBy(order: _*)
    sorted.withColumn("_rn", row_number().over(within).cast("long"))
      .join(broadcast(offsets), "_pid")
      .withColumn("rank_idx", col("_offset") + col("_rn") - 1L)
      .drop("_pid", "_rn", "_offset")
  }

  /** Distributed exact running (prefix) SUM over a total order — the
    * scalable replacement for `sum(x).over(Window.orderBy(...))`, which
    * Spark executes by routing the WHOLE frame through one partition
    * (`Exchange SinglePartition`). Same three-phase shape as
    * [[globalRank]]: range-partition + local sort on `order`; local
    * running sums per partition (windows partitioned by
    * `spark_partition_id` — parallel); add each partition's start offset
    * from the ≤ #partitions-row per-partition total frame. Exact for
    * associative sums (long / decimal — NOT double, where regrouping
    * changes the rounding); each `(in, out)` pair in `values` adds a
    * running-sum column `out` of input column `in`.
    *
    * `order` must be a total order for per-row determinism; a non-total
    * order still yields the same MULTISET of (row, cum) pairs per equal-
    * key run boundary it would under any stable global sort only if ties
    * carry equal values — pass a unique tiebreaker, same contract as
    * [[globalRank]] and the oracle sort. */
  def globalCumSum(df: DataFrame, order: Seq[Column],
      values: Seq[(String, String)], partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Checkpoints.CutOps
    // Same load-bearing cut as [[globalRank]]: two consumers of a
    // sampled range partitioning must read ONE materialized boundary
    // set, or per-partition offsets can disagree with the pids they
    // are joined back onto.
    val sorted = df.repartitionByRange(partitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .cutLineage()
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-partition totals: ≤ #partitions rows — ITS single-partition
    // window is over that bounded frame, never the data
    val totals = sorted.groupBy(col("_pid"))
      .agg(values.map { case (in, _) => sum(col(in)).as(s"_t_$in") }.head,
        values.drop(1).map { case (in, _) => sum(col(in)).as(s"_t_$in") }: _*)
    val offsets = totals
      .select(col("_pid") +: values.map { case (in, out) =>
        val dt = totals.schema(s"_t_$in").dataType
        coalesce(sum(col(s"_t_$in")).over(wOff), lit(0).cast(dt))
          .as(s"_off_$out") }: _*)
    val within = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = values.foldLeft(sorted) { case (d, (in, out)) =>
      d.withColumn(s"_loc_$out", sum(col(in)).over(within))
    }
    val summed = withLocal.join(broadcast(offsets), "_pid")
    values.foldLeft(summed) { case (d, (_, out)) =>
      d.withColumn(out, col(s"_off_$out") + col(s"_loc_$out"))
    }.drop("_pid" +: values.flatMap { case (_, out) =>
      Seq(s"_off_$out", s"_loc_$out") }: _*)
  }
}
