package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling / split assignment — the train/valid/test and
  * corpus-subsampling stages every LLM data pipeline runs ahead of training
  * (the reference's warehouse feeds exactly such consumers; SURVEY §2.2's
  * row-filter family generalized to probabilistic filters).
  *
  * Everything here is a pure map-side projection + filter:
  *  - NO shuffle, NO RNG state: membership is a deterministic LCG hash of the
  *    row id, so the same row lands in the same split on every run, every
  *    cluster size, and every retry (task re-execution yields identical
  *    output — the property `rand()`-based sampling loses on retries, and a
  *    shuffle-fetch retry at 100 TB WILL re-execute tasks).
  *  - Strata never co-locate: a per-stratum Bernoulli sample needs no
  *    per-group window, so a 90%-English corpus costs the same as a uniform
  *    one (contrast a `row_number` top-k per stratum, which funnels each
  *    stratum through one task).
  *
  * The three LCG multipliers are classic public constants (Knuth's
  * 2654435761, Borland's 22695477, glibc's 1103515245) — one per sampler,
  * because hashes sharing a multiplier are a constant shift apart and
  * would correlate membership when samplers compose.
  */
object Sampling {

  private val Mod = 1000000007L // prime; doc_id * mult stays far below 2^63 (ANSI-safe)

  /** Deterministic uniform hash of a non-negative integral id into [0, Mod). */
  def idHash(id: Column, mult: Long, inc: Long): Column =
    pmod(id * lit(mult) + lit(inc), lit(Mod))

  /** Adds a `split` column: 80/10/10 train/valid/test, keyed only on the id. */
  def assignSplit(df: DataFrame, idCol: String): DataFrame = {
    val h = idHash(col(idCol), 2654435761L, 1013904223L)
    df.withColumn("split",
      when(pmod(h, lit(100)) < 80, lit("train"))
        .when(pmod(h, lit(100)) < 90, lit("valid"))
        .otherwise(lit("test")))
  }

  /** Keeps a deterministic `fracPerMille`/1000 Bernoulli sample, independent
    * of [[assignSplit]]'s hash. Map-side only. */
  def sampleByHash(df: DataFrame, idCol: String, fracPerMille: Int): DataFrame = {
    val h = idHash(col(idCol), 22695477L, 1L)
    df.filter(pmod(h, lit(1000)) < fracPerMille)
  }

  /** q37_sample — 20% deterministic corpus sample, split 80/10/10, audited
    * per (lang, split): doc count + exact char volume. The audit aggregate is
    * what a pipeline operator actually looks at before launching training. */
  def q37Sample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val sampled = sampleByHash(assignSplit(docs, "doc_id"), "doc_id", 200)
    sampled
      .groupBy(col("lang"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"), col("split"))
  }

  /** Per-stratum deterministic Bernoulli rates — the class-rebalancing
    * sampler (downweight the dominant language / source, keep the tail):
    * same map-side LCG membership as [[sampleByHash]], with the keep rate
    * selected per stratum. Still zero shuffle and retry-stable; the rate
    * lookup is a codegen'd CASE chain, so strata never co-locate.
    *
    * The MULTIPLIER (glibc's 1103515245) differs from both other samplers —
    * independence requires it: same-multiplier hashes differing only in
    * the increment are a constant shift apart, so composing them keeps
    * nearly the same rows instead of sampling independently. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val h = idHash(col(idCol), 1103515245L, 12345L)
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille): Column) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(pmod(h, lit(1000)) < rate)
  }

  /** q91_stratified — rebalance the corpus: keep 25% of the dominant
    * English stratum and 90% of every other language, audited per lang.
    * The audit shows the rebalanced histogram a curation pipeline checks
    * before training. */
  def q91Stratified(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    stratifiedSample(docs, "doc_id", "lang", Map("en" -> 250), 900)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"))
  }

  val q91Sql: String =
    """SELECT lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents
      |WHERE (doc_id * 1103515245 + 12345) % 1000000007 % 1000
      |      < CASE WHEN lang = 'en' THEN 250 ELSE 900 END
      |GROUP BY lang ORDER BY lang""".stripMargin

  val q37Sql: String =
    """WITH h AS (
      |  SELECT lang, n_chars, doc_id,
      |         (doc_id * 2654435761 + 1013904223) % 1000000007 AS h1,
      |         (doc_id * 22695477 + 1) % 1000000007 AS h2
      |  FROM documents),
      |s AS (
      |  SELECT lang, n_chars, doc_id,
      |         CASE WHEN h1 % 100 < 80 THEN 'train'
      |              WHEN h1 % 100 < 90 THEN 'valid'
      |              ELSE 'test' END AS split
      |  FROM h WHERE h2 % 1000 < 200)
      |SELECT lang, split,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin
  /** q133_group_split — GROUP-AWARE train/valid/test assignment: the fold
    * is a function of the GROUP key (user), not the row, so every event of
    * a user lands in one fold — the leakage guard row-level splits (q37)
    * cannot give. Splitting rows of correlated groups across train and
    * test leaks the group's signal into evaluation; group-keyed hashing is
    * the standard fix (GroupKFold). Same retry-stable LCG machinery:
    * still a pure map-side projection, no shuffle for the assignment
    * itself. The audit proves disjointness the cheap way — counting each
    * user once per (fold, user) grid row — and sums values decimal-exact.
    */
  def q133GroupSplit(spark: SparkSession, sfDir: String): DataFrame =
    assignSplit(Tables.events(spark, sfDir), "user_id")
      .groupBy(col("split"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("dec_value"))
      .groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("dec_value")).cast("double").as("sum_value"))
      .orderBy(col("split"))

  val q133Sql: String =
    """WITH assigned AS (
      |  SELECT user_id, value,
      |         CASE WHEN ((user_id * 2654435761 + 1013904223)
      |                    % 1000000007) % 100 < 80 THEN 'train'
      |              WHEN ((user_id * 2654435761 + 1013904223)
      |                    % 1000000007) % 100 < 90 THEN 'valid'
      |              ELSE 'test' END AS split
      |  FROM events)
      |SELECT split, count(DISTINCT user_id) AS n_users,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM assigned
      |GROUP BY split
      |ORDER BY split""".stripMargin

  /** Continuous-weight Bernoulli retention: keep a row iff its id hash (per
    * mille) falls below a ROW-LEVEL weight column — importance resampling
    * by a quality score, where [[stratifiedSample]]'s per-stratum CASE
    * rates become an arbitrary expression. Same map-side, retry-stable
    * machinery; MINSTD multiplier 48271, independent of the other three. */
  def weightedSample(df: DataFrame, idCol: String,
      weightPerMille: Column): DataFrame =
    df.filter(pmod(idHash(col(idCol), 48271L, 7L), lit(1000)) < weightPerMille)

  /** q144_weighted_sample — quality-weighted corpus resampling: longer
    * documents are likelier kept (w‰ ramps with n_chars, clamped to
    * [50, 950]), audited per lang as expected-vs-actual retention. The
    * expected kept count is Σw/1000 — exact integer arithmetic — so the
    * audit ratio is one IEEE division and the oracle replays everything. */
  def q144WeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("w_permille",
        least(lit(950L), greatest(lit(50L), (col("n_chars") - 60) * 10)))
    val kept = weightedSample(docs, "doc_id", col("w_permille"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"), sum(col("w_permille")).as("sum_w"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("sum_w"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        (coalesce(col("n_kept"), lit(0L)).cast("double") * 1000.0 /
          col("sum_w").cast("double")).as("kept_vs_expected"))
      .orderBy(col("lang"))
  }

  val q144Sql: String =
    """WITH w AS (
      |  SELECT doc_id, lang, n_chars,
      |         least(950, greatest(50, (n_chars - 60) * 10)) AS w_permille
      |  FROM documents),
      |kept AS (
      |  SELECT lang, count(*) AS n_kept, sum(n_chars) AS kept_chars
      |  FROM w
      |  WHERE (doc_id * 48271 + 7) % 1000000007 % 1000 < w_permille
      |  GROUP BY lang),
      |tot AS (
      |  SELECT lang, count(*) AS n_total, sum(w_permille) AS sum_w
      |  FROM w GROUP BY lang)
      |SELECT t.lang, t.n_total,
      |       coalesce(k.n_kept, 0) AS n_kept,
      |       CAST(t.sum_w AS BIGINT) AS sum_w,
      |       CAST(coalesce(k.kept_chars, 0) AS BIGINT) AS kept_chars,
      |       CAST(coalesce(k.n_kept, 0) AS DOUBLE) * 1000.0
      |         / CAST(t.sum_w AS DOUBLE) AS kept_vs_expected
      |FROM tot t LEFT JOIN kept k ON k.lang = t.lang
      |ORDER BY t.lang""".stripMargin

  // ------------------------------------------------- Neyman allocation

  /** Sampling-budget divisor for q233: K = ⌊total docs / 5⌋ (a 20%
    * budget), derived from the data so the query is scale-invariant. */
  val NeymanBudgetDiv = 5

  /** q233_neyman_alloc — variance-optimal (Neyman) stratified-sample
    * ALLOCATION: given a total budget K, each stratum h gets
    * n_h ∝ N_h·S_h, so high-variance strata are sampled harder — the
    * design step that precedes q91's proportional executor when strata
    * differ in spread (here: document length by source). The arithmetic
    * is engineered exact end-to-end: the population-variance numerator
    * VN_h = N_h·Σx² − (Σx)² is an exact BIGINT, and since
    * S_h = √VN_h / N_h, the Neyman weight N_h·S_h is just √VN_h — ONE
    * correctly-rounded IEEE sqrt (bit-identical in any engine), quantized
    * to 2^20 fixed point for an exact integer weight total. Integer seats
    * are dealt by LARGEST REMAINDER (Hamilton): base_h = ⌊K·w_h / W⌋,
    * and the K − Σbase leftover seats go to the largest K·w_h mod W, ties
    * on source — so Σ n_alloc = K EXACTLY, no float drift can gain or
    * lose a seat.
    *
    * Scale: one map-side-combinable aggregate at stratum cardinality,
    * then arithmetic + one window over that dozens-row frame (the
    * unpartitioned window orders STRATA, never data rows); the result is
    * the sampler's broadcast config. (Uncapped: a stratum with extreme
    * variance could be allocated n_h > N_h; production would clamp and
    * re-deal — the audit columns expose it, the fixture never trips it.) */
  def q233NeymanAlloc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_x"),
        sum(col("n_chars") * col("n_chars")).as("sum_x2"))
      .withColumn("var_num",
        col("n_docs") * col("sum_x2") - col("sum_x") * col("sum_x"))
      .withColumn("wq",
        floor(sqrt(col("var_num").cast("double")) * lit(1L << 20))
          .cast("long"))
    val tot = per.agg(sum(col("wq")).as("w_tot"),
      expr(s"sum(n_docs) div $NeymanBudgetDiv").as("k_budget"))
    val dealt = per.crossJoin(broadcast(tot))
      .withColumn("base", expr("k_budget * wq div w_tot"))
      .withColumn("rem", expr("(k_budget * wq) % w_tot"))
    val leftover = dealt.groupBy()
      .agg((max(col("k_budget")) - sum(col("base"))).as("n_left"))
    dealt.crossJoin(broadcast(leftover))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .select(col("source"), col("n_docs"), col("var_num"), col("wq"),
        col("base"), col("rem"),
        when(col("pos") <= col("n_left"), 1L).otherwise(0L).as("extra"))
      .withColumn("n_alloc", col("base") + col("extra"))
      .withColumn("rate",
        col("n_alloc").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  val q233Sql: String =
    s"""WITH per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS sum_x,
       |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_x2
       |  FROM documents GROUP BY source),
       |w AS (
       |  SELECT *, n_docs * sum_x2 - sum_x * sum_x AS var_num,
       |         CAST(floor(sqrt(CAST(n_docs * sum_x2 - sum_x * sum_x
       |           AS DOUBLE)) * 1048576) AS BIGINT) AS wq
       |  FROM per),
       |tot AS (
       |  SELECT CAST(sum(wq) AS BIGINT) AS w_tot,
       |         CAST(sum(n_docs) // $NeymanBudgetDiv AS BIGINT) AS k_budget
       |  FROM w),
       |dealt AS (
       |  SELECT w.*, t.k_budget,
       |         (t.k_budget * w.wq) // t.w_tot AS base,
       |         (t.k_budget * w.wq) % t.w_tot AS rem
       |  FROM w CROSS JOIN tot t),
       |lo AS (
       |  SELECT CAST(max(k_budget) - sum(base) AS BIGINT) AS n_left
       |  FROM dealt),
       |ranked AS (
       |  SELECT d.*, lo.n_left,
       |         CAST(row_number() OVER (ORDER BY d.rem DESC, d.source)
       |           AS BIGINT) AS pos
       |  FROM dealt d CROSS JOIN lo)
       |SELECT source, n_docs, var_num, wq, base, rem,
       |       CAST(CASE WHEN pos <= n_left THEN 1 ELSE 0 END AS BIGINT)
       |         AS extra,
       |       base + (CASE WHEN pos <= n_left THEN 1 ELSE 0 END)
       |         AS n_alloc,
       |       CAST(base + (CASE WHEN pos <= n_left THEN 1 ELSE 0 END)
       |            AS DOUBLE) / CAST(n_docs AS DOUBLE) AS rate
       |FROM ranked ORDER BY source""".stripMargin
}
