package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
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
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong)))
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
}
