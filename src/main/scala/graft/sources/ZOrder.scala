package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton-curve) clustering — the multi-dimensional file-layout
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the
  * bits of two keys gives a 1-D sort order under which any contiguous
  * z-range covers a bounded rectangle of the 2-D key space. Writing files
  * sorted by z therefore gives every file a TIGHT parquet min/max footer on
  * BOTH columns, so scans filtering on either key (or both) prune files —
  * a single-column sort only prunes its own column.
  *
  * At 100 TB: `df.repartitionByRange(N, z).sortWithinPartitions(z)
  * .write.parquet(...)` — one range shuffle at write time buys 2-D file
  * pruning on every subsequent scan. The interleave itself is pure
  * codegen'd bit arithmetic (shift/and/or), map-side, zero cost at scan.
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Plain shift/mask/or expressions — whole-stage
    * codegen fuses the 2×`bits` terms into straight-line JVM code. */
  def mortonInterleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** q86_zorder — the locality property made checkable: z-code
    * (l_partkey, l_suppkey) folded to 8 bits each (the fixture keys are
    * dense in a small range; production would use the raw key width),
    * bucket by the top 8 z-bits, and report each bucket's row count and
    * per-key min/max. Z-ordering guarantees every bucket's keys lie inside
    * one 16×16 rectangle (top 4 bits of each key fixed) — visible directly
    * in the min/max columns, and asserted as an invariant in SourcesSpec.
    * All-integer output, so the oracle hash-matches exactly. */
  def q86Zorder(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val a = pmod(col("l_partkey"), lit(256L))
    val b = pmod(col("l_suppkey"), lit(256L))
    li.select(a.as("pk"), b.as("sk"),
        mortonInterleave(a, b, 8).as("z"))
      .groupBy(shiftright(col("z"), 8).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        min(col("sk")).as("min_sk"), max(col("sk")).as("max_sk"))
      .orderBy(col("z_bucket"))
  }

  /** The oracle interleaves with the same 16+16 shift/mask terms, generated
    * so the constants can't drift between engines. */
  val q86Sql: String = {
    val terms = (0 until 8).flatMap { i =>
      Seq(s"(((pk >> $i) & 1) << ${2 * i})",
        s"(((sk >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
    s"""WITH keyed AS (
       |  SELECT l_partkey % 256 AS pk, l_suppkey % 256 AS sk
       |  FROM lineitem),
       |coded AS (SELECT pk, sk, ($terms) AS z FROM keyed)
       |SELECT z >> 8 AS z_bucket, count(*) AS n_rows,
       |       min(pk) AS min_pk, max(pk) AS max_pk,
       |       min(sk) AS min_sk, max(sk) AS max_sk
       |FROM coded GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q190_zonemap — zone-map (file-footer min/max) construction and a
    * pruning audit against two predicates: the query-planner view of the
    * q86 story. Zones are ship-date months (the natural ingest
    * partitioning); each zone's footer tracks row count and min/max of
    * l_extendedprice (in exact cents) and l_orderkey. The audit reports,
    * per zone, whether a DATE-range predicate and a PRICE-range predicate
    * can skip it — date prunes (zones are date-aligned), price does not
    * (price is uncorrelated with ingest time, every zone's span covers
    * the probe) — plus each zone's share of the global price span, the
    * clustering-quality number that tells an optimizer whether re-sorting
    * (q86's z-order) would pay. All-integer output.
    *
    * Scale: ONE map-side-combinable aggregate over the fact scan builds
    * the zone stats (zone-cardinality shuffle); the audit is arithmetic
    * over the tiny zone frame against broadcast global extremes. */
  def q190Zonemap(spark: SparkSession, sfDir: String): DataFrame = {
    val zones = Tables.lineitem(spark, sfDir)
      .select(date_trunc("month", col("l_shipdate")).as("zone"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long")
          .as("cents"),
        col("l_orderkey"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
      .localCheckpoint() // zone-cardinality; feeds global extremes + audit
    val global = zones.agg(min(col("min_cents")).as("g_min"),
      max(col("max_cents")).as("g_max"))
    // audit predicates (fixture-meaningful literals): Q1 1997 shipments;
    // price in [30_000.00, 40_000.00]
    val dLo = lit("1997-01-01").cast("timestamp")
    val dHi = lit("1997-04-01").cast("timestamp")
    zones.crossJoin(broadcast(global))
      .select(col("zone"), col("n_rows"), col("min_cents"),
        col("max_cents"), col("min_key"), col("max_key"),
        (col("zone") < dLo || col("zone") >= dHi).as("skip_date"),
        (col("max_cents") < 3000000L || col("min_cents") > 4000000L)
          .as("skip_price"),
        ((col("max_cents") - col("min_cents")).cast("double") /
          (col("g_max") - col("g_min")).cast("double"))
          .as("span_share"))
      .orderBy(col("zone"))
  }

  val q190Sql: String =
    """WITH zones AS (
      |  SELECT date_trunc('month', l_shipdate) AS zone,
      |         CAST(count(*) AS BIGINT) AS n_rows,
      |         min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS min_cents,
      |         max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS max_cents,
      |         min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
      |  FROM lineitem GROUP BY 1),
      |g AS (SELECT min(min_cents) AS g_min, max(max_cents) AS g_max
      |      FROM zones)
      |SELECT zone, n_rows, min_cents, max_cents, min_key, max_key,
      |       zone < TIMESTAMP '1997-01-01'
      |         OR zone >= TIMESTAMP '1997-04-01' AS skip_date,
      |       max_cents < 3000000 OR min_cents > 4000000 AS skip_price,
      |       CAST(max_cents - min_cents AS DOUBLE)
      |         / CAST(g_max - g_min AS DOUBLE) AS span_share
      |FROM zones CROSS JOIN g ORDER BY zone""".stripMargin
}
