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
}
