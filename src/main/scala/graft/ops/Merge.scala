package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Upsert / MERGE semantics (SCD type 1) as a full-outer coalesce — the
  * warehouse-maintenance operation behind the reference's idempotent append
  * contract (`/root/reference/data/emr/etl.py:41-55` dedupes on re-run; a
  * MERGE is the general form when rows can also CHANGE, not just repeat).
  *
  * Scale: one full-outer shuffle join on the merge key — the same plan a
  * Delta/Iceberg MERGE lowers to when every file matches. Both sides
  * partition on the key, so AQE's skew split handles a hot key; the action
  * classification and audit aggregate are map-side on the join output.
  */
object Merge {

  /** Apply `updates` to `base` on `key`: update on match (a matched NULL
    * payload IS written — MERGE semantics, not coalesce), insert when the
    * key exists only in `updates`, keep otherwise. A NULL-keyed base row
    * never matches and is kept. `action` records the per-row outcome. */
  def upsert(base: DataFrame, updates: DataFrame, key: String,
      payload: String): DataFrame = {
    val b = base.as("b")
    val u = updates.as("u")
    val matched = col(s"u.$key").isNotNull
    b.join(u, col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(
        coalesce(col(s"b.$key"), col(s"u.$key")).as(key),
        when(matched, col(s"u.$payload"))
          .otherwise(col(s"b.$payload")).as(payload),
        when(matched && col(s"b.$key").isNotNull, lit("updated"))
          .when(matched, lit("inserted"))
          .otherwise(lit("kept")).as("action"))
  }

  /** q38_upsert — merge a synthesized change set into orders (repriced rows
    * on keys ≡3 mod 10; brand-new keys from ≡7 mod 100 shifted past the key
    * space) and audit the outcome per action. */
  def q38Upsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val upd = base.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 100.0).as("o_totalprice"))
    val ins = base.filter(col("o_orderkey") % 100 === 7)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        (col("o_totalprice") * 0.5).as("o_totalprice"))
    upsert(base, upd.unionByName(ins), "o_orderkey", "o_totalprice")
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_rows"),
        // scale 3, not 2: inserted prices are halved, so they carry a
        // half-cent digit; rounding that digit away sits ON the rounding
        // boundary where engines disagree
        decSum(col("o_totalprice"), 3).as("sum_price"))
      .orderBy(col("action"))
  }

  /** q39_schema_evo — by-name union across two feed vintages with different
    * column sets (`unionByName(allowMissingColumns)`): the schema-evolution
    * splice every long-lived ingest eventually needs when a field is added
    * upstream. Missing columns null-fill; the audit groups on the evolved
    * column with an explicit UNKNOWN bucket for pre-evolution rows.
    * Map-side concatenation — a union shuffles nothing. */
  def q39SchemaEvo(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val oldFeed = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val newFeed = orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    oldFeed.unionByName(newFeed, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("UNKNOWN")).as("priority"))
      .agg(count(lit(1)).as("n_rows"),
        decSum(col("o_totalprice"), 2).as("sum_price"))
      .orderBy(col("priority"))
  }

  val q39Sql: String =
    """WITH old_feed AS (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
      |new_feed AS (
      |  SELECT o_orderkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 1),
      |u AS (SELECT * FROM old_feed UNION ALL BY NAME SELECT * FROM new_feed)
      |SELECT coalesce(o_orderpriority, 'UNKNOWN') AS priority,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  /** SCD type 2 dimension construction from a change log: collapse
    * consecutive no-op changes (gaps-and-islands), then derive each
    * version's validity interval [effective_from, effective_to) with a
    * lead, a version ordinal, and the is_current flag. The companion to
    * [[upsert]]: SCD1 overwrites history, SCD2 keeps it queryable — the
    * as-of join (q16) is the read side of this table shape.
    *
    * Scale: one shuffle on the dimension key; both windows and the
    * change-collapse filter run inside that partitioning (Catalyst plans a
    * single Exchange for all three), and per-key state is the key's own
    * history — no whole-table window, no skew beyond the hottest entity's
    * changelog. */
  def scd2(changes: DataFrame, key: String, at: String, tieBreak: String,
      attr: String): DataFrame = {
    // one window SPEC serves both passes — specs are frame-independent
    // descriptors; the leads still skip dropped no-ops because the second
    // pass evaluates over the collapsed frame
    val w = Window.partitionBy(key).orderBy(col(at), col(tieBreak))
    val collapsed = changes
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
    collapsed.select(
      col(key), col(attr), col(at).as("effective_from"),
      lead(col(at), 1).over(w).as("effective_to"),
      row_number().over(w).as("version"),
      lead(col(at), 1).over(w).isNull.as("is_current"))
  }

  /** q85_scd2 — [[scd2]] over orders read as a changelog of each customer's
    * order priority: (custkey, orderdate, priority) ordered by date with
    * the orderkey as the same-date tie-break. Output is the versioned
    * dimension a warehouse would serve point-in-time lookups from. */
  def q85Scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val log = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("custkey"), col("o_orderdate").as("chg_at"),
      col("o_orderkey").as("ok"), col("o_orderpriority").as("priority"))
    scd2(log, "custkey", "chg_at", "ok", "priority")
      .orderBy(col("custkey"), col("version"))
  }

  val q85Sql: String =
    """WITH log AS (
      |  SELECT o_custkey AS custkey, o_orderdate AS chg_at, o_orderkey AS ok,
      |         o_orderpriority AS priority,
      |         lag(o_orderpriority) OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |           AS prev
      |  FROM orders),
      |chg AS (SELECT * FROM log WHERE prev IS NULL OR prev <> priority)
      |SELECT custkey, priority, chg_at AS effective_from,
      |       lead(chg_at) OVER w AS effective_to,
      |       CAST(row_number() OVER w AS INT) AS version,
      |       (lead(chg_at) OVER w IS NULL) AS is_current
      |FROM chg
      |WINDOW w AS (PARTITION BY custkey ORDER BY chg_at, ok)
      |ORDER BY custkey, version""".stripMargin

  val q38Sql: String =
    """WITH upd AS (
      |  SELECT o_orderkey, o_totalprice + 100.0 AS p
      |  FROM orders WHERE o_orderkey % 10 = 3),
      |ins AS (
      |  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice * 0.5 AS p
      |  FROM orders WHERE o_orderkey % 100 = 7),
      |u AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |m AS (
      |  SELECT coalesce(u.p, b.o_totalprice) AS price,
      |         CASE WHEN b.o_orderkey IS NOT NULL AND u.o_orderkey IS NOT NULL
      |                THEN 'updated'
      |              WHEN b.o_orderkey IS NULL THEN 'inserted'
      |              ELSE 'kept' END AS action
      |  FROM orders b FULL OUTER JOIN u ON b.o_orderkey = u.o_orderkey)
      |SELECT action, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(price AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
      |FROM m GROUP BY action ORDER BY action""".stripMargin
}
