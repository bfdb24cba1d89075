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
  /** q130_pit_join — point-in-time (AS OF) join against the versioned
    * dimension q85 builds: each lineitem resolves its customer's priority
    * version VALID AT ship time (`from ≤ ship < to`, open-ended current
    * version). This is the lookup SCD2 exists to serve, and the scalable
    * form is an equi-join on the dimension key with the validity range as
    * residual — per-key version counts are small, so the residual scans a
    * handful of rows per probe, never a cross product. Distinct from q16's
    * as-of join (nearest earlier EVENT); this matches an INTERVAL.
    */
  def q130PitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2(
      Tables.orders(spark, sfDir).select(
        col("o_custkey").as("custkey"), col("o_orderdate").as("chg_at"),
        col("o_orderkey").as("ok"), col("o_orderpriority").as("priority")),
      "custkey", "chg_at", "ok", "priority")
    val facts = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_shipdate"))
    // LEFT join with the validity range in the ON clause: a fact that
    // predates its key's first version (the fixture's ship dates are not
    // ordered against order dates) must surface as an explicit
    // pre-history bucket, not silently vanish — the classic PIT-join
    // trap. For an outer join the range predicate MUST live in the join
    // condition; as a post-filter it would turn the join inner again.
    facts.join(dim,
        facts("custkey") === dim("custkey") &&
          col("l_shipdate") >= col("effective_from") &&
          (col("effective_to").isNull ||
            col("l_shipdate") < col("effective_to")),
        "left")
      .groupBy(coalesce(col("priority"), lit("(pre-history)"))
        .as("priority"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(facts("custkey")).as("n_customers"),
        sum(coalesce(col("version").cast("long"), lit(0L)))
          .as("sum_version"))
      .orderBy(col("priority"))
  }

  val q130Sql: String =
    """WITH log AS (
      |  SELECT o_custkey AS custkey, o_orderdate AS chg_at,
      |         o_orderkey AS ok, o_orderpriority AS priority,
      |         lag(o_orderpriority) OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |           AS prev
      |  FROM orders),
      |chg AS (SELECT * FROM log WHERE prev IS NULL OR prev <> priority),
      |dim AS (
      |  SELECT custkey, priority, chg_at AS effective_from,
      |         lead(chg_at) OVER w AS effective_to,
      |         CAST(row_number() OVER w AS INT) AS version
      |  FROM chg
      |  WINDOW w AS (PARTITION BY custkey ORDER BY chg_at, ok)),
      |facts AS (
      |  SELECT o_custkey AS custkey, l_shipdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT coalesce(d.priority, '(pre-history)') AS priority,
      |       count(*) AS n_lines,
      |       count(DISTINCT f.custkey) AS n_customers,
      |       CAST(sum(coalesce(d.version, 0)) AS BIGINT) AS sum_version
      |FROM facts f LEFT JOIN dim d ON f.custkey = d.custkey
      | AND f.l_shipdate >= d.effective_from
      | AND (d.effective_to IS NULL OR f.l_shipdate < d.effective_to)
      |GROUP BY 1
      |ORDER BY priority""".stripMargin

  /** q132_diff — declarative table diff: base vs a perturbed next version
    * (planted updates on keys ≡2 mod 7, deletes on ≡5 mod 13, inserts past
    * the key space), classified by FULL OUTER join into added / removed /
    * changed / unchanged with per-class row counts and decimal-exact sums.
    * The regression-diff every pipeline migration wants; one shuffle on
    * the key, column comparison as residual.
    */
  def q132Diff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        col("o_orderpriority").as("prio"))
    val next = base
      .filter(col("k") % 13 =!= 5)
      .select(col("k"),
        when(col("k") % 7 === 2, col("price") + 50.0)
          .otherwise(col("price")).as("price"),
        col("prio"))
      .unionByName(base.filter(col("k") % 100 === 9)
        .select((col("k") + 20000000L).as("k"), col("price"),
          col("prio")))
    val b = base.select(col("k"), col("price").as("b_price"),
      col("prio").as("b_prio"))
    val n = next.select(col("k"), col("price").as("n_price"),
      col("prio").as("n_prio"))
    b.join(n, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("b_price").isNull, "added")
          .when(col("n_price").isNull, "removed")
          .when(col("b_price") =!= col("n_price") ||
            col("b_prio") =!= col("n_prio"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("n_price"), col("b_price")).as("price"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        decSum(col("price"), 2).as("sum_price"))
      .orderBy(col("status"))
  }

  val q132Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price,
      |         o_orderpriority AS prio
      |  FROM orders),
      |next AS (
      |  SELECT k,
      |         CASE WHEN k % 7 = 2 THEN price + 50.0 ELSE price END AS price,
      |         prio
      |  FROM base WHERE k % 13 <> 5
      |  UNION ALL
      |  SELECT k + 20000000, price, prio FROM base WHERE k % 100 = 9),
      |j AS (
      |  SELECT coalesce(n.price, b.price) AS price,
      |         CASE WHEN b.k IS NULL THEN 'added'
      |              WHEN n.k IS NULL THEN 'removed'
      |              WHEN b.price <> n.price OR b.prio <> n.prio
      |                THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM base b FULL OUTER JOIN next n ON b.k = n.k)
      |SELECT status, count(*) AS n_rows,
      |       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM j GROUP BY status ORDER BY status""".stripMargin

  // ------------------------------------------------------------ CDC replay

  /** q240_cdc_replay — change-data-capture log compaction with TOMBSTONE
    * semantics, the maintenance op q38's MERGE does not cover: fold an
    * ordered op log (insert / update / delete per key) into final table
    * state. The log is derived deterministically from events (op by id
    * hash: ~10% D, ~20% I, rest U; order = (ts, event_id) — a total
    * order, so "last" is well-defined). A key whose LAST op is a delete
    * is ABSENT from the final state; a surviving key's NON-FINAL deletes
    * are counted (`n_nonfinal_deletes` — every D strictly before the
    * last op, whether or not an I follows it; a true resurrection count
    * would additionally require a later insert) — the lifecycle audit a
    * lakehouse compaction job reports. Output: live keys with last
    * value/ts plus per-key op counts.
    *
    * Scale: ONE shuffle on the key; the fold is a per-key window over
    * that partitioning (arrival-bounded per key) and the op counts ride
    * the same aggregate. This is exactly the shape Delta/Hudi log
    * compaction lowers to; at 100 TB the only growth axis is keys, which
    * partition. Resurrections = D ops strictly before the last op, exact
    * integers. */
  def q240CdcReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.StableHash
    val opCol = {
      val h = pmod(StableHash.intMix62(col("event_id"), 41L), lit(10L))
      when(h === 0L, "D").when(h <= 2L, "I").otherwise("U")
    }
    val log = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        opCol.as("op"))
    val w = Window.partitionBy(col("user_id"))
    val ranked = log
      .withColumn("rn", row_number().over(
        w.orderBy(col("ts").desc, col("event_id").desc)))
    val folded = ranked
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ops"),
        sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserts"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updates"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
        sum(when(col("op") === "D" && col("rn") > 1, 1L).otherwise(0L))
          .as("n_nonfinal_deletes"),
        max(when(col("rn") === 1, col("op"))).as("last_op"),
        max(when(col("rn") === 1, col("value"))).as("last_value"),
        max(when(col("rn") === 1, col("ts"))).as("last_ts"))
    folded.filter(col("last_op") =!= "D")
      .select(col("user_id"), col("n_ops"), col("n_inserts"),
        col("n_updates"), col("n_deletes"), col("n_nonfinal_deletes"),
        col("last_op"), col("last_value"), col("last_ts"))
      .orderBy(col("user_id"))
  }

  val q240Sql: String = {
    val h = s"(${graft.functions.StableHash.intMix62Sql("event_id", 41L)}) % 10"
    s"""WITH log AS (
       |  SELECT user_id, ts, event_id, value,
       |         CASE WHEN ($h) = 0 THEN 'D'
       |              WHEN ($h) <= 2 THEN 'I'
       |              ELSE 'U' END AS op
       |  FROM events),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |           ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM log),
       |folded AS (
       |  SELECT user_id,
       |         CAST(count(*) AS BIGINT) AS n_ops,
       |         CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_inserts,
       |         CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_updates,
       |         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_deletes,
       |         CAST(sum(CASE WHEN op = 'D' AND rn > 1 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_nonfinal_deletes,
       |         max(CASE WHEN rn = 1 THEN op END) AS last_op,
       |         max(CASE WHEN rn = 1 THEN value END) AS last_value,
       |         max(CASE WHEN rn = 1 THEN ts END) AS last_ts
       |  FROM ranked GROUP BY user_id)
       |SELECT user_id, n_ops, n_inserts, n_updates, n_deletes,
       |       n_nonfinal_deletes, last_op, last_value, last_ts
       |FROM folded WHERE last_op <> 'D'
       |ORDER BY user_id""".stripMargin
  }
}
