package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link-graph analysis over relational edges — the web-graph quality signal
  * a corpus-curation pipeline attaches to documents (host PageRank as a
  * quality prior). The reference's warehouse has no graph operator; this is
  * the Spark-first expression of one: each PageRank iteration is a single
  * shuffled equi-join (ranks ⋈ edges on the source key) followed by a hash
  * aggregate on the destination key — the Pregel-without-Pregel form.
  *
  * Arithmetic is FIXED-POINT: ranks are BIGINT micro-units (1e6 = rank 1.0)
  * and every contribution is `rank div outdegree` in integer division, with
  * the damping step `(15 · R0 + 85 · inflow) div 100`. Two engines disagree
  * about float summation order; they cannot disagree about integer sums, so
  * the oracle hash-checks the full rank vector exactly. The cost is ≤ 1
  * micro-unit of truncation per in-edge — bounded, documented, and
  * irrelevant to ranking order at any scale.
  *
  * Scale: edges are deduplicated once (one shuffle), then each iteration
  * re-shuffles only (node, rank) pairs — the frontier stays the node set,
  * never the fact table. Degree-skewed hubs are a hash-aggregate hot key,
  * which AQE splits; dangling nodes contribute nothing by definition here
  * (the variant choice is pinned in the oracle too).
  */
object Graph {

  /** Rank unit: 1.0 == 1e6 micro-units. */
  val Unit = 1000000L

  /** One damped fixed-point iteration: r'(v) = (15·Unit + 85·Σ_{u→v}
    * (r(u) div outdeg(u))) div 100. `ranks`: (node, rank); `edges`:
    * (src, dst) with `outdeg` attached per src. */
  def iterate(ranks: DataFrame, edges: DataFrame): DataFrame = {
    val contrib = edges
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"),
        expr("rank div outdeg").as("c"))
    ranks.select(col("node"))
      .join(contrib.groupBy(col("node")).agg(sum(col("c")).as("inflow")),
        Seq("node"), "left")
      .select(col("node"),
        expr(s"(15 * ${Unit}L + 85 * coalesce(inflow, 0L)) div 100")
          .as("rank"))
  }

  /** q114_pagerank — two fixed-point PageRank iterations over the
    * undirected customer–supplier co-purchase graph (each distinct
    * (customer, supplier) pair from orders ⋈ lineitem becomes one edge in
    * each direction). Returns the supplier side of the rank vector with
    * degrees; integer arithmetic end-to-end, so the oracle replays the
    * exact ranks. */
  def q114Pagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
    // The edge build (fact-fact join + distinct over the full lineitem) is
    // the expensive subtree, and the iteration structure consumes it many
    // times (each iterate reads `edges` for contributions AND the node
    // frame; the outer iterate re-reads the inner's whole lineage).
    // Materialize once per round — the same per-round localCheckpoint
    // discipline as the connected-components loop (Components.scala),
    // which is how every iterative Spark algorithm must cut its lineage.
    val pairs = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cnode"),
        concat(lit("s"), col("l_suppkey")).as("snode"))
      .distinct()
    val edges = pairs.select(col("cnode").as("src"), col("snode").as("dst"))
      .unionAll(pairs.select(col("snode").as("src"), col("cnode").as("dst")))
      .localCheckpoint()
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val degreed = edges.join(outdeg, "src").localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct()

    val r0 = nodes.select(col("node"), lit(Unit).as("rank"))
    val r2 = iterate(iterate(r0, degreed).localCheckpoint(), degreed)

    r2.filter(col("node").startsWith("s"))
      .join(outdeg.withColumnRenamed("src", "node"), "node")
      .select(col("node"), col("outdeg").as("degree"), col("rank"))
      .orderBy(col("node"))
  }

  val q114Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT 'c' || o_custkey AS cnode, 's' || l_suppkey AS snode
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (
      |  SELECT cnode AS src, snode AS dst FROM pairs
      |  UNION ALL
      |  SELECT snode AS src, cnode AS dst FROM pairs),
      |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |r0 AS (SELECT node, 1000000::BIGINT AS rank FROM nodes),
      |r1 AS (
      |  SELECT n.node,
      |         CAST((15 * 1000000 + 85 * coalesce(i.inflow, 0)) // 100
      |              AS BIGINT) AS rank
      |  FROM nodes n LEFT JOIN (
      |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS inflow
      |    FROM edges e
      |    JOIN r0 r ON r.node = e.src
      |    JOIN outdeg d ON d.src = e.src
      |    GROUP BY e.dst) i ON i.node = n.node),
      |r2 AS (
      |  SELECT n.node,
      |         CAST((15 * 1000000 + 85 * coalesce(i.inflow, 0)) // 100
      |              AS BIGINT) AS rank
      |  FROM nodes n LEFT JOIN (
      |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS inflow
      |    FROM edges e
      |    JOIN r1 r ON r.node = e.src
      |    JOIN outdeg d ON d.src = e.src
      |    GROUP BY e.dst) i ON i.node = n.node)
      |SELECT r2.node, d.outdeg AS degree, r2.rank
      |FROM r2 JOIN outdeg d ON d.src = r2.node
      |WHERE r2.node LIKE 's%'
      |ORDER BY r2.node""".stripMargin
}
