package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, SparkSuite.sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    val salted = Scale.saltedAggregate(li, Seq("l_returnflag"), 16,
      Seq(sum(col("l_quantity")).as("sq"), count(lit(1)).as("c")),
      Seq(sum(col("sq")).as("sum_qty"), sum(col("c")).as("n")))
      .orderBy(col("l_returnflag"))
    // l_quantity is integer-valued, so double sums are exact in any order
    assert(direct.collect().toSeq === salted.collect().toSeq)
  }

  test("hashBuildParallelism floors at session parallelism, scales with rows") {
    val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // small data keeps full CPU fan-out
    assert(Scale.hashBuildParallelism(spark, 0L) === base)
    assert(Scale.hashBuildParallelism(spark, Scale.HashBuildRowsPerTask / 2)
      === base)
    // large data: per-task build stays ≤ rowsPerTask regardless of the
    // session's fixed shuffle count (the q139 sf2 OOM class)
    val rows = 1000L * Scale.HashBuildRowsPerTask
    val parts = Scale.hashBuildParallelism(spark, rows)
    assert(rows / parts <= Scale.HashBuildRowsPerTask)
    assert(parts >= 1000)
  }

  test("unguardedHashBuilds flags a fixed-parallelism SHUFFLE_HASH " +
    "build, passes a scaled one") {
    import graft.plans.PlanAudit
    val li = Tables.lineitem(spark, SparkSuite.sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.orders(spark, SparkSuite.sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    // fixed session parallelism: build grows with the data → flagged
    val bad = li.join(o.hint("shuffle_hash"), Seq("l_orderkey"))
    assert(PlanAudit.unguardedHashBuilds(bad).nonEmpty,
      "an unguarded SF-proportional hash build must be flagged")
    // explicit scaled co-partitioning on the build keys → clean
    val parts = Scale.hashBuildParallelism(spark, 1000L)
    val good = li.repartition(parts, col("l_orderkey"))
      .join(o.repartition(parts, col("l_orderkey")).hint("shuffle_hash"),
        Seq("l_orderkey"))
    assert(PlanAudit.unguardedHashBuilds(good).isEmpty,
      "a Scale.hashBuildParallelism-sized build must pass")
    // the repartition must be the side's IMMEDIATE chain: one buried in
    // the lineage below an aggregate does not govern the join's build
    val buried = li.repartition(parts, col("l_partkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .join(o.hint("shuffle_hash"), Seq("l_orderkey"))
    assert(PlanAudit.unguardedHashBuilds(buried).nonEmpty,
      "a lineage-buried repartition must not whitelist the join")
  }

  // The bucketed co-located join moved to sources.Bucketing: plan shape
  // (exchange-free vs a shuffling control) is asserted in PlanSpec, and
  // result correctness is the q18_join_bucketed oracle row.

  test("salted join equals the plain join on rows and labels") {
    val li = Tables.lineitem(spark, SparkSuite.sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("label", concat(lit("f_"), col("l_returnflag")))
    val plain = li.join(dim, Seq("l_returnflag"))
    val salted = Scale.saltedJoin(li, dim, Seq("l_returnflag"), 8)
      .select(plain.columns.map(col).toSeq: _*)
    // multiset equality — (l_orderkey, l_linenumber) is not unique in the
    // synthetic fixture, so no column sort is total here
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  // ---- AQE skew-join pins (SKEW_AQE_NOTE_r7.md) -------------------------
  // The salt-vs-AQE decision rule is measured, not assumed. Two pins:
  // q84's low-cardinality uniform shape must stay un-split by AQE at ANY
  // threshold (median-relative definition sees no outlier → salting is
  // the only fix), and the outlier-hot-key shape with real multi-mapper
  // input MUST be split (so we notice if the AQE path we point users to
  // stops working). Both pins read the final adaptive plan after
  // execution — a pre-execution plan always reports isFinalPlan=false
  // and never contains skew markers.

  private def withSkewConfs[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally keys.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect(): scala.Unit // materialize so the adaptive plan finalizes
    df.queryExecution.executedPlan.toString
  }

  test("AQE pin: uniform low-cardinality skew is never split — salt it") {
    withSkewConfs {
      val li = Tables.lineitem(spark, SparkSuite.sf)
        .select(col("l_returnflag"), col("l_extendedprice"))
      // bare-shuffle dim side (range, not distinct) so the rule's plan
      // pattern matches and the ONLY reason it can decline is the sizes
      val dim = spark.range(0, 3)
        .select(when(col("id") === 0, "A").when(col("id") === 1, "N")
          .otherwise("R").as("l_returnflag"),
          concat(lit("f_"), col("id")).as("label"))
      val plan = finalPlan(li.join(dim.hint("merge"), Seq("l_returnflag"))
        .groupBy(col("label")).agg(count(lit(1)).as("n")))
      assert(plan.contains("isFinalPlan=true"))
      assert(!plan.contains("skew="),
        "AQE now splits uniform low-cardinality keys — the salt-vs-AQE " +
          "guidance in SKEW_AQE_NOTE_r7.md needs re-measuring")
    }
  }

  test("AQE pin: outlier hot key with real mappers IS split by AQE") {
    withSkewConfs {
      // one key with ~half the rows among ~1000 normal keys; repartition
      // creates real map tasks (the single-row-group fixture otherwise
      // funnels every row through one mapper and mapper-boundary
      // splitting cannot fire — the note's finding #2). sf0.1 on
      // purpose: the sf0.001 partitions compress below the granularity
      // where the splitter produces >1 piece, and the pin must exercise
      // the path that actually fires.
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      try {
        val fact = Tables.lineitem(spark, "/root/testdata/sf0.1")
          .select(when(pmod(col("l_orderkey"), lit(2L)) === 0L, lit(0L))
            .otherwise(pmod(col("l_orderkey"), lit(997L)) + 1L).as("k"),
            col("l_extendedprice"))
          .repartition(12)
        val dim = spark.range(0L, 998L)
          .select(col("id").as("k"),
            concat(lit("g_"), col("id")).as("label"))
        val plan = finalPlan(fact.join(dim.hint("merge"), Seq("k"))
          .groupBy(col("label")).agg(count(lit(1)).as("n")))
        assert(plan.contains("isFinalPlan=true"))
        assert(plan.contains("skew=true"),
          "AQE no longer splits the outlier-hot-key shape it is trusted " +
            "with in SKEW_AQE_NOTE_r7.md — re-measure before relying on it")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  // ---- skewAwareJoin: SKEW_AQE_NOTE_r7's decision rule as code. Each of
  // the three documented AQE failure modes must route to Salt; the shape
  // AQE handles must route to TrustAqe.

  test("skew rule: uniform low-cardinality key → salt (AQE sees no outlier)") {
    // q84's shape: 3 keys, each ~1/3 — skewFactor ≈ 1, far below any
    // median-relative trigger, yet 29 of 32 reducers idle
    val s = Scale.SkewStats(nRows = 600000L, nDistinct = 3L,
      topShare = 0.34, topKeyMapperSpread = 8)
    assert(Scale.chooseSkewStrategy(s, dimAggregated = false) == Scale.Salt)
  }

  test("skew rule: aggregated dim side → salt (AQE pattern never matches)") {
    // even a perfect outlier profile is ignored when the dim passes
    // through distinct()/an aggregate — the rule requires BOTH children
    // to be bare Sort(shuffle)
    val outlier = Scale.SkewStats(nRows = 1000000L, nDistinct = 1000L,
      topShare = 0.5, topKeyMapperSpread = 12)
    assert(Scale.chooseSkewStrategy(outlier, dimAggregated = true) ==
      Scale.Salt)
    // and the plan-shape detector actually detects distinct()
    val dimDistinct = Tables.lineitem(spark, SparkSuite.sf)
      .select(col("l_returnflag")).distinct()
    assert(Scale.dimAggregated(dimDistinct))
    assert(!Scale.dimAggregated(
      Tables.nation(spark, SparkSuite.sf).select(col("n_nationkey"))))
  }

  test("skew rule: mapper-concentrated hot key → salt (splits happen at " +
    "mapper boundaries)") {
    val s = Scale.SkewStats(nRows = 1000000L, nDistinct = 1000L,
      topShare = 0.5, topKeyMapperSpread = 1)
    assert(Scale.chooseSkewStrategy(s, dimAggregated = false) == Scale.Salt)
  }

  test("skew rule: outlier key, multi-mapper spread, bare children → AQE") {
    val s = Scale.SkewStats(nRows = 1000000L, nDistinct = 1000L,
      topShare = 0.5, topKeyMapperSpread = 12)
    assert(Scale.chooseSkewStrategy(s, dimAggregated = false) ==
      Scale.TrustAqe)
  }

  test("skewAwareJoin: both branches produce the plain-join result") {
    val li = Tables.lineitem(spark, SparkSuite.sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val dim = li.select(col("l_returnflag")).distinct()
      .select(col("l_returnflag"),
        concat(lit("flag_"), col("l_returnflag")).as("label"))
    def agg(j: org.apache.spark.sql.DataFrame) = j
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      .orderBy(col("label")).collect().toSeq
    val expected = agg(li.join(dim, Seq("l_returnflag")))
    // salted branch (aggregated dim forces it regardless of stats)
    val salted = Scale.skewAwareJoin(li, dim, Seq("l_returnflag"),
      Scale.SkewStats(600000L, 3L, 0.34, 8),
      saltCols = Seq("l_returnflag", "l_extendedprice"))
    assert(salted.columns.contains("label") &&
      !salted.columns.contains("__salt"))
    assert(agg(salted) === expected)
    // AQE branch: outlier stats + un-aggregated dim → plain join, no salt
    val dimBare = spark.range(0, 3)
      .select(when(col("id") === 0, "A").when(col("id") === 1, "N")
        .otherwise("R").as("l_returnflag"),
        concat(lit("flag_"), when(col("id") === 0, "A")
          .when(col("id") === 1, "N").otherwise("R")).as("label"))
    val aqe = Scale.skewAwareJoin(li, dimBare, Seq("l_returnflag"),
      Scale.SkewStats(1000000L, 1000L, 0.5, 12))
    assert(!aqe.queryExecution.optimizedPlan.toString.contains("__salt"),
      "TrustAqe branch must not salt")
    assert(agg(aqe) === expected)
  }

  test("plan audit: globalRank's own plan is clean, but a global window " +
    "DOWNSTREAM of it is still flagged") {
    import graft.ops.Checkpoints
    import graft.plans.PlanAudit
    val o = Tables.orders(spark, SparkSuite.sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    Checkpoints.withNoCut {
      val ranked = Scale.globalRank(o,
        Seq(col("o_totalprice"), col("o_orderkey")))
      // the utility's own uncut plan: its only partitionBy-less window
      // is the ≤ #partitions-row `_pid` offset frame (whitelisted by
      // shape), and its offsets broadcast hint is exempted the same way
      assert(PlanAudit.suspectGlobalWindows(ranked).isEmpty,
        "globalRank's internal offset window must be whitelisted")
      assert(PlanAudit.sfProportionalBroadcasts(ranked).isEmpty,
        "globalRank's offsets broadcast must be exempted by shape")
      // the round-8 audit loophole: a single-partition window added ON
      // TOP of the ranked output carries the `_pid` aggregate somewhere
      // in its lineage — classification by lineage search whitelisted
      // it; classification by immediate child shape must flag it
      val downstream = ranked.withColumn("cum",
        sum(col("o_totalprice")).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rank_idx"))))
      assert(PlanAudit.suspectGlobalWindows(downstream).nonEmpty,
        "single-partition window downstream of globalRank was " +
          "silently whitelisted — the audit regressed to lineage search")
    }
  }

  test("cut fails fast when the retired noCut session conf is set") {
    import graft.ops.Checkpoints
    // The conf used to silently disable the correctness-load-bearing
    // cut in globalRank/globalCumSum (offsets computed under one
    // sampled partitioning, joined onto another). A copied config must
    // now produce a loud error at the first cut, not shifted ranks.
    spark.conf.set(Checkpoints.NoCutKey, "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Checkpoints.cut(Tables.orders(spark, SparkSuite.sf))
      }
      assert(e.getMessage.contains("withNoCut"))
    } finally spark.conf.unset(Checkpoints.NoCutKey)
  }
}
