package graft

import org.apache.spark.sql.functions._

/** Isolated A/B of the flat standing assignment's two exact forms
  * (VERDICT r13 #1): the exploded n·k·d hash-aggregate
  * ([[graft.ops.Centroids.assignMembers]]) vs the Elkan-pruned
  * array-kernel form ([[graft.ops.Centroids.assignMembersPruned]]),
  * on the HotBench corpus shape (fixture + optional clone blob). Both
  * forms produce bit-identical assignments (PrunedAssignSpec); this
  * main measures the wall cost and prints the pruned form's skip
  * ledger — the proven-safe pair accounting SCALE_POINT_r14 commits.
  *
  * Usage: runMain graft.PruneBench [nClones] — reads SPARK_GRAFT_SF_DIR
  * (default /tmp/graft-sf1) and prints one JSON line. nClones=0 runs
  * the organic corpus (the no-locality worst case for the bound).
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val nClones = args.headOption.map(_.toInt).getOrElse(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-prune-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val fixture = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val e = if (nClones == 0) fixture else {
      val maxId = fixture.agg(max(col("vec_id"))).head().getLong(0)
      val proto = fixture.filter(col("vec_id") === 0L)
        .head().getSeq[Float](1).toArray
      val rng = new scala.util.Random(31)
      val clones = (0 until nClones).map { i =>
        (maxId + 1 + i,
          proto.map(x => x + 0.001f * rng.nextGaussian().toFloat))
      }
      fixture.unionByName(clones.toDF("vec_id", "embedding"))
        .repartition(32)
    }
    val n = e.count()
    val k = math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val p = graft.ops.Centroids.assignParallelism(spark, n, k)
    val pp = graft.ops.Centroids.prunedParallelism(spark, n, k)

    def timed(mk: () => org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        secs
      }.min

    // optional per-stage decomposition (second arg "stages"): forces
    // each internal frame of the pruned pipeline in isolation
    if (args.length > 1 && args(1) == "stages") {
      val pf = graft.ops.Centroids.prunedPairFrames(
        e, k, None, Some(pp))
      def t(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        println(s"""{"stage":"$label","sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$rows}""")
      }
      t("incell_cut_and_count") { pf.incell.count() }
      t("pairs_filter_count") { pf.pairs.filter(!pf.prunable).count() }
      t("survivor_fold") { pf.pairs.filter(!pf.prunable)
        .select(col("vec_id"), col("fcid"),
          graft.functions.VectorFunctions
            .quant_sqdist(col("embedding"), col("semb")).as("dist"))
        .agg(count(col("dist"))).head().getLong(0) }
      t("full_pruned") {
        graft.ops.Centroids.assignMembersPruned(
          e, k, probeParallelism = Some(pp)).count() }
      spark.stop()
      return
    }
    val flatSec = timed(() => graft.ops.Centroids.assignMembers(
      graft.ops.Centroids.quantized(e), k, hintCentroids = false,
      probeParallelism = Some(p)))
    // production default (own-center bound MEASURED OFF — see
    // OwnBoundDefaultRows)
    val prunedSec = timed(() => graft.ops.Centroids.assignMembersPruned(
      e, k, probeParallelism = Some(pp)))
    // the r15 bound-2 A/B arm: the same pipeline with the own-center
    // bound enabled
    val prunedOwnSec = timed(() =>
      graft.ops.Centroids.assignMembersPruned(
        e, k, probeParallelism = Some(pp),
        ownBoundRows = graft.ops.Centroids.OwnBoundMaxRows))
    val acct = graft.ops.Centroids
      .prunedAssignAccounting(e, n, k, probeParallelism = Some(pp)).head()
    // own-bound attribution (what the second bound WOULD prove)
    val acctOwn = graft.ops.Centroids
      .prunedAssignAccounting(e, n, k, probeParallelism = Some(pp),
        ownBoundRows = graft.ops.Centroids.OwnBoundMaxRows).head()
    println(s"""{"metric":"prune_ab","sf_dir":"$sfDir",""" +
      s""""n_total":$n,"n_clones":$nClones,"k":$k,""" +
      s""""kc":${acct.getLong(2)},""" +
      s""""pairs_total":${acct.getLong(3)},""" +
      s""""pairs_incell":${acct.getLong(4)},""" +
      s""""pairs_pruned":${acct.getLong(5)},""" +
      s""""pairs_survivor":${acct.getLong(6)},""" +
      s""""pairs_pruned_union":${acctOwn.getLong(5)},""" +
      s""""pairs_pruned_tri":${acctOwn.getLong(7)},""" +
      s""""pairs_pruned_own":${acctOwn.getLong(8)},""" +
      s""""flat_sec":$flatSec,"pruned_sec":$prunedSec,""" +
      s""""pruned_own_sec":$prunedOwnSec}""")
    spark.stop()
  }
}
