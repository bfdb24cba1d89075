package graft

import org.apache.spark.sql.functions._

/** Isolated A/B of the IVF coarse assignment's two exact forms
  * (VERDICT r14 #1): the flat long-encoded argmax over the full n·k
  * cosine frame vs the angular Elkan-pruned form
  * ([[graft.ops.Similarity.ivfAssignPruned]]), at the corpus-scaled
  * k = ⌈√n⌉ on the HotBench corpus shape (fixture + optional clone
  * blob). Both forms produce bit-identical assignments
  * (IvfPrunedSpec); this main measures the wall cost and prints the
  * pruned form's skip ledger — the proven-safe pair accounting
  * SCALE_POINT_r15 commits.
  *
  * Usage: runMain graft.IvfPruneBench [nClones] — reads
  * SPARK_GRAFT_SF_DIR (default /tmp/graft-sf1) and prints one JSON
  * line. nClones=0 runs the organic corpus (the no-locality worst
  * case for the bound).
  */
object IvfPruneBench {
  def main(args: Array[String]): Unit = {
    val nClones = args.headOption.map(_.toInt).getOrElse(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-ivf-prune-bench")
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

    val flatSec = timed(() => graft.ops.Similarity.ivfAssign(
      e, graft.ops.Similarity.centSims(e, k), k))
    val prunedSec = timed(() => graft.ops.Similarity.ivfAssignPruned(
      e, k, probeParallelism = Some(pp)))
    val acct = graft.ops.Similarity
      .ivfPrunedAccounting(e, n, k, probeParallelism = Some(pp)).head()
    println(s"""{"metric":"ivf_prune_ab","sf_dir":"$sfDir",""" +
      s""""n_total":$n,"n_clones":$nClones,"k":$k,""" +
      s""""kc":${acct.getLong(2)},""" +
      s""""pairs_total":${acct.getLong(3)},""" +
      s""""pairs_incell":${acct.getLong(4)},""" +
      s""""pairs_pruned":${acct.getLong(5)},""" +
      s""""pairs_survivor":${acct.getLong(6)},""" +
      s""""flat_sec":$flatSec,"pruned_sec":$prunedSec}""")
    spark.stop()
  }
}
