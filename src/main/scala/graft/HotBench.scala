package graft

import org.apache.spark.sql.functions._

/** Production-cap-binding probe at a REAL scale point (VERDICT r10 next
  * #6): the organic fixtures never produce a mega-cluster (max/mean
  * cluster size ≤ 1.5 at every measured SF), so r10's cap/salt evidence
  * came from the all-blob `BlobBench` corpus. This main plants a
  * BlobBench-style clone blob INTO the sf fixture — nClones noisy copies
  * of the fixture's vector 0, ids above the fixture's id range so seeds
  * are untouched — making the production cap (4·⌈√n⌉) BIND inside an
  * otherwise-organic corpus, then measures the three consumers of that
  * cap at this point:
  *
  *  - the q274 accounting (cluster sizes → generated/skipped pairs at
  *    the production cap) — asserts in output that the cap actually
  *    binds (n_capped_clusters ≥ 1, pairs_skipped > 0);
  *  - `Centroids.semDedup` at the production default — the capped +
  *    conditionally-salted pair join on a mixed organic/hot corpus;
  *  - `Centroids.incrSemDedup` — the r11 cap-binding probe must select
  *    the capped+salted regime (clones with id ≡ 0 mod 10 land in the
  *    batch, so the blob spans both sides).
  *
  * Usage: runMain graft.HotBench [nClones] — reads SPARK_GRAFT_SF_DIR
  * (default /tmp/graft-sf1, the 10× fixture) and prints one JSON line.
  */
object HotBench {
  def main(args: Array[String]): Unit = {
    val nClones = args.headOption.map(_.toInt).getOrElse(5000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-hot-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val fixture = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val maxId = fixture.agg(max(col("vec_id"))).head().getLong(0)
    val proto = fixture.filter(col("vec_id") === 0L)
      .head().getSeq[Float](1).toArray
    val rng = new scala.util.Random(31)
    val clones = (0 until nClones).map { i =>
      (maxId + 1 + i,
        proto.map(x => x + 0.001f * rng.nextGaussian().toFloat))
    }
    // LocalRelation union with the parquet scan; deliberately not
    // cached (the BlobBench hygiene: between-run clearCache must be
    // able to wipe everything without biasing a later run)
    val e = fixture.unionByName(clones.toDF("vec_id", "embedding"))
      .repartition(32)
    val n = e.count()
    val k = math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val cap = graft.ops.Centroids.semClusterCap(n)
    // the q274 accounting at the production cap over this corpus
    val sizes = graft.ops.Centroids.semAssign(
        graft.ops.Centroids.quantized(e), n, k, arrays = Some(e))
      .groupBy(col("cid")).agg(count(lit(1)).as("m"))
    val acct = graft.ops.Centroids
      .clusterPairAccounting(sizes, Seq(cap)).head()
    // the Scaladoc's binding assertion, enforced (ADVICE r11): a blob
    // that fails to form a capped cluster would otherwise emit a vacuous
    // "hot" measurement indistinguishable from a real one
    require(acct.getLong(2) >= 1L && acct.getLong(5) > 0L,
      s"planted blob did not bind the cap (n_capped_clusters=" +
        s"${acct.getLong(2)}, pairs_skipped=${acct.getLong(5)}) — " +
        "raise nClones or check the fixture")

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
    val semSec = timed(() => graft.ops.Centroids.semDedup(e))
    val incrSec = timed(() => graft.ops.Centroids.incrSemDedup(e))
    println(s"""{"metric":"hot_cluster","sf_dir":"$sfDir",""" +
      s""""n_total":$n,"n_clones":$nClones,"cap":$cap,""" +
      s""""n_capped_clusters":${acct.getLong(2)},""" +
      s""""members_in_capped":${acct.getLong(3)},""" +
      s""""pairs_generated":${acct.getLong(4)},""" +
      s""""pairs_skipped":${acct.getLong(5)},""" +
      s""""semdedup_sec":$semSec,"incr_semdedup_sec":$incrSec}""")
    spark.stop()
  }
}
