package graft

import org.apache.spark.sql.functions._

/** Degenerate-corpus probe for the SemDeDup cluster cap: synthesizes the
  * boilerplate-crawl shape the cap exists for — n near-identical clones
  * of ONE prototype (plus a handful of distinct vectors), so the whole
  * corpus lands in one cluster and the UNCAPPED within-cluster pair join
  * is O(n²) — and times `Centroids.semDedup` with the production cap
  * (4·⌈√n⌉, the default) against an effectively-uncapped run. Run at two
  * sizes, the pair of timings gives the capped-vs-uncapped growth
  * exponents on the exact distribution the organic fixtures never
  * produce (their max/mean cluster size is ≤1.5 at every measured SF).
  *
  * Expected shape: capped pair count = cap·m − cap(cap+1)/2 ≈ 4n^1.5
  * (α → 1.5), uncapped = m(m−1)/2 ≈ n²/2 (α → 2) — the verdicts must be
  * IDENTICAL either way (the minimal representative is always admitted;
  * SimilaritySpec asserts row equality on this same shape).
  *
  * Usage: runMain graft.BlobBench [nClones] [cappedOnly] — prints one
  * JSON line; any second argument skips the uncapped arm (at 80k clones
  * the uncapped form is a 3.2G-pair single-reducer sort-merge join —
  * killed at 30 minutes in the r10 campaign — so the divergence point
  * is measured capped-only, the r9 q159 adjudication pattern).
  */
object BlobBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val cappedOnly = args.length > 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-blob-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rng = new scala.util.Random(23)
    def randVec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val bases = (0 until 40).map(i => (i.toLong, randVec()))
    val proto = bases.head._2
    val clones = (0 until n).map { i =>
      ((100 + i).toLong,
        proto.map(x => x + 0.001f * rng.nextGaussian().toFloat))
    }
    // a LocalRelation both forms re-scan identically — deliberately NOT
    // cached, so the between-run clearCache (the r9 leak-free-bench
    // hygiene: dropping RDD blocks alone leaves the CacheManager entry
    // alive and splices run 1's persisted frames into run 2's plan) can
    // wipe everything without biasing either form
    val e = (bases ++ clones).toDF("vec_id", "embedding").repartition(32)
    val total = e.count()

    def run(cap: Option[Long]): Double = {
      // min-of-2, Bench's convention: first execution carries codegen/JIT
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        ops.Centroids.semDedup(e, tau = 0.95, cap = cap)
          .write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        secs
      }.min
    }
    val capped = run(None) // production default: 4*ceil(sqrt(n))
    val uncapped = if (cappedOnly) -1.0 else run(Some(Long.MaxValue / 4))
    println(s"""{"metric":"blob_semdedup","n_clones":$n,"n_total":$total,""" +
      s""""capped_sec":$capped,"uncapped_sec":$uncapped}""")
    spark.stop()
  }
}
