package graft

import org.apache.spark.sql.functions._

/** The scaled-IVF scan-fraction measurement (VERDICT r13 #2's done
  * criterion: per-query scan fraction ~nprobe/√n at the scale points):
  * resolves the nprobe dial over BOTH quantizers on this corpus — the
  * historical fixed k = 8 and the corpus-scaled k = ⌈√n⌉ — and reports
  * each pick's average per-query candidate count as a fraction of the
  * corpus. The fixed quantizer's fraction is ~nprobe/8 regardless of n
  * (inverted lists grow O(n/8) — the r13 scale note this closes); the
  * scaled quantizer's shrinks as ~nprobe/√n.
  *
  * Usage: runMain graft.IvfScaleBench — reads SPARK_GRAFT_SF_DIR
  * (default /tmp/graft-sf1) and prints one JSON line.
  *
  * `runMain graft.IvfScaleBench blobs [n]` instead synthesizes a
  * PLANTED-LOCALITY corpus of n vectors (k = ⌈√n⌉ tight blobs, one
  * per centroid id, deterministic sin-based noise — no data files,
  * no RNG state): the regime where an inverted-list index earns its
  * keep. With the non-centroid probe slice of ADVICE r14 the organic
  * fixtures resolve to a large honest nprobe (isotropic mass has no
  * locality to exploit); this mode pins that the SAME resolver and
  * slice still read nprobe = 1 and a ~1/√n scan fraction when the
  * corpus actually clusters.
  */
object IvfScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-ivf-scale-bench")
    spark.sparkContext.setLogLevel("WARN")
    val blobs = args.headOption.contains("blobs")
    val e =
      if (!blobs) Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      else {
        val nb = args.lift(1).map(_.toLong).getOrElse(320000L)
        val m = math.max(2L, math.ceil(math.sqrt(nb.toDouble)).toLong)
        // blob b center: sin(b·131 + d·17)·10 per dim — separated far
        // beyond the 0.01 intra-blob noise; ids 0..k-1 are one member
        // per blob (id mod m), so the first-k centroid rule seeds
        // every blob, and the [k, k+5) probe queries are NON-centroid
        // members of blobs 0..4
        spark.range(nb).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), d =>
            (sin(pmod(col("id"), lit(m)) * 131 + d * 17) * 10.0 +
              sin(col("id") * 7919 + d * 104729) * 0.01)
              .cast("float")).as("embedding"))
      }
    val n = e.count()
    val k = math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)

    def measure(kk: Long): (Long, Double, Double) = {
      val t0 = System.nanoTime()
      val pick = graft.ops.Similarity.resolveNprobe(e, n,
        gateDir = None, k = kk)
      val sec = (System.nanoTime() - t0) / 1e9
      val r = graft.ops.Similarity
        .ivfSweepDial(e, graft.ops.Similarity.resolverQueryPred(kk), kk,
          nHint = n)
        .filter(col("nprobe") === pick)
        .agg(avg(col("n_cands")).as("c")).head()
      (pick, r.getDouble(0) / n, sec)
    }
    val (pickS, fracS, secS) = measure(k)
    val (pickF, fracF, secF) = measure(8L)
    println(s"""{"metric":"ivf_scan_fraction","sf_dir":"$sfDir",""" +
      s""""n":$n,"k_scaled":$k,""" +
      s""""scaled":{"nprobe":$pickS,"scan_frac":$fracS,"resolve_sec":$secS},""" +
      s""""fixed8":{"nprobe":$pickF,"scan_frac":$fracF,"resolve_sec":$secF}}""")
    spark.stop()
  }
}
