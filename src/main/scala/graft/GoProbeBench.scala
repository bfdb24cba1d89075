package graft

import org.apache.spark.sql.functions._

/** Isolated cost of the two-level-assignment go-probe at a scale point
  * (VERDICT r12 #1 "done" evidence: with the r13 sample cap the probe's
  * cost should go ~flat across fixture doublings instead of sharing the
  * O(n^1.5) exponent of the assignment it gates). Times `hierGoProbe`
  * cold (fresh plan, first action) and warm (second run, same JVM —
  * the memo is deliberately BYPASSED by calling the probe directly, so
  * both runs measure the probe itself), and reports the realized sample
  * size and modulus.
  *
  * Usage: runMain graft.GoProbeBench — reads SPARK_GRAFT_SF_DIR and
  * prints one JSON line.
  */
object GoProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-go-probe-bench")
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val k = math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val qv = graft.ops.Centroids.quantized(e)
    def timedProbe(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val (agree, tot) = graft.ops.Centroids.hierGoProbe(qv, n, k)
      ((System.nanoTime() - t0) / 1e9, agree, tot)
    }
    val (cold, agree, tot) = timedProbe()
    val (warm, _, _) = timedProbe()
    println(s"""{"metric":"go_probe","sf_dir":"$sfDir","n":$n,"k":$k,""" +
      s""""sample_mod":${graft.ops.Centroids.hierSampleMod(n)},""" +
      s""""sample_rows":$tot,"agree":$agree,""" +
      s""""cold_sec":${math.round(cold * 1000) / 1000.0},""" +
      s""""warm_sec":${math.round(warm * 1000) / 1000.0}}""")
    spark.stop()
  }
}
