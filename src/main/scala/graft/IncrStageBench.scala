package graft

import org.apache.spark.sql.functions._

/** Per-stage decomposition of `incrSemDedup` at a HotBench scale point
  * (VERDICT r12 #2: the adversarial-chain doubling exponent rose 0.41 →
  * 0.90 between r11 and r12 with nothing attributing WHICH stage grows)
  * — plants the same clone blob as [[HotBench]], then runs the operator
  * with its `stageProbe` seam wired to a timing callback: every stage
  * frame is forced (count) as it is defined, so each reading measures
  * that stage's own work from its persisted inputs. The per-stage rows
  * are the output; the instrumented total is NOT the production cost
  * (forcing the non-persisted compare aggregates makes the final
  * assembly recompute them — see the seam's doc) and the clean
  * end-to-end number stays [[HotBench]]'s.
  *
  * Usage: runMain graft.IncrStageBench [nClones] — reads
  * SPARK_GRAFT_SF_DIR (default /tmp/graft-sf4) and prints one JSON line
  * with per-stage (seconds, rows).
  */
object IncrStageBench {
  def main(args: Array[String]): Unit = {
    val nClones = args.headOption.map(_.toInt).getOrElse(20000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-incr-stage-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // HotBench's corpus, exactly: fixture + nClones noisy copies of
    // vector 0 above the fixture id range (ids ≡ 0 mod 10 land in the
    // admission batch, so the blob spans standing corpus AND batch)
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
    val e = fixture.unionByName(clones.toDF("vec_id", "embedding"))
      .repartition(32)
    val n = e.count()
    val stages = scala.collection.mutable.ArrayBuffer[
      (String, Double, Long)]()
    val cb: (String, org.apache.spark.sql.DataFrame) => Unit =
      (label, df) => {
        val t0 = System.nanoTime()
        val rows = df.count()
        stages += ((label, (System.nanoTime() - t0) / 1e9, rows))
      }
    val t0 = System.nanoTime()
    graft.ops.Centroids.incrSemDedup(e, stageProbe = cb)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    val stageJson = stages.map { case (l, s, r) =>
      s""""$l":{"sec":${math.round(s * 1000) / 1000.0},"rows":$r}"""
    }.mkString(",")
    println(s"""{"metric":"incr_stage","sf_dir":"$sfDir",""" +
      s""""n_total":$n,"n_clones":$nClones,""" +
      s""""instrumented_total_sec":${math.round(total * 1000) / 1000.0},""" +
      s""""stages":{$stageJson}}""")
    spark.stop()
  }
}
