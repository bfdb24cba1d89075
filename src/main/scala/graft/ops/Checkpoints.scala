package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cutting for iterative operators (connected components,
  * PageRank, k-core, LSH clustering): each round must materialize its
  * frame or the plan doubles per round and the planner chokes by round
  * ~10.
  *
  * Two strategies behind one switch:
  *  - default: `localCheckpoint` — executor-memory blocks, no
  *    distributed-FS round-trip. Right for local mode and short loops,
  *    but blocks die with their executor: on a real cluster an executor
  *    loss mid-loop kills the job (lineage is truncated, nothing can be
  *    recomputed).
  *  - `spark.graft.checkpointDir=<path>`: RELIABLE checkpoints — frames
  *    are written to the (fault-tolerant) directory and survive executor
  *    loss; the job recovers by re-reading, not recomputing. The
  *    production setting for long iterative jobs on preemptible fleets;
  *    costs one distributed-FS write per round.
  *
  * The switch is a session conf so a cluster job enables it without a
  * code change; all iterative ops route through [[cutLineage]].
  */
object Checkpoints {

  /** Session conf key: set to a fault-tolerant directory (HDFS/object
    * store on a cluster; any path locally) to switch iterative ops from
    * localCheckpoint to reliable checkpoints. */
  val DirKey = "spark.graft.checkpointDir"

  /** Session conf key: PLAN-AUDIT SEAM, test-only. When "true", [[cut]]
    * is a no-op, so a query's FULL declarative plan — including the
    * subtrees normally executed eagerly behind a localCheckpoint — is
    * visible to `optimizedPlan` walkers (BenchContractSpec's broadcast
    * and global-window pins). Never set it for real runs: iterative ops
    * rely on the cut to keep round-over-round plans bounded. */
  val NoCutKey = "spark.graft.noCut"

  /** Materialize `df` and cut its lineage using the configured strategy. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(NoCutKey).contains("true")) return df
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // respect a checkpoint dir the session already configured;
        // otherwise point the context at the configured one once
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** `.cutLineage()` postfix form so call sites read like the
    * `.localCheckpoint()` they replace. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
  }
}
