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

  /** RETIRED session conf key, kept only so [[cut]] can fail fast on it.
    * The plan-audit seam used to be this conf; a conf travels in copied
    * cluster configs, and a stray `spark.graft.noCut=true` would turn
    * the CORRECTNESS-load-bearing cut in `Scale.globalRank` /
    * `globalCumSum` into a no-op — executed queries would return
    * silently shifted ranks near range-partition boundaries (the exact
    * live corruption the cut fixed). The seam is now [[withNoCut]], a
    * code-only dynamic scope no config file can set. */
  val NoCutKey = "spark.graft.noCut"

  private val noCutScope = new scala.util.DynamicVariable[Boolean](false)

  /** PLAN-AUDIT SEAM, test-only. Inside `body`, [[cut]] is a no-op, so a
    * query's FULL declarative plan — including the subtrees normally
    * executed eagerly behind a localCheckpoint — is visible to
    * `optimizedPlan` walkers (BenchContractSpec's broadcast and
    * global-window pins). Plans BUILT inside the scope must be
    * inspected, never executed: iterative ops rely on the cut both to
    * keep round-over-round plans bounded and, in globalRank/globalCumSum,
    * to pin one sampled range-boundary set for two consumers. Thread-
    * scoped by construction — a copied cluster config cannot enable it. */
  def withNoCut[T](body: => T): T = noCutScope.withValue(true)(body)

  /** Materialize `df` and cut its lineage using the configured strategy. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    require(spark.conf.getOption(NoCutKey).isEmpty,
      s"$NoCutKey is set but no longer honored: the no-cut plan-audit " +
        "seam is code-only (Checkpoints.withNoCut) because executing an " +
        "uncut plan silently corrupts globalRank/globalCumSum offsets. " +
        "Unset the conf; tests wrap construction in withNoCut instead.")
    if (noCutScope.value) return df
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
