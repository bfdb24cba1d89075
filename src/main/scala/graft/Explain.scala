package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * (all by default). Usage: runMain graft.Explain [sfDir] [query ...]
  *
  * What to look for (the 100 TB checklist):
  *  - filters/projections reach the scan (PushedFilters / ReadSchema);
  *  - dimension joins say BroadcastHashJoin, fact-fact joins say
  *    SortMergeJoin/ShuffledHashJoin on the intended keys;
  *  - exchanges only where a shuffle is semantically required;
  *  - operators sit inside WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("4", "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      if (n == "q04_pipeline")
        println("NOTE: q04 constructs eagerly (runs its warehouse/raw-zone " +
          "loads); the plan below is only the final read-back. Audit the " +
          "pipeline stages via ops.Pipeline.runTripPipeline directly.")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
