package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable store for probe-gated strategy decisions (VERDICT r12 #7):
  * a real pipeline spans sessions, and re-probing an UNCHANGED corpus
  * snapshot every session re-buys a measurement whose answer cannot
  * have changed. Each decision row records the corpus fingerprint it
  * was measured on plus the full probe accounting — (agree, tot) and
  * the integer threshold — so the sidecar is an audit artifact, not
  * just a cache: `q278_gate_decision` puts the same accounting under
  * the DuckDB hash gate.
  *
  * Identity model (this is the load-bearing part):
  *  - the KEY is exact, never a hash: the decision kind, the frame's
  *    CANONICALIZED logical-plan text, the seed frame's (or ""), the
  *    gate geometry (n, k), and the file INVENTORY — every input file's
  *    (path, length, modificationTime), sorted. Lookup matches ALL
  *    columns by string/long equality, so two corpora can only share a
  *    decision if they are the same computation over the same bytes.
  *  - the inventory closes ADVICE r12's memo gap: canonicalized plans
  *    compare by relation PATHS, so a fixture rewritten in place (same
  *    path, same row count) replayed a stale decision. File length +
  *    mtime change on rewrite; the key changes with them.
  *  - only FILE-BACKED frames get durable rows: an in-memory frame
  *    (LocalRelation — spec corpora) has no durable identity to key on,
  *    and its canonicalized TEXT omits the data itself, so two distinct
  *    in-memory corpora could collide. [[fingerprint]] returns None for
  *    them and callers fall back to the session-lifetime plan-equality
  *    memo, which compares full structural plans and cannot collide.
  *
  * Scale: the store is one row per (corpus snapshot, decision kind) —
  * bounded by ingestion batches, not data. Reads are a whole-table scan
  * of a KB-sized parquet; writes append one row. At 100 TB the same
  * rows would live in the warehouse's control schema.
  */
object GateStore {

  /** One recorded decision. `go` is the resolved boolean strategy;
    * `agree`/`tot` the probe accounting it was derived from; `thrNum`/
    * `thrDen` the exact integer threshold (agree·den ≥ tot·num) in
    * force; `choice` the resolved DIAL VALUE for multi-point knobs —
    * the picked nprobe for the `ivf-nprobe` kind; for the binary
    * `hier-assign-gate` kind it mirrors `go` as 1/0. */
  final case class Decision(kind: String, planCanon: String,
      seedsCanon: String, files: String, n: Long, k: Long,
      agree: Long, tot: Long, go: Boolean, thrNum: Long, thrDen: Long,
      choice: Long)

  private val schema = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("plan_canon", StringType, nullable = false),
    StructField("seeds_canon", StringType, nullable = false),
    StructField("files", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("agree", LongType, nullable = false),
    StructField("tot", LongType, nullable = false),
    StructField("go", BooleanType, nullable = false),
    StructField("thr_num", LongType, nullable = false),
    StructField("thr_den", LongType, nullable = false),
    StructField("choice", LongType, nullable = false)))

  /** The frame's durable identity: (canonicalized-plan text, sorted
    * file inventory `path:length:mtime;…`). None when the frame is not
    * file-backed (no durable identity — see the object doc). The plan
    * text pins WHAT is computed (projections, filters, quantization)
    * with normalized expression ids; the inventory pins the BYTES it
    * reads. */
  def fingerprint(df: DataFrame): Option[(String, String)] = {
    val plan = df.queryExecution.analyzed
    val files = plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty[String]
      }
    }.flatten
    if (files.isEmpty) None
    else {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val inv = files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }.mkString(";")
      Some((plan.canonicalized.toString, inv))
    }
  }

  /** The stored decision for this exact (kind, plan, seeds, files, n,
    * k) key, if any. A missing or empty store reads as None; any other
    * read failure propagates (a corrupt control table should be loud,
    * not silently re-probed around). */
  def lookup(spark: SparkSession, dir: String, kind: String,
      planCanon: String, seedsCanon: String, files: String,
      n: Long, k: Long): Option[Decision] = {
    try spark.read.schema(schema).parquet(dir)
      .filter(col("kind") === kind && col("n") === n && col("k") === k &&
        col("plan_canon") === planCanon &&
        col("seeds_canon") === seedsCanon && col("files") === files)
      .collect().headOption.map(fromRow)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
            e.getMessage.contains("Path does not exist") => None
    }
  }

  /** Append one decision row. Parquet append is atomic per file and
    * the key is collision-free, so concurrent writers at worst store
    * the same (deterministic) decision twice — lookup takes the first. */
  def record(spark: SparkSession, dir: String, d: Decision): Unit = {
    val row = Row(d.kind, d.planCanon, d.seedsCanon, d.files, d.n, d.k,
      d.agree, d.tot, d.go, d.thrNum, d.thrDen, d.choice)
    spark.createDataFrame(
        java.util.Collections.singletonList(row), schema)
      .write.mode("append").parquet(dir)
  }

  private def fromRow(r: Row): Decision = Decision(
    r.getString(0), r.getString(1), r.getString(2), r.getString(3),
    r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
    r.getBoolean(8), r.getLong(9), r.getLong(10), r.getLong(11))
}
