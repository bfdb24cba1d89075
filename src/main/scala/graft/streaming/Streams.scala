package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming surface — SURVEY.md §2.8.
  *
  * The reference's "streaming" is an Airflow cron + existence-check
  * micro-batch (`save_nyc_data_to_s3.py:54-78`). These are the
  * streaming-native equivalents: exactly-once incremental file ingestion
  * (checkpoint-tracked, subsuming the head-object/skip branch), watermarked
  * event-time aggregation, and a custom stateful sessionizer via
  * flatMapGroupsWithState (the custom-state extension point).
  *
  * Scale notes: the file source lists and checkpoints file names — state is
  * O(files), not O(rows); windowed aggregation state is bounded by the
  * watermark horizon × group cardinality; the sessionizer keeps one small
  * state record per active key and emits+evicts on event-time timeout.
  */
object Streams {

  /** Incremental exactly-once ingestion: process whatever files have arrived
    * under `srcDir` since the last checkpoint, append to `destDir`, stop.
    * Run per schedule tick — the reference's monthly DAG run
    * (`save_nyc_data_to_s3.py:51-56`) becomes one AvailableNow drain. */
  def ingestAvailableNow(spark: SparkSession, srcDir: String, schema: StructType,
      destDir: String, checkpoint: String): StreamingQuery = {
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Watermarked tumbling-window counts/sums per event type — the streaming
    * twin of [[graft.ops.Events.q60WindowTumbling]] (same expressions, plus
    * the watermark bounding state and late data). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Input/state/output records for the custom sessionizer. */
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastMicros: Long, n: Long,
      sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState: one state
    * record per active user; a session closes (and emits) when event time
    * passes last-event + gap, enforced with an event-time timeout against
    * the watermark. This is the §2.8 custom-state path — session_window
    * covers the declarative case ([[graft.ops.Events.q62Sessionize]]); this
    * operator is the template for logic session_window cannot express
    * (e.g. value-dependent gaps, per-session running features). */
  def sessionize(events: Dataset[Ev], gapMinutes: Long = 30)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    // Full µs precision: Timestamp.getTime only carries milliseconds; the
    // sub-ms part lives in getNanos. Dropping it would make the streaming
    // sessionizer disagree with the µs-exact batch q62 on near-gap events.
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, toTs(s.start),
              toTs(s.lastMicros + gapMicros), s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.value))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t < s.lastMicros + gapMicros =>
                  cur = Some(s.copy(lastMicros = math.max(s.lastMicros, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(user, toTs(s.start),
                    toTs(s.lastMicros + gapMicros), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // round UP to ms: flooring could fire the timeout up to 999 µs
              // before the true session end and split a session the batch
              // operator merges
              state.setTimeoutTimestamp((s.lastMicros + gapMicros + 999L) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
