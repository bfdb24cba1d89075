package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 deterministic synthetic-row generator — the custom-source
  * path of SURVEY §2.1 done as a first-class Catalyst citizen rather than a
  * parallelized driver loop. `spark.read.format("graft.sources.SyntheticSource")
  * .option("rows", n).option("partitions", p)` yields
  *
  *   id     BIGINT  — 0 until rows
  *   bucket INT     — ((id·2654435761) mod 1000000007) mod 100
  *   val    BIGINT  — (id·31 + 7) mod 997
  *
  * pure functions of `id`, so the frame is reproducible by any engine that
  * can enumerate a range (the DuckDB oracle uses `range(n)`) and the scan
  * is embarrassingly parallel: each InputPartition owns a contiguous id
  * slice and generates rows locally — zero I/O, zero driver involvement,
  * the same planning shape Spark's own `range()` uses, which is what lets
  * a 10¹²-row synthetic load test run on 1000 executors without a seed
  * file.
  *
  * Pushdown is real, not advertised: [[SupportsPushDownRequiredColumns]]
  * narrows the generated columns (an unread `bucket` is never computed) and
  * [[SupportsPushDownFilters]] absorbs >, >=, <, <=, = predicates on `id`
  * into the slice bounds — a filtered scan generates exactly the surviving
  * id range instead of generating-then-discarding. Both are asserted by
  * plan tests (the scan description exposes its residual range).
  *
  * [[SupportsPushDownAggregates]] completes the V2 pushdown trio: an
  * ungrouped COUNT(*) / COUNT(id) / MIN(id) / MAX(id) over the (already
  * filter-narrowed) slice has a CLOSED FORM — n = hi−lo, lo, hi−1 — so the
  * scan answers it in one row without generating anything. Complete
  * pushdown: the Aggregate node disappears from the plan entirely. This
  * is the same contract parquet footers serve for MIN/MAX/COUNT, taken to
  * its logical end by a source that knows its own algebra; any aggregate
  * outside the supported set (sums, grouped, on computed columns) is
  * declined and runs the normal path. */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyntheticTable()
}

object SyntheticSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", LongType, nullable = false)))

  def bucketOf(id: Long): Int = (((id * 2654435761L) % 1000000007L) % 100L).toInt
  def valOf(id: Long): Long = (id * 31L + 7L) % 997L
}

private class SyntheticTable extends Table with SupportsRead {
  override def name(): String = "synthetic"
  override def schema(): StructType = SyntheticSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("partitions", 8))
}

private class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var schema: StructType = SyntheticSource.fullSchema
  // slice bounds after absorbing id predicates: [lo, hi)
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  // when an aggregation is completely pushed: output schema + the one row
  private var aggResult: Option[(StructType, Seq[Any])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // after a complete aggregate pushdown the scan's schema is the
    // aggregate output, not a subset of the table columns
    if (aggResult.isEmpty) schema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = absorbed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def refsId(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case r: NamedReference => r.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def isId(f: AggregateFunc): Boolean = f match {
    case m: Min       => refsId(m.column)
    case m: Max       => refsId(m.column)
    case c: Count     => refsId(c.column) && !c.isDistinct
    case _: CountStar => true
    case _            => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall(isId)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    // filter pushdown has already run (V2ScanRelationPushDown order), so
    // [lo, hi) is final — the closed forms answer over the residual slice
    val l = math.max(lo, 0L)
    val h = math.max(hi, l)
    val n = h - l
    val fields = agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, false)
      case (_: Count, i)     => StructField(s"agg_$i", LongType, false)
      case (_, i)            => StructField(s"agg_$i", LongType, true)
    }
    val values: Seq[Any] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => n
      case _: Count     => n // ids are generated non-null
      case _: Min       => if (n > 0) l else null
      case _: Max       => if (n > 0) h - 1 else null
    }
    aggResult = Some((StructType(fields), values))
    true
  }

  override def build(): Scan = aggResult match {
    case Some((aggSchema, row)) => new SyntheticAggScan(aggSchema, row)
    case None =>
      new SyntheticScan(schema, math.max(lo, 0L), math.max(hi, lo), partitions)
  }
}

/** One-partition, one-row scan carrying a completely-pushed-down aggregate
  * result. */
private class SyntheticAggScan(schema: StructType, row: Seq[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"SyntheticAggScan[${row.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var served = false
          override def next(): Boolean = { val r = !served; served = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(
            p.asInstanceOf[SyntheticAggPartition].row)
          override def close(): Unit = ()
        }
    }
}

private case class SyntheticAggPartition(row: Seq[Any]) extends InputPartition

private class SyntheticScan(schema: StructType, lo: Long, hi: Long,
    partitions: Int) extends Scan with Batch {
  override def readSchema(): StructType = schema
  // surfaces the residual range in `explain` so tests can assert the
  // pushdown actually narrowed generation
  override def description(): String = s"SyntheticScan[lo=$lo, hi=$hi]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    val p = math.max(1, math.min(partitions.toLong, n).toInt)
    (0 until p).map { i =>
      SyntheticPartition(
        lo + i * n / p, lo + (i + 1) * n / p,
        schema.fieldNames): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory()
}

private case class SyntheticPartition(start: Long, end: Long,
    cols: Array[String]) extends InputPartition

private class SyntheticReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow = {
        val vals = new ArrayBuffer[Any](sp.cols.length)
        sp.cols.foreach {
          case "id"     => vals += id
          case "bucket" => vals += SyntheticSource.bucketOf(id)
          case "val"    => vals += SyntheticSource.valOf(id)
        }
        InternalRow.fromSeq(vals.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
