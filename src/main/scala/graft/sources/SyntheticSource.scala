package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
  * plan tests (the scan description exposes its residual range). */
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
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var schema: StructType = SyntheticSource.fullSchema
  // slice bounds after absorbing id predicates: [lo, hi)
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

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

  override def build(): Scan =
    new SyntheticScan(schema, math.max(lo, 0L), math.max(hi, lo), partitions)
}

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
