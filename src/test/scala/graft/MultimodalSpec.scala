package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("media table carries binary payloads with consistent metadata") {
    val mt = Multimodal.mediaTable(spark, SparkSuite.sf)
    assert(mt.schema("payload").dataType.typeName === "binary")
    // n_bytes metadata must equal actual payload length for every row
    assert(mt.filter(octet_length(col("payload")) =!= col("n_bytes"))
      .count() === 0)
  }

  test("decode stage output matches a driver-side recomputation") {
    val feats = Multimodal.extractFeatures(spark, SparkSuite.sf)
      .filter(col("doc_id") < 5).collect().sortBy(_.doc_id)
    val docs = Tables.documents(spark, SparkSuite.sf)
      .filter(col("doc_id") < 5)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    feats.foreach { f =>
      val bytes = docs(f.doc_id).getBytes("UTF-8")
      assert(f.n_bytes === bytes.length.toLong)
      assert(f.n_frames === (bytes.length + 255) / 256)
      val mean = bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
      assert(math.abs(f.mean_byte - mean) < 1e-12)
      assert(f.first_byte === (bytes(0) & 0xff))
      val thumb = bytes.indices.collect {
        case i if i % 4 == 0 => (bytes(i) & 0xff).toLong
      }
      assert(f.thumb_bytes === thumb.length)
      assert(math.abs(f.thumb_mean - thumb.sum.toDouble / thumb.length) < 1e-12)
    }
  }

  test("decode stage preserves partitioning (no repartition/shuffle)") {
    val ds = Multimodal.extractFeatures(spark, SparkSuite.sf)
    val plan = ds.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"decode stage should be shuffle-free, got:\n$plan")
  }

  test("codec seam: a plugged codec replaces the stub; open() runs once " +
    "per partition") {
    val opens = spark.sparkContext.longAccumulator("codec-opens")
    val decodes = spark.sparkContext.longAccumulator("codec-decodes")
    // a "real" codec stand-in: constant features, counts its lifecycle
    val codec = new Multimodal.MediaCodec {
      override def open(): Unit = opens.add(1)
      override def decode(r: Multimodal.MediaRecord) = {
        decodes.add(1)
        Multimodal.MediaFeatures(r.doc_id, r.fmt, r.n_bytes,
          n_frames = 1, mean_byte = 42.0, first_byte = 7,
          thumb_bytes = 0, thumb_mean = 0.0)
      }
    }
    val ds = Multimodal.extractFeatures(spark, SparkSuite.sf, codec)
    val rows = ds.collect()
    val parts = ds.rdd.getNumPartitions
    assert(rows.nonEmpty && rows.forall(f =>
      f.mean_byte == 42.0 && f.first_byte == 7 && f.n_frames == 1),
      "the plugged codec's features must flow through unchanged")
    assert(decodes.value === rows.length.toLong,
      "decode must run exactly once per record")
    // collect() ran the decode stage once; open() fires per partition.
    // (The rdd.getNumPartitions probe above does not execute the map.)
    assert(opens.value === parts.toLong,
      s"open() ran ${opens.value} times for $parts partitions")
  }
}
