package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Int8 embedding quantization — the memory-bandwidth scale path for
  * similarity search (north-star tier X): 64 float32 components become 64
  * int8s, a 4× reduction in scan volume and cache footprint, which is the
  * dominant cost of a brute-force or IVF-probe pass at 10^9+ vectors.
  *
  * Symmetric per-vector scalar quantization: scale = max|x_i| / 127,
  * q_i = round(x_i / scale) ∈ [-127, 127]. For COSINE the per-vector scale
  * cancels out of the ratio entirely, so the quantized similarity is
  * Σq_a·q_b / (√Σq_a² · √Σq_b²) — all-integer sums (exact in any engine,
  * any partitioning, no float accumulation order to pin down) with a single
  * IEEE division at the end. That makes the quantized path MORE
  * deterministic than the float path, and fully oracle-checkable.
  *
  * Scale notes: quantization is pure map work (codegen'd HOFs, no shuffle);
  * storage-form output is array<tinyint> so parquet writes 1 byte/dim. The
  * scoring shape mirrors q75 (broadcast query set, linear scan) — swap in
  * the IVF/LSH bucketing from q74/q76 unchanged when N demands it.
  */
object Quantize {

  /** Quantized form of a float-array column, as integers (compute form).
    * No zero-vector guard: scale 0 would put NaN in every component, and
    * the embeddings fixture contains no zero vectors — a production corpus
    * would filter them before quantizing (they have no cosine direction). */
  def quantizeInt(emb: Column): Column = {
    val scale = aggregate(transform(emb, x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x)) / lit(127.0)
    transform(emb, x => round(x.cast("double") / scale).cast("int"))
  }

  /** Storage form: array<tinyint> — 1 byte per dimension in parquet. */
  def quantizeInt8(emb: Column): Column =
    transform(quantizeInt(emb), x => x.cast("tinyint"))

  /** Cosine of two int-array columns: exact long sums, one final division. */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    def dot(u: Column, v: Column) =
      aggregate(zip_with(u, v, (x, y) => (x * y).cast("long")),
        lit(0L), (acc, x) => acc + x)
    dot(qa, qb).cast("double") /
      (sqrt(dot(qa, qa).cast("double")) * sqrt(dot(qb, qb).cast("double")))
  }

  /** q78_quantized_topk — brute-force top-5 per query (vec_id < 5) over the
    * int8-quantized corpus: the q75 baseline run at a quarter of the memory
    * traffic. Rank agreement with q75 is measured in SimilaritySpec. */
  def q78QuantizedTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), quantizeInt(col("embedding")).as("qv"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("qcos"), col("cand_id"))
    e.select(col("vec_id").as("cand_id"), col("qv"))
      .crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(quantizedCosine(col("qq"), col("qv")), 4).as("qcos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val q78Sql: String =
    """WITH qz AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(
      |           CAST(x AS DOUBLE) /
      |           (list_max(list_transform(embedding,
      |              y -> abs(CAST(y AS DOUBLE)))) / 127.0)) AS BIGINT))
      |           AS qv
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 5),
      |p AS (
      |  SELECT q.query_id, e.vec_id AS cand_id,
      |         unnest(e.qv) AS x, unnest(q.qq) AS y
      |  FROM qz e, q WHERE e.vec_id <> q.query_id),
      |s AS (
      |  SELECT query_id, cand_id,
      |         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 4)
      |           AS qcos
      |  FROM p GROUP BY query_id, cand_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |            ORDER BY qcos DESC, cand_id) AS rank
      |  FROM s)
      |SELECT query_id, cand_id, qcos, rank FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
}
