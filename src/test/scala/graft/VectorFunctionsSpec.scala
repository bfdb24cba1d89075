package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.ops.Similarity

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("native expression is bit-identical to the HOF composition") {
    val e = Tables.embeddings(spark, SparkSuite.sf)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Similarity.cosine(col("embedding"), col("q_emb")).as("native"),
        Similarity.cosineHof(col("embedding"), col("q_emb")).as("hof"))
    // bit-identical, not approximately equal
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("SQL registration via extensions/registry exposes vector_cosine") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT vector_cosine(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
        |                     array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))
        |""".stripMargin).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("native expression participates in whole-stage codegen") {
    // AQE materializes codegen lazily; disable it so the codegen explain
    // renders the final stages directly.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = Tables.embeddings(spark, SparkSuite.sf)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val df = e.crossJoin(broadcast(q))
        .select(Similarity.cosine(col("embedding"), col("q_emb")).as("c"))
      // the doGenCode loop body must appear in the generated Java (a
      // CodegenFallback expression would show an interpreted call instead)
      val gen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(gen.contains("WholeStageCodegen"), s"codegen:\n${gen.take(2000)}")
      assert(gen.contains("Math.sqrt"), "generated loop body missing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("native kernel is at least as fast as the HOF form (micro)") {
    val e = Tables.embeddings(spark, SparkSuite.sf)
    // self-join fan-out to get a meaningful workload (~250k kernel evals)
    val q = e.select(col("embedding").as("q_emb")).limit(500)
    val pairs = e.crossJoin(broadcast(q))
    def time(c: => Long): Double = {
      val t0 = System.nanoTime(); c; (System.nanoTime() - t0) / 1e9
    }
    // sum(c) forces kernel evaluation (count(1) would prune the column)
    def runNative() = pairs.select(
      Similarity.cosine(col("embedding"), col("q_emb")).as("c"))
      .agg(sum(col("c"))).head().getDouble(0).toLong
    def runHof() = pairs.select(
      Similarity.cosineHof(col("embedding"), col("q_emb")).as("c"))
      .agg(sum(col("c"))).head().getDouble(0).toLong
    runNative(); runHof() // warm both paths
    val tn = time(runNative())
    val th = time(runHof())
    info(f"native $tn%.3fs vs hof $th%.3fs (${th / tn}%.1fx)")
    assert(tn <= th * 1.5, f"native $tn%.3fs slower than HOF $th%.3fs")
  }
}
