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

  test("two native calls in one projection codegen cleanly (freshName)") {
    val sp = spark
    import sp.implicits._
    // non-nullable literal arrays emit the codegen UNBRACED — fixed local
    // names would collide across the two calls and Janino would reject the
    // generated class (falling back to interpreted execution)
    val df = Seq((1, 2)).toDF("a", "b").select(
      Similarity.cosine(
        array(lit(1.0f), lit(0.0f)), array(lit(1.0f), lit(0.0f))).as("c1"),
      Similarity.cosine(
        array(lit(0.0f), lit(1.0f)), array(lit(1.0f), lit(0.0f))).as("c2"))
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
  }

  test("native kernel throws on dimension mismatch") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val e = intercept[Exception](df.collect())
    def hasMismatch(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("dimension mismatch"))
        || hasMismatch(t.getCause))
    assert(hasMismatch(e), s"unexpected: $e")
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

  test("vector_norm is bit-identical to the aggregate-lambda form") {
    import org.apache.spark.sql.functions.aggregate
    val e = Tables.embeddings(spark, SparkSuite.sf)
    val both = e.select(
      graft.functions.VectorFunctions.vector_norm(col("embedding"))
        .as("native"),
      sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // SQL registration path resolves too
    val viaSql = spark.sql(
      "SELECT vector_norm(array(3.0F, 4.0F)) AS n").head().getDouble(0)
    assert(viaSql === 5.0)
  }
}
