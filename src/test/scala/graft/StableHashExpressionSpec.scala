package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{StableHash, StableHashExpression}

/** The native CharHash62 expression must be bit-identical to the HOF
  * Column-API forms (and therefore to the DuckDB oracle twins), and must
  * stay inside whole-stage codegen. */
class StableHashExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  private def strings = {
    import spark.implicits._
    (Seq("", "a", "key agg", "the quick brown fox", "spark table value",
      "tok1 tok2", "0", "42", "répertoire", "a" * 500) ++
      (1 to 200).map(i => s"w$i w${i * 7 % 31}")).toDF("s")
  }

  test("native charPoly62/charMix62 are bit-identical to the HOF forms") {
    val df = strings.select(
      StableHashExpression.charPoly62(col("s")).as("np"),
      StableHash.charPoly62(col("s")).as("hp"),
      StableHashExpression.charMix62(col("s")).as("nm"),
      StableHash.charMix62(col("s")).as("hm"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1), "charPoly62 parity")
      assert(r.getLong(2) === r.getLong(3), "charMix62 parity")
    }
  }

  test("SQL registration: char_poly62/char_mix62 resolve and agree") {
    strings.createOrReplaceTempView("hash_probe")
    val rows = spark.sql(
      """SELECT char_poly62(s) AS p, char_mix62(s) AS m FROM hash_probe""")
      .collect()
    val expect = strings.select(
      StableHashExpression.charPoly62(col("s")),
      StableHashExpression.charMix62(col("s"))).collect()
    rows.zip(expect).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(1) === b.getLong(1))
    }
  }

  test("the native expression stays inside WholeStageCodegen") {
    // parquet-backed input: a local Seq would fold into LocalTableScan
    // (interpreted) and prove nothing about the codegen path
    val df = Tables.documents(spark, SparkSuite.sf)
      .select(StableHashExpression.charMix62(col("text")).as("h"))
      .filter(col("h") > 0)
    val plan = df.queryExecution.executedPlan
    assert(plan.isInstanceOf[
        org.apache.spark.sql.execution.WholeStageCodegenExec],
      s"expected the root to be a codegen stage, got:\n$plan")
    // and the codegen path actually executes (no fallback exception)
    assert(df.count() > 0)
  }
}
