package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

package object ops {
  /** The oracle-determinism sum (README "Determinism contract"): sum doubles
    * as DECIMAL(18,scale), cast back to double. Decimal addition is exact
    * and associative, so the result is bit-identical on any partitioning and
    * in the DuckDB oracle. Single definition — the scale/precision choice
    * must change in lockstep with every oracle SQL's CAST, so keep it here.
    */
  private[graft] def decSum(c: Column, scale: Int, precision: Int = 18): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")
}
