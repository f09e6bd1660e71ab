package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by the query inventory.
  *
  * Differential testing against a DuckDB oracle requires *order-independent,
  * bit-identical* aggregates. Double summation is order-dependent, so any
  * money-style SUM first casts to an exact decimal (the generated data is
  * 2-decimal, so DECIMAL(12,2)/DECIMAL(4,2) casts are lossless), aggregates
  * exactly, and only then converts the final scalar to double. The decimal
  * widths are chosen so products never exceed precision 38 in either engine.
  * This also mirrors what a production pipeline at 100 TB should do: exact
  * decimal accumulation is deterministic across partitionings and retries.
  */
object Cols {
  /** Exact 2-decimal money column (lossless for the generated data). */
  def m2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Rate column (discount/tax in [0,1], 2 decimals). */
  def r2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Full-precision double -> fixed decimal for order-independent sums. */
  def d6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Final scalar back to double for a stable output schema. */
  def toD(c: Column): Column = c.cast("double")

  import org.apache.spark.sql.functions.{floor, lit, pmod, unix_timestamp}

  /** value → exact floor-cents (the q131/q135/q138 projection). ONE
    * definition shared by batch queries and their streaming twins — a
    * drifted private copy would silently break the online ≡ batch
    * contract the twin specs pin (the bpeFoldCase doctrine). */
  def cents(v: Column): Column = floor(v * lit(100)).cast("long")

  /** timestamp → integer epoch-day. The subtraction makes the numerator
    * exactly divisible, so the double division is exact for every sign
    * and magnitude a timestamp can hold — bit-identical to the oracles'
    * floor(epoch)//86400. */
  def epochDay(ts: Column): Column =
    ((unix_timestamp(ts) - pmod(unix_timestamp(ts), lit(86400L))) / 86400L)
      .cast("long")
}
