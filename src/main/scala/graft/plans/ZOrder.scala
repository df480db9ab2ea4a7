package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Morton (Z-order) interleaving of two integer dimensions — the
  * multi-dimensional clustering key behind data-skipping layouts
  * (Delta/Iceberg OPTIMIZE ZORDER BY, the classic linearization from
  * Morton 1966). Sorting a table by the interleaved key co-locates
  * rows close in BOTH dimensions, so per-file min/max statistics prune
  * scans filtered on either one — the layout a 100 TB table wants when
  * two columns share the filter load and neither deserves the whole
  * sort order.
  *
  * The interleave is the standard mask-ladder bit spread (no loops, no
  * UDF): a pure integer expression, codegen'd by Spark and replayable
  * by the DuckDB oracle. One fragment builder renders both dialects —
  * only the shift syntax differs (Spark `shiftleft(e, n)`, DuckDB
  * `e << n`) — so the two engines compute literally the same formula.
  */
object ZOrder {

  /** Interleave masks: after each (shift, mask) step the bits of the
    * 16-bit input spread one level further apart.
    */
  private val Ladder = List(
    (8, 16711935L),    // 0x00FF00FF
    (4, 252645135L),   // 0x0F0F0F0F
    (2, 858993459L),   // 0x33333333
    (1, 1431655765L))  // 0x55555555

  /** SQL fragment spreading the low 16 bits of `e` to even bit
    * positions; `shl` renders a left shift in the target dialect.
    */
  private def spread(e: String, shl: (String, Int) => String): String =
    Ladder.foldLeft(s"(($e) & 65535)") { case (acc, (n, mask)) =>
      s"(($acc | ${shl(acc, n)}) & $mask)"
    }

  /** 32-bit Morton code of the low 16 bits of two BIGINT expressions,
    * as a SQL fragment in the dialect selected by `shl`.
    */
  def fragment(x: String, y: String, shl: (String, Int) => String): String =
    s"(${spread(x, shl)} | ${shl(spread(y, shl), 1)})"

  /** Spark column computing the Morton code of two integer columns. */
  def morton(x: String, y: String): Column =
    expr(fragment(x, y, (e, n) => s"shiftleft($e, $n)"))

  /** The identical formula in DuckDB syntax, for oracle SQL. */
  def duckFragment(x: String, y: String): String =
    fragment(x, y, (e, n) => s"($e << $n)")
}
