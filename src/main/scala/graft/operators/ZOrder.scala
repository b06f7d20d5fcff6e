package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) keys for multi-column file clustering.
  *
  * Range-clustering on one key ([[graft.sources.TableStore.overwriteClustered]])
  * gives row-group skipping on that key only; sorting by the interleaved
  * bit pattern of TWO keys tiles the key space, so every file covers a
  * small rectangle and min/max stats prune selective scans on EITHER
  * column. Pure bit arithmetic on longs — codegen'd, map-side.
  */
object ZOrder {

  /** Spread a 32-bit value's bits over 64 bits (one zero bit between each
    * pair) — the standard Morton spread sequence.
    */
  private def spread(c: Column): Column = {
    var x = c.cast(LongType).bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Interleaved z-key of two non-negative 32-bit columns: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1.
    */
  def zkey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
}
