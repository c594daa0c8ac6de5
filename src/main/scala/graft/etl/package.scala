package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object etl {

  /** Numeric extrinsic/event index from a `"block-idx"` id string.
    * Latest-wins windows MUST tie-break on this, never the raw string:
    * lexicographically `"5-9" > "5-10"`, so a stale `addProxy` at
    * extrinsic 9 would beat a later `removeProxy` at extrinsic 10 in
    * the same block. */
  def idIdx(id: Column): Column = split(id, "-").getItem(1).cast("long")

  /** Call path `"0_1_10"` as an int array: Spark orders array columns
    * element-wise, which is exactly numeric document order, whereas the
    * raw string puts `"0_1_10"` before `"0_1_9"`. */
  def callPathKey(id: Column): Column =
    transform(split(id, "_"), x => x.cast("int"))
}
