package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for file
  * skipping, the 100 TB lever the TPC-H-ish date-partitioned layout can't
  * give: parquet min/max row-group stats prune a scan only when the file
  * layout makes each file's value RANGE narrow, and a linear sort on one
  * column leaves every other column's per-file range full-width. Writing
  * files in z-value order keeps BOTH interleaved dimensions locally
  * narrow, so selective predicates on either column skip most files
  * (ZOrderSpec quantifies it: a y-box query intersects a small fraction
  * of z-laid-out partitions vs ALL linearly-laid-out ones).
  *
  * The z-value is pure integer bit-interleaving (the classic
  * spread-bits multiply-free ladder), so it is portable SQL on any
  * engine — q_zorder pins bit-parity against DuckDB running the same
  * shift/mask ladder.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i.
    * Codegen-friendly: 4 shift/or/mask steps, no UDF. */
  def spread16(c: Column): Column = {
    def step(x: Column, sh: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    val m = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val a = step(m, 8, 0x00FF00FFL)
    val b = step(a, 4, 0x0F0F0F0FL)
    val d = step(b, 2, 0x33333333L)
    step(d, 1, 0x55555555L)
  }

  /** 32-bit Morton code of two 16-bit coordinates (x in even bits, y in
    * odd bits). Values beyond 16 bits must be bucketed/rank-normalized
    * by the caller first — interleaving RANKS, not raw values, is also
    * what keeps skew from collapsing the curve. */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` into `numFiles` write partitions along the z-curve:
    * range-partition on the z-value (equi-depth global ranges via Spark's
    * range partitioner sampling) then sort within partitions so parquet
    * row groups inherit the locality too. */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame =
    df.withColumn("_zv", zvalue(x, y))
      .repartitionByRange(numFiles, col("_zv"))
      .sortWithinPartitions(col("_zv"))
      .drop("_zv")
}
