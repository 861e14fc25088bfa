package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout (round-4 addition, SURVEY §2d) — the
  * lakehouse file-clustering technique for multi-dimensional filter
  * pruning: interleaving the bits of two sort keys gives a single
  * 1-D order in which points close in BOTH dimensions land close
  * together, so parquet min/max stats prune files for predicates on
  * EITHER column (a plain sort only prunes its leading column).
  *
  * The z-value is pure integer bit arithmetic — codegen'd, exact, and
  * engine-reproducible (the DuckDB oracle replays the same shifts).
  *
  * Scale: computing the z-value is a narrow projection; laying data
  * out is `repartitionByRange(zv)` (one range-partitioned shuffle —
  * the same cost as any global sort-write) + a within-partition sort
  * that parquet turns into tight per-file min/max envelopes on BOTH
  * dimensions.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: a's bit i lands at position 2i+1, b's at 2i.
    * 16+16 bits cover cardinalities to 65k per dimension; the result
    * fits a long up to bits = 31. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduceLeft(_ + _)
  }

  /** Round-robin Morton interleave of N non-negative integer columns:
    * column j's bit i lands at position `i*N + (N-1-j)`, so the
    * 2-column form coincides with [[zValue]]. `bits * N` must fit a
    * long (≤ 63); at 16 bits that covers 3 dimensions, the compact
    * caller scales bits down for wider keys. */
  def zValueN(cs: Seq[Column], bits: Int = 16): Column = {
    require(cs.nonEmpty, "zValueN needs at least one column")
    require(bits >= 1 && bits * cs.size <= 63,
      s"bits * columns must fit a long, got $bits * ${cs.size}")
    val n = cs.size
    val ls = cs.map(_.cast("long"))
    (for { i <- 0 until bits; (c, j) <- ls.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
    ).reduceLeft(_ + _)
  }

  /** The same interleave as DuckDB SQL over expressions `a`, `b`. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString("(", " + ", ")")

  /** Range-partition on the z-value and sort within partitions — the
    * write-side layout step. Each output partition (→ parquet file)
    * covers a compact z-range, i.e. a tight bounding box in (a, b). */
  def layoutByZ(df: DataFrame, a: Column, b: Column, numPartitions: Int,
      bits: Int = 16): DataFrame = {
    val withZ = df.withColumn("zv", zValue(a, b, bits))
    withZ.repartitionByRange(numPartitions, col("zv"))
      .sortWithinPartitions(col("zv"))
  }

  /** [[layoutByZ]] over N columns via [[zValueN]]. */
  def layoutByZN(df: DataFrame, cs: Seq[Column], numPartitions: Int,
      bits: Int = 16): DataFrame = {
    val withZ = df.withColumn("zv", zValueN(cs, bits))
    withZ.repartitionByRange(numPartitions, col("zv"))
      .sortWithinPartitions(col("zv"))
  }
}
