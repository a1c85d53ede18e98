package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers that make query results bit-identical to a DuckDB oracle.
  *
  * Floating-point sums are order-dependent: a 32-partition Spark partial
  * aggregate and a single-threaded DuckDB scan would disagree in the last
  * ulps. We therefore sum money-like doubles through exact DECIMAL
  * arithmetic (the inputs are 2-decimal money values, so DECIMAL(18,2) is
  * lossless) and cast the exact result back to double — deterministic on
  * both engines regardless of partitioning. This also holds at 1000
  * executors: decimal aggregation is associative and exact.
  */
object QueryKit {
  /** Exact sum of a 2-decimal money column, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of revenue-style product: price * (1 - discount). */
  def revSum(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2))))
      .cast(DoubleType)

  /** Exact mean: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column =
    dsum(c) / count(lit(1))

  /** Round for genuinely float-valued outputs (corr, var, sin, …) where a
    * few ulps of cross-engine noise is expected; 6 dp keeps the comparison
    * stable while far above the ~1e-12 noise floor. */
  def r6(c: Column): Column = round(c, 6)

  def r4(c: Column): Column = round(c, 4)

  /** Portable multiplicative-hash permutation key over an integer id —
    * the deterministic-shuffle discipline (q_corpus_shuffle, mixture
    * materialization, CurateRun). `id % P` first keeps the product
    * inside 63 bits; the map is a bijection mod the prime, so ranking
    * by it IS a permutation. Identical text renders identically in
    * Spark SQL and DuckDB, so the ONE definition serves both engines —
    * keep every consumer on this helper or the shuffles silently
    * diverge. */
  def idHash(idCol: String = "doc_id"): String =
    s"$idCol % 1000000007 * 2654435761 % 1000000007"

  /** Oracle-side fragments (DuckDB SQL) mirroring the helpers above. */
  object sql {
    def dsum(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
    def revSum(price: String, discount: String): String =
      s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"
    def davg(c: String): String =
      s"(${dsum(c)} / COUNT(*))"
  }
}
