package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine numeric parity helpers.
  *
  * The driver's correctness gate hash-compares Spark results against
  * DuckDB running the same ANSI SQL. Floating-point SUMs are
  * order-dependent, so any double aggregation would hash-mismatch by
  * ULPs. All money columns in the test data are exact 2-decimal
  * values, so we route aggregation through decimal arithmetic — exact
  * and associative in both engines — and cast the final result back to
  * double, which is then bit-identical on both sides.
  *
  * Mirrors the checksum discipline of the reference storage layer
  * (hdfs/protocol/DataTransferProtocol.java checksum frames;
  * DistributedFileSystem.getFileChecksum): results must be verifiable
  * bit-for-bit, independent of physical execution order.
  */
object Parity {
  /** Money/quantity column as exact decimal. (15,2) covers all test
    * magnitudes (max ~5e5) with headroom for 100-TB-scale sums left to
    * Spark's sum() precision widening (+10 digits). */
  def m(c: Column): Column = c.cast(DecimalType(15, 2))

  /** Small-ratio column (discount/tax, |x| < 100) as exact decimal.
    * Kept narrow so triple products stay within decimal(38,_) in both
    * Spark and DuckDB. */
  def pct(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum surfaced as a bit-stable double. */
  def sumM(c: Column): Column = sum(m(c)).cast(DoubleType)

  /** Order-independent average: exact decimal sum / count. */
  def avgM(c: Column): Column = sum(m(c)).cast(DoubleType) / count(lit(1))

  def avgPct(c: Column): Column = sum(pct(c)).cast(DoubleType) / count(lit(1))

  // Matching DuckDB SQL fragments (string side of the parity contract).
  def mSql(c: String): String = s"CAST($c AS DECIMAL(15,2))"
  def pctSql(c: String): String = s"CAST($c AS DECIMAL(4,2))"
  def sumMSql(c: String): String = s"CAST(SUM(${mSql(c)}) AS DOUBLE)"
  def avgMSql(c: String): String = s"CAST(SUM(${mSql(c)}) AS DOUBLE) / COUNT(*)"
  def avgPctSql(c: String): String = s"CAST(SUM(${pctSql(c)}) AS DOUBLE) / COUNT(*)"
}
