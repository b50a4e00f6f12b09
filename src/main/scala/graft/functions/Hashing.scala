package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * A 60-bit unsigned hash from the first 15 hex chars of md5. Chosen over
  * xxhash64/murmur3 because DuckDB computes the identical value
  * (`('0x' || substr(md5(x), 1, 15))::BIGINT`), so every hash-derived
  * operator (minhash, simhash, LSH bucketing, fingerprinting) is
  * verifiable against a SQL oracle bit-for-bit. md5 is codegen'd in
  * Spark (`org.apache.spark.sql.catalyst.expressions.Md5`), so this
  * stays inside WholeStageCodegen.
  */
object Hashing {
  /** Column form: 60-bit hash of the UTF-8 bytes of `c`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Seeded form: independent hash families via a seed prefix. */
  def md5Long(seed: Int, c: Column): Column =
    md5Long(concat(lit(s"$seed:"), c.cast("string")))

  /** SQL-expression fragment computing the same hash, for use inside
    * higher-order-function lambdas (`transform`, `aggregate`).
    */
  def md5LongSql(inner: String): String =
    s"CAST(conv(substring(md5(CAST($inner AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
}
