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

  /** Parameters (multiplier, offset) of the i-th affine hash family over
    * Z_2^30: h_i(x) = (a_i * (x mod 2^30) + b_i) mod 2^30. MinHash needs
    * many hash functions; deriving them from ONE md5 via affine
    * transforms costs arithmetic instead of an md5 per family — an 8x
    * cut of the dominant (interpreted, non-codegen) expression cost.
    * a_i < 2^30 and x < 2^30 keep the product within BIGINT for both
    * Spark and the DuckDB oracle.
    */
  def affine(i: Int): (Long, Long) =
    (((i * 2654435761L) % 1073741824L) | 1L, (i * 40503L + 17L) % 1073741824L)

  val AffineMod: Long = 1073741824L // 2^30
}
