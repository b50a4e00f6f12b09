package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md §7.4.6).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one join key is so hot that even split
  * partitions overwhelm a task (the reference's dummy-key global
  * aggregations are the degenerate case — every row on one key). The
  * salted join spreads each hot key over `saltFactor` reducers: the big
  * side derives a deterministic salt from a row-identity column, the
  * small side replicates `saltFactor` times, and the join key becomes
  * (key, salt). Results are identical to the plain join.
  */
object Skew {
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, bigSaltSource: String): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt",
      pmod(hash(col(bigSaltSource)), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
