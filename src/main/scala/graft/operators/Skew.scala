package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the manual fallback when AQE's skew-join splitting can't apply (e.g.
  * the skewed side feeds a co-grouped computation). The skewed side gets a
  * deterministic per-row salt; the small side is replicated `saltFactor`
  * times, so one hot key spreads over `saltFactor` reducers.
  */
object Skew {

  /** Inner equi-join on `key` with the left (skewed) side salted. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt: hash of the full row (stable across retries,
    // unlike rand()) — identical rows share a salt, which is acceptable
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
