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
    // salt = hash of the row PLUS its partition ordinal, so a hot key made
    // of IDENTICAL rows still spreads across salts (a row-hash alone maps
    // duplicates to one reducer). Any salt value joins correctly — the
    // small side is replicated for every salt — so per-retry salt
    // stability is not a correctness requirement for this inner join.
    val salted = left
      .withColumn("__ord", monotonically_increasing_id())
      .withColumn("__salt",
        pmod(xxhash64(struct((left.columns.map(col) :+ col("__ord")): _*)),
          lit(saltFactor.toLong)).cast("int"))
      .drop("__ord")
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
