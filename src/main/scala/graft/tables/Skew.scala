package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation helpers. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on in every engine session) is
  * the first line of defense — it re-splits oversized shuffle partitions at
  * runtime. Salting is the explicit fallback for joins AQE cannot fix (e.g.
  * a single hot key joined against a non-broadcastable side): the big side
  * gets a random salt in [0, parts), the small side is replicated `parts`
  * times, and the join key becomes (key, salt) — turning one hot partition
  * into `parts` even ones at the cost of replicating the small side.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `bigKey = smallKey` with the hot-key
    * pressure spread over `parts` salted partitions. Exact same rows as the
    * unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 parts: Int): DataFrame = {
    // parts <= 0 would silently EMPTY the join (explode of an empty salt
    // array eliminates every small-side row) or divide by zero under
    // ANSI -- refuse loudly (review r18-6)
    require(parts >= 1, s"salt partitions must be >= 1: $parts")
    // Salt must vary PER ROW (a key-derived salt would send the whole hot
    // key to one partition again); correctness is independent of the salt
    // value, only its range matters.
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(parts.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until parts).toArray)))
    // Keys qualified via the DataFrame handles: unqualified col(...) raises
    // an ambiguous-reference AnalysisException whenever the two sides share
    // the key name (the common case) or any column name.
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
        salted(bigKey) === replicated(smallKey))
      .drop("__salt")
  }
}
