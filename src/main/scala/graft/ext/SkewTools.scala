package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one user with 10⁹ events joining a dimension): salt the skewed side
  * into `salt` sub-keys and replicate the dimension side across them.
  * AQE's skew-join split handles sort-merge cases at runtime; explicit
  * salting is the deterministic plan-level tool when the skew is known
  * (the 100 TB guardrail named in the build spec).
  */
object SkewTools {

  /** Equi-join `big` (skewed) with `small` on `key`, salted `salt` ways.
    * Results are identical to `big.join(small, key)` — the salt column
    * never leaks. `small` rows are replicated `salt`× via a generator
    * (no driver loop); at dimension sizes this stays broadcastable. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full would emit `salt` null-padded copies of unmatched
    // small-side rows — only shapes preserving small-side uniqueness
    require(Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heavy-hitter keys of a column with their counts — the
    * diagnostic that decides whether salting/AQE-skew handling is
    * needed (one pass, partial-agg). */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).alias("n"))
      .orderBy(col("n").desc, col(key).asc).limit(topN)
}
