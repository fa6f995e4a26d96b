package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixture operators for training-data curation
  * (north-star extensions): reproducible train/eval splits, per-stratum
  * quotas, and token-budget packing. Everything is keyed on seeded
  * hashes, never `rand()` — the same corpus and seed always yield the
  * same sample, on any cluster, in any engine (the md5 family replays
  * byte-identically in the DuckDB oracle).
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep a row iff
    * `seededHash(key) mod buckets < rate * buckets`. A pure, pushdown-
    * friendly filter — no shuffle, no state, stable under re-runs and
    * incremental appends (a doc's fate never changes as the corpus
    * grows). The complement (`hashSampleComplement`) is the disjoint
    * holdout split. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 buckets: Int = 10000, family: String = "xxh64",
                 seed: Int = 0): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val h = Dedup.seededHash(family, seed, col(keyCol).cast("string"))
    df.filter(pmod(h, lit(buckets.toLong)) < math.round(rate * buckets))
  }

  def hashSampleComplement(df: DataFrame, keyCol: String, rate: Double,
                           buckets: Int = 10000, family: String = "xxh64",
                           seed: Int = 0): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val h = Dedup.seededHash(family, seed, col(keyCol).cast("string"))
    df.filter(pmod(h, lit(buckets.toLong)) >= math.round(rate * buckets))
  }

  /** Exact per-stratum quota (stratified sample / mixture balancing):
    * the first `perStratum` rows of each stratum in deterministic
    * hash-of-key order. One shuffle on the strata columns; each
    * stratum sorts independently, so parallelism = number of strata
    * (fine for language/source mixes; for very few huge strata pre-split
    * the stratum or raise `spark.sql.shuffle.partitions`). */
  def stratified(df: DataFrame, strata: Seq[String], keyCol: String,
                 perStratum: Int, family: String = "xxh64",
                 seed: Int = 0): DataFrame = {
    val h = Dedup.seededHash(family, seed, col(keyCol).cast("string"))
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perStratum).drop("__rk")
  }

  /** Token-budget packing: order rows by `orderCol` (must be unique —
    * determinism) and keep the maximal prefix whose cumulative
    * `tokensCol` stays ≤ `budget` — "fill the training mix to N tokens".
    *
    * Scale shape: the naive `sum() OVER (ORDER BY …)` global window
    * collapses onto ONE partition. Here the prefix sum is distributed:
    * range-partition + sort by the order key (one shuffle), per-partition
    * partial sums (second pass over the persisted shuffle output reduced
    * to ONE row per partition), driver-side prefix of those partials
    * (numPartitions values — O(1) driver memory), then a single
    * streaming pass per partition adds its offset and cuts at the
    * budget. The result is partitioning-independent: it equals the
    * global-order prefix by construction. `mapPartitions` is justified
    * here (build-spec preference (d)): a running scalar carried across
    * rows of a sorted partition has no window-free declarative spelling
    * that avoids the single-partition collapse. */
  def tokenBudgetPack(df: DataFrame, orderCol: String, tokensCol: String,
                      budget: Long, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
             else spark.sessionState.conf.numShufflePartitions
    // null token counts would sum as 0 in the partials but NPE in the
    // primitive getLong below — make both passes agree on 0
    val ordered = df.withColumn(tokensCol, coalesce(col(tokensCol).cast("long"), lit(0L)))
      .repartitionByRange(np, col(orderCol).asc)
      .sortWithinPartitions(col(orderCol).asc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // partial token sums per physical partition: one tiny row each
    val partials = ordered
      .select(spark_partition_id().alias("__pid"), col(tokensCol).alias("__t"))
      .groupBy("__pid").agg(sum(col("__t")).alias("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive prefix offsets in partition-id order (range partitions —
    // even AQE-coalesced ones — are ordered by construction); iterate to
    // the max OBSERVED pid in case AQE coalesced below np
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to partials.keys.foldLeft(-1)(math.max)).map { p =>
        val o = p -> acc; acc += partials.getOrElse(p, 0L); o
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val tokIdx = ordered.schema.fieldIndex(tokensCol)
    val out = ordered.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = bc.value.getOrElse(pid, 0L)
      it.filter { row =>
        acc += row.getLong(tokIdx)
        acc <= budget
      }
    }(org.apache.spark.sql.Encoders.row(ordered.schema))
    out
  }
}
