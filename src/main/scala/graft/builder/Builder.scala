package graft.builder

import org.apache.spark.sql.DataFrame

/** Build-run report (role of the reference's ReportingHandler events,
  * `utils.py:221-263`). */
case class BuildReport(
    processed: Long = 0,
    failed: Long = 0,
    orphansDeleted: Long = 0,
    /** Docs re-indexed because their source `last_updated` was newer
      * than the indexed copy's (the update half of the reference delta
      * contract) — a subset of `processed`. */
    updated: Long = 0,
    /** Mean PQ quantization error of this run's batch under the frozen
      * codebooks ([[graft.builder.AnnIndexBuilder]] only). */
    adcError: Option[Double] = None,
    /** The stored mean error of the TRAINING batch — the drift baseline. */
    trainAdcError: Option[Double] = None) {
  def successful: Long = processed - failed
  /** Codebook-staleness signal: batch error relative to training error.
    * ≫ 1 means the corpus drifted from the quantizer's training
    * distribution — time for [[graft.builder.AnnIndexBuilder.rebuild]]. */
  def adcDrift: Option[Double] =
    for { a <- adcError; t <- trainAdcError if t > 0 } yield a / t
}

/** The 3-phase ETL contract of the reference (`core/builder.py:16-151`):
  * `get_items → process_item → update_targets`, re-expressed as a single
  * declarative Spark job `read-delta → transform → upsert`.
  *
  * The reference's chunking (`chunk_size`), prechunk domain decomposition,
  * backpressure and process pools (`cli/multiprocessing.py`,
  * `cli/distributed.py`) all disappear into Spark partitioning and task
  * scheduling — there is deliberately no analogue here (SURVEY §2.6).
  */
trait Builder {
  /** The delta that would be processed (plan only — inspect/test hook). */
  def pendingItems(): DataFrame
  /** Execute: process the delta and upsert into the target(s). */
  def run(): BuildReport
}

object Builder {
  /** Eagerly checkpoint `df`, spread to core count when the
    * materialized batch carries fewer partitions. The eager checkpoint
    * inherits the source scan's split count — a single-row-group
    * parquet source checkpoints as 2 partitions at test SFs — and the
    * CPU-bound per-doc kernels the builders run downstream (md5-family
    * minhash signatures, PQ encode) are then stuck on 2 of N local
    * cores (measured: the sf0.1 signature pass dropped 6.8 s → 0.75 s
    * after the spread). At corpus scale the scan already carries
    * ≥ defaultParallelism splits and the re-checkpoint never triggers. */
  def spreadCheckpoint(df: DataFrame): DataFrame = {
    val raw = df.localCheckpoint(true)
    val par = raw.sparkSession.sparkContext.defaultParallelism
    if (raw.rdd.getNumPartitions >= par) raw
    else {
      val spread = raw.repartition(par).localCheckpoint(true)
      raw.unpersist()
      spread
    }
  }
}
