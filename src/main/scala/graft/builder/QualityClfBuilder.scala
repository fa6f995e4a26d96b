package graft.builder

import graft.query.MongoFilter
import graft.store.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/update a PERSISTED hashed-ngram quality classifier — the
  * train-once/score-batches split of [[graft.ext.QualityClassifier]],
  * following the reference's incremental-build contract (process only
  * what's new, `core/store.py:239-275`) exactly like
  * [[UnigramLmBuilder]] (same watermark, same count-merge, same
  * O(batch) delta write — here the "vocabulary" is the bounded bucket
  * table, ≤ buckets+1 rows).
  *
  * The model lives in `model` as one row per hash bucket:
  * `(bucket, c0, c1, <lastUpdatedField>)` — per-class feature counts,
  * bucket −1 carrying the per-class DOC counts (the prior). Because
  * NB counts merge ADDITIVELY, a labeled-feedback batch (fresh human
  * labels, a new crawl slice) folds into the persisted model without
  * retraining — the property that makes a count-based linear
  * classifier the right quality-filter shape at 100 TB.
  *
  *  - **newer_in discipline (S10)**: the watermark is the model
  *    store's own max `lastUpdatedField`; a run counts ONLY source
  *    docs strictly above it. A repeat run over an unchanged corpus
  *    reports 0 and writes nothing.
  *  - **count MERGE, not last-write-wins**: batch counts left-join the
  *    persisted counts bucket-keyed and the summed rows upsert — only
  *    TOUCHED buckets are written.
  *
  * Scoring against the persisted counts is
  * [[graft.ext.QualityClassifier.score]] over `model.df` — the
  * broadcast-by-construction join (the model is bucket-bounded).
  *
  * Report semantics: docs EXAMINED this run, matching the other
  * incremental builders. */
class QualityClfBuilder(
    val source: Store,
    val model: Store,
    val textField: String,
    val labelField: String,
    val buckets: Int = 1024,
    val family: String = "md5",
    val seed: Int = 0,
    val criteria: Option[String] = None)
  extends Builder {

  private def scoped: DataFrame =
    criteria.map(c => MongoFilter(source.df, c)).getOrElse(source.df)

  private def modelEmpty: Boolean = {
    val df = model.df
    df.columns.isEmpty || !df.columns.contains("bucket") || df.isEmpty
  }

  /** Max source-lu the model has absorbed (type-agnostic scalar — the
    * UnigramLmBuilder watermark contract). One-row agg by contract. */
  private def watermark: Option[Any] = {
    val df = model.df
    if (modelEmpty || !df.columns.contains(model.lastUpdatedField)) None
    else df.agg(max(col(model.lastUpdatedField))).collect().headOption
      .flatMap(r => Option(r.get(0)))
  }

  /** Docs newer than the model watermark (all docs on the first run). */
  def pendingItems(): DataFrame = watermark match {
    case Some(wm) => scoped.filter(col(source.lastUpdatedField) > lit(wm))
    case None     => scoped
  }

  def run(): BuildReport = {
    // spread-checkpointed: the tokenize+hash kernel is CPU-dense per
    // doc and must not inherit a 2-split scan
    val batch = Builder.spreadCheckpoint(pendingItems())
    val examined = batch.count()
    if (examined == 0) { batch.unpersist(); return BuildReport(0) }
    try {
      val batchLu = batch.agg(max(col(source.lastUpdatedField)))
        .collect().head.get(0)
      val counts = graft.ext.QualityClassifier.train(batch, textField,
        labelField, buckets, family, seed)
        .withColumnRenamed("c0", "__b0").withColumnRenamed("c1", "__b1")
      val next =
        if (modelEmpty)
          counts.select(col("bucket"), col("__b0").alias("c0"),
            col("__b1").alias("c1"), lit(batchLu).alias(model.lastUpdatedField))
        else {
          val existing = model.df.select(col("bucket"),
            col("c0").cast("long").alias("__o0"),
            col("c1").cast("long").alias("__o1"))
          counts.join(existing, Seq("bucket"), "left_outer")
            .select(col("bucket"),
              (col("__b0") + coalesce(col("__o0"), lit(0L))).alias("c0"),
              (col("__b1") + coalesce(col("__o1"), lit(0L))).alias("c1"),
              lit(batchLu).alias(model.lastUpdatedField))
        }
      model.update(next, Seq("bucket"))
      BuildReport(examined)
    } finally batch.unpersist()
  }

  /** Score docs against the PERSISTED counts. */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ext.QualityClassifier.score(df, idCol, textCol,
      model.df.select(col("bucket"), col("c0").cast("long").alias("c0"),
        col("c1").cast("long").alias("c1")), buckets, family, seed)
}
