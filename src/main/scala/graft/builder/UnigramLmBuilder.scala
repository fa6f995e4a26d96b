package graft.builder

import graft.query.MongoFilter
import graft.store.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/update a PERSISTED unigram language model — the train-once/
  * score-batches split of [[graft.ext.TextAnalysis.unigramLogProb]],
  * following the reference's incremental-build contract (process only
  * what's new, `core/store.py:239-275`) like every other builder plane.
  *
  * The vocabulary lives in `vocab` as one row per token:
  * `(tok, c, <lastUpdatedField>)` with `c` the corpus count. At 100 TB
  * the vocabulary is a training ARTIFACT, not a per-query subplan —
  * [[graft.ext.TextAnalysis.unigramLogProb]] rebuilds it on every call,
  * which is right for ad-hoc analysis and wrong for a quality-filter
  * pass that scores every new crawl batch under a frozen-ish
  * distribution. This builder makes the vocabulary incremental:
  *
  *  - **newer_in discipline (S10)**: the watermark is the vocab store's
  *    own max `lastUpdatedField`; a run counts ONLY source docs with
  *    `source.lastUpdatedField` strictly above it. A repeat run over an
  *    unchanged corpus reports 0 and writes nothing.
  *  - **count MERGE, not last-write-wins**: batch counts join the
  *    persisted counts token-keyed (both sides partition on `tok` — NO
  *    broadcast assumption; a 100 TB-corpus vocabulary is billions of
  *    rows) and the summed rows upsert. Only TOUCHED tokens are
  *    written: with a delta-write ParquetStore the vocab update is an
  *    O(batch-vocabulary) parquet append, never a corpus-vocabulary
  *    rewrite (pinned in RunnerStreamingSpec).
  *
  * Scoring against the persisted counts is
  * [[graft.ext.TextAnalysis.scoreWithVocab]] — a token-keyed join, same
  * no-broadcast shape. Both sides ride the compiled
  * [[graft.functions.TermCounts]] kernel, so exchanges carry one row per
  * (doc, distinct term), not one row per token.
  *
  * Report semantics: docs EXAMINED this run (the incremental contract's
  * measure), matching DedupBuilder/AnnIndexBuilder. */
class UnigramLmBuilder(
    val source: Store,
    val vocab: Store,
    val textField: String,
    val criteria: Option[String] = None)
  extends Builder {

  private def scoped: DataFrame =
    criteria.map(c => MongoFilter(source.df, c)).getOrElse(source.df)

  /** Untrained = no rows yet (schema-on-write stores read as
    * zero-column frames before the first write). */
  private def vocabEmpty: Boolean = {
    val df = vocab.df
    df.columns.isEmpty || !df.columns.contains("tok") || df.isEmpty
  }

  /** Max source-lu the vocab has absorbed — type-agnostic (stores key
    * their lu on timestamps, longs or string ids across the suite), so
    * the raw scalar feeds a `>` filter instead of Store.lastUpdated's
    * Timestamp cast. One-row agg: bounded by contract. */
  private def watermark: Option[Any] = {
    val df = vocab.df
    if (vocabEmpty || !df.columns.contains(vocab.lastUpdatedField)) None
    else df.agg(max(col(vocab.lastUpdatedField))).collect().headOption
      .flatMap(r => Option(r.get(0)))
  }

  /** Docs newer than the vocab watermark (all docs on the first run). */
  def pendingItems(): DataFrame = watermark match {
    case Some(wm) => scoped.filter(col(source.lastUpdatedField) > lit(wm))
    case None     => scoped
  }

  def run(): BuildReport = {
    // spread-checkpointed: the tokenize+count kernel is CPU-dense per
    // doc and must not inherit a 2-split scan (Builder.spreadCheckpoint)
    val batch = Builder.spreadCheckpoint(pendingItems())
    val examined = batch.count()
    if (examined == 0) { batch.unpersist(); return BuildReport(0) }
    try {
      // the new watermark = max lu of THIS batch (strictly monotone per
      // the newer_in filter); stamped on every touched token row, so
      // the vocab's max-lu always names the latest absorbed batch
      val batchLu = batch.agg(max(col(source.lastUpdatedField)))
        .collect().head.get(0)
      val counts = batch.select(
          explode(graft.functions.GraftFunctions.termCounts(
            batch.sparkSession,
            graft.ext.TextAnalysis.normTokens(col(textField)))).alias("__tc"))
        .select(col("__tc.term").alias("tok"),
          col("__tc.cnt").cast("long").alias("__bc"))
        .groupBy(col("tok")).agg(sum(col("__bc")).alias("__bc"))
      val next =
        if (vocabEmpty) counts.select(col("tok"), col("__bc").alias("c"),
          lit(batchLu).alias(vocab.lastUpdatedField))
        else {
          val existing = vocab.df.select(col("tok"),
            col("c").cast("long").alias("__old"))
          // left join: only the batch's tokens are touched; persisted
          // counts for unseen-this-batch tokens stay as they are on disk
          counts.join(existing, Seq("tok"), "left_outer")
            .select(col("tok"),
              (col("__bc") + coalesce(col("__old"), lit(0L))).alias("c"),
              lit(batchLu).alias(vocab.lastUpdatedField))
        }
      vocab.update(next, Seq("tok"))
      BuildReport(examined)
    } finally batch.unpersist()
  }
}
