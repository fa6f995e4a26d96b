package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality classifier — the standard fastText-style
  * curation filter: a LINEAR text classifier over HASHED unigram +
  * bigram features, trained in-engine with a train/score split
  * (reference incremental contract `core/store.py:239-275` via
  * [[graft.builder.QualityClfBuilder]]).
  *
  * The model is multinomial Naive Bayes expressed as per-feature
  * log-count-ratio weights (the NB-SVM / fastText-adjacent linear
  * form): `w_h = ln((c1_h+1)/(T1+B)) − ln((c0_h+1)/(T0+B))` with
  * add-one smoothing over `B` hash buckets, plus the class prior
  * `ln((N1+1)/(N0+1))`. A doc's score is
  * `prior + Σ_h tf_h · w_h` — positive ⇒ keep-class.
  *
  * WHY NB counts and not SGD logistic regression: the weights are a
  * PURE FUNCTION of additive counts, which buys three properties a
  * 100 TB curation pipeline needs — (1) training is ONE aggregation
  * pass (no epoch loop, no driver-synchronized gradient state),
  * (2) per-class counts MERGE additively, so the incremental builder
  * is the [[graft.builder.UnigramLmBuilder]] newer_in/count-merge
  * discipline verbatim (and label-feedback batches fold in without
  * retraining), and (3) scoring replays exactly in plain SQL (the
  * `text_quality_clf` oracle), since there is no float iteration
  * order anywhere.
  *
  * ==Scale shape==
  * HASHING BOUNDS THE MODEL: `buckets+1` rows regardless of corpus
  * vocabulary, so the score-side join is a broadcast hash join by
  * construction (the reason fastText hashes features at all). The
  * feature pass is one [[graft.functions.UniBigramTagged]] explode →
  * hash → per-(doc, bucket) count; training is the same pass
  * aggregated by (bucket, label) with a per-doc marker row carrying
  * the class priors. Per-feature weights are fixed-pointed to
  * micro-units and summed as LONGS — exact under any partial-agg
  * order (the bm25 discipline).
  *
  * Collisions are the usual hashing trade (buckets is the
  * memory/collision dial) and are IDENTICAL on both engines — the
  * oracle hashes with the same md5 spelling. */
object QualityClassifier {

  /** Marker pseudo-feature carrying per-class DOC counts through the
    * same aggregation as the token counts (bucket −1: outside
    * `[0, buckets)`, so it can never collide with a real feature). */
  private val DocMarker = "d "

  private def taggedWithMarker(spark: org.apache.spark.sql.SparkSession,
                               textCol: Column): Column =
    concat(graft.functions.GraftFunctions.uniBigramTagged(spark,
      TextAnalysis.normTokens(textCol)), array(lit(DocMarker)))

  private def bucketOf(tagged: Column, buckets: Int, family: String,
                       seed: Int): Column =
    when(tagged === DocMarker, lit(-1L))
      .otherwise(pmod(Dedup.seededHash(family, seed, tagged),
        lit(buckets.toLong)))

  /** Hashed feature counts `(idCol, bucket, tf)` — tagged unigrams and
    * adjacent bigrams of [[TextAnalysis.normTokens]], hashed into
    * `buckets` (plus the per-doc marker at bucket −1). */
  def features(df: DataFrame, idCol: String, textCol: String,
               buckets: Int = 1024, family: String = "md5",
               seed: Int = 0): DataFrame = {
    val spark = df.sparkSession
    df.select(col(idCol),
        explode(taggedWithMarker(spark, col(textCol))).alias("__t"))
      .select(col(idCol),
        bucketOf(col("__t"), buckets, family, seed).alias("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).alias("tf"))
  }

  /** Train per-bucket class counts from labeled docs:
    * `(bucket, c0, c1)` with bucket −1 carrying the per-class doc
    * counts. `labelCol` is 0 (reject) / 1 (keep). ONE corpus pass,
    * `buckets + 1` output rows. */
  def train(df: DataFrame, textCol: String, labelCol: String,
            buckets: Int = 1024, family: String = "md5",
            seed: Int = 0): DataFrame = {
    val spark = df.sparkSession
    df.select(col(labelCol).cast("int").alias("__l"),
        explode(taggedWithMarker(spark, col(textCol))).alias("__t"))
      .select(col("__l"), bucketOf(col("__t"), buckets, family, seed).alias("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__l") === 0, 1L).otherwise(0L)).alias("c0"),
        sum(when(col("__l") === 1, 1L).otherwise(0L)).alias("c1"))
  }

  /** Score docs against a trained `(bucket, c0, c1)` model (a
    * DataFrame or a persisted model store's frame): output
    * `(idCol, q_score, pred)` with `q_score` the fixed-point log-odds
    * at 4 dp and `pred` 1 when the score is positive.
    *
    * The model totals collect ONCE (bounded: one row); weights fold
    * into the `buckets`-row broadcast slice; unseen buckets score the
    * smoothed zero-count weight (true NB, via the left-join
    * coalesce). */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int = 1024, family: String = "md5",
            seed: Int = 0): DataFrame = {
    // totals: one bounded row — Σ counts over real buckets + the doc
    // counts off the marker row
    val t = model.agg(
      sum(when(col("bucket") >= 0, col("c0"))).alias("t0"),
      sum(when(col("bucket") >= 0, col("c1"))).alias("t1"),
      sum(when(col("bucket") === -1, col("c0"))).alias("n0"),
      sum(when(col("bucket") === -1, col("c1"))).alias("n1")).head()
    val t0 = t.getLong(0).toDouble + buckets
    val t1 = t.getLong(1).toDouble + buckets
    // oracle-shared spellings: ln((c+1.0)/(t+B)) per side, micro-fixed
    val priorMicro = math.floor(
      math.log((t.getLong(3) + 1.0) / (t.getLong(2) + 1.0)) * 1000000.0 + 0.5).toLong
    val missMicro = math.floor(
      (math.log(1.0 / t1) - math.log(1.0 / t0)) * 1000000.0 + 0.5).toLong
    val w = broadcast(model.filter(col("bucket") >= 0)
      .select(col("bucket"),
        floor((log((col("c1") + 1.0) / t1) - log((col("c0") + 1.0) / t0)) *
          1000000.0 + 0.5).cast("long").alias("__wl")))
    val scored = features(df, idCol, textCol, buckets, family, seed)
      .filter(col("bucket") >= 0)
      .join(w, Seq("bucket"), "left_outer")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * coalesce(col("__wl"), lit(missMicro))).alias("__s"))
    // zero-token docs still get scored (prior only): left join back
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        round((coalesce(col("__s"), lit(0L)) + priorMicro) / 1000000.0, 4)
          .alias("q_score"),
        ((coalesce(col("__s"), lit(0L)) + priorMicro) > 0).cast("int")
          .alias("pred"))
  }
}
