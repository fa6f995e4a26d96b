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
    * `buckets` (plus the per-doc marker at bucket −1).
    *
    * r16: the explode → per-tag md5 chain → `groupBy(id, bucket)`
    * SHUFFLE is replaced by the [[graft.functions.ClfBucketTf]] kernel
    * — tf counting happens inside the per-row loop, so this is now a
    * shuffle-free projection (guide §2.4). Row set is identical
    * (property-pinned against [[featuresComposable]]). */
  def features(df: DataFrame, idCol: String, textCol: String,
               buckets: Int = 1024, family: String = "md5",
               seed: Int = 0): DataFrame = {
    val spark = df.sparkSession
    df.select(col(idCol),
        explode(graft.functions.GraftFunctions.clfBucketTf(spark,
          TextAnalysis.normTokens(col(textCol)), buckets, family, seed))
          .alias("__bt"))
      .select(col(idCol), col("__bt").getField("bucket").alias("bucket"),
        col("__bt").getField("tf").alias("tf"))
  }

  /** The pre-r16 composable spelling of [[features]] — kept as the
    * executable specification the kernel is property-pinned against
    * (the TokenizeRuns/normTokensRegex discipline). */
  private[graft] def featuresComposable(df: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024, family: String = "md5",
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
    * `buckets + 1` output rows.
    *
    * r16: rides [[graft.functions.ClfBucketTf]] — the explode emits one
    * row per DISTINCT (doc, bucket) with its tf instead of one row per
    * tag occurrence, and the per-tag md5 expression chain collapses
    * into the kernel (guide §2.3: aggregate before you shuffle — the
    * per-doc tf pre-count is the map-side reduction). Σ tf per
    * (bucket, class) ≡ the per-occurrence count. */
  def train(df: DataFrame, textCol: String, labelCol: String,
            buckets: Int = 1024, family: String = "md5",
            seed: Int = 0): DataFrame = {
    val spark = df.sparkSession
    df.select(col(labelCol).cast("int").alias("__l"),
        explode(graft.functions.GraftFunctions.clfBucketTf(spark,
          TextAnalysis.normTokens(col(textCol)), buckets, family, seed))
          .alias("__bt"))
      .select(col("__l"), col("__bt").getField("bucket").alias("bucket"),
        col("__bt").getField("tf").alias("tf"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__l") === 0, col("tf")).otherwise(0L)).alias("c0"),
        sum(when(col("__l") === 1, col("tf")).otherwise(0L)).alias("c1"))
  }

  /** Scoring constants folded driver-side from a bounded count model
    * (≤ buckets+1 rows BY CONSTRUCTION — hashing bounds the model):
    * the class prior and a DENSE per-bucket micro-fixed weight table
    * with absent buckets pre-filled at the smoothed zero-count weight
    * (the left-join coalesce of the pre-r16 broadcast plan). */
  private[graft] final case class ClfModel(priorMicro: Long, weights: Array[Long])

  /** ONE bounded collect of the model (the pre-r16 plan executed the
    * model subplan twice: totals `.head()` + weight broadcast build).
    *
    * Float-spelling contract (oracle-critical): the per-bucket weight
    * replicates Spark's `floor((log((c1+1.0)/t1) − log((c0+1.0)/t0)) ·
    * 1e6 + 0.5)` — Spark's `log` evaluates via
    * `java.lang.StrictMath.log` (both codegen and interpreted), so
    * StrictMath is used here; prior/miss were always driver-side
    * `math.log` and stay so. */
  private[graft] def modelConsts(model: DataFrame, buckets: Int): ClfModel = {
    // bounded by contract: ≤ buckets+1 rows (documented collect site)
    val rows = model.select(col("bucket").cast("long"),
      col("c0").cast("long"), col("c1").cast("long")).collect()
    var t0 = 0L; var t1 = 0L; var n0 = 0L; var n1 = 0L
    rows.foreach { r =>
      val b = r.getLong(0)
      if (b >= 0) { t0 += r.getLong(1); t1 += r.getLong(2) }
      else if (b == -1) { n0 += r.getLong(1); n1 += r.getLong(2) }
    }
    val tt0 = t0.toDouble + buckets
    val tt1 = t1.toDouble + buckets
    // oracle-shared spellings: ln((c+1.0)/(t+B)) per side, micro-fixed
    val priorMicro = math.floor(
      math.log((n1 + 1.0) / (n0 + 1.0)) * 1000000.0 + 0.5).toLong
    val missMicro = math.floor(
      (math.log(1.0 / tt1) - math.log(1.0 / tt0)) * 1000000.0 + 0.5).toLong
    val w = Array.fill(buckets)(missMicro)
    rows.foreach { r =>
      val b = r.getLong(0)
      if (b >= 0 && b < buckets)
        w(b.toInt) = math.floor(
          (java.lang.StrictMath.log((r.getLong(2) + 1.0) / tt1) -
            java.lang.StrictMath.log((r.getLong(1) + 1.0) / tt0)) *
            1000000.0 + 0.5).toLong
    }
    ClfModel(priorMicro, w)
  }

  /** The raw micro-fixed log-odds column (`Σ_tag weights[bucket]` +
    * prior) — the [[graft.functions.ClfScoreMicro]] kernel; null text
    * scores the bare prior (the explode-drops-null behavior of the
    * pre-r16 plan, via the coalesce). */
  private def scoreMicroCol(spark: org.apache.spark.sql.SparkSession,
      textCol: Column, m: ClfModel, family: String, seed: Int): Column =
    coalesce(graft.functions.GraftFunctions.clfScoreMicro(spark,
      TextAnalysis.normTokens(textCol), m.weights, family, seed), lit(0L)) +
      m.priorMicro

  /** The 4-dp rounded `q_score` column against pre-collected constants
    * — for inlining the classifier gate into a scan-side FILTER
    * (guide §2.4: the [[graft.builder.CurateBuilder]] stage-3 semi-join
    * becomes a plain predicate, deleting the double evaluation of the
    * C4/Gopher subtree). */
  private[graft] def qScoreCol(spark: org.apache.spark.sql.SparkSession,
      textCol: Column, m: ClfModel, family: String, seed: Int): Column =
    round(scoreMicroCol(spark, textCol, m, family, seed) / 1000000.0, 4)

  /** Score docs against a trained `(bucket, c0, c1)` model (a
    * DataFrame or a persisted model store's frame): output
    * `(idCol, q_score, pred)` with `q_score` the fixed-point log-odds
    * at 4 dp and `pred` 1 when the score is positive.
    *
    * r16 shape (guide §2.4 — remove shuffles outright): the model
    * collapses to driver constants in ONE bounded collect
    * ([[modelConsts]]) and scoring is ONE map-side projection over the
    * doc frame ([[graft.functions.ClfScoreMicro]]) — the pre-r16
    * explode → (id, bucket) aggregate → broadcast join → (id)
    * aggregate → join-back plan (2 exchanges + 2 broadcast builds +
    * double model-subplan execution) is gone. Values are bit-identical:
    * long sums reorder freely and the float spelling is replicated
    * exactly ([[modelConsts]]). */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int = 1024, family: String = "md5",
            seed: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val mc = modelConsts(model, buckets)
    val s = scoreMicroCol(spark, col(textCol), mc, family, seed)
    df.select(col(idCol),
      round(s / 1000000.0, 4).alias("q_score"),
      (s > 0).cast("int").alias("pred"))
  }
}
