package graft.builder

import graft.ext.{Dedup, Sampling, TextAnalysis}
import graft.query.MongoFilter
import graft.store.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline as ONE builder — the
  * chain a real pretraining-data user runs, composed from the engine's
  * own stage operators in their production order:
  *
  *   1. C4 cleaning gate ([[TextAnalysis.c4Filters]]): line-level
  *      retention + page-level drops; downstream stages see the CLEANED
  *      text, exactly like the reference pipeline feeds filtered text
  *      forward (reference `builders/map_builder.py`'s chained-builder
  *      idiom; C4 rules per Raffel et al. 2020 §2.2).
  *   2. Gopher heuristic gate ([[TextAnalysis.gopherRules]]) over the
  *      cleaned text (Rae et al. 2021 §A1.1).
  *   3. Model-based quality gate: score against a PERSISTED
  *      [[QualityClfBuilder]]-layout count model (`(bucket, c0, c1)`),
  *      keep docs with `q_score > clfThreshold` — the CCNet/LLaMA-style
  *      classifier stage. Skipped when no model store is wired.
  *   4. Exact content dedup: first doc (by key) per cleaned-text hash
  *      survives — a `groupBy(hash).agg(min_by(...))` whose map-side
  *      partial aggregation collapses duplicates BEFORE the exchange,
  *      so a boilerplate page duplicated 10⁷× at 100 TB ships one
  *      pre-reduced row per map task to the reducer instead of
  *      serializing every copy through a single hot task (the
  *      row-number-window spelling it replaces did exactly that).
  *   5. Decontamination ([[Dedup.decontaminate]]): drop docs sharing
  *      any `deconNgram`-token window with the eval store (Lee et al.
  *      2022 / GPT-3 appendix C). Skipped when no eval store is wired.
  *   6. Weighted mix ([[Sampling.weightedMix]]): per-stratum
  *      deterministic hash sampling — pushdown-friendly single filter.
  *   7. Sequence packing ([[Sampling.packSequences]]): distributed
  *      prefix sums assign each survivor its `(pack_id, pack_offset)`.
  *
  * Target rows: `(key, stratum, n_tokens, pack_id, pack_offset)` — the
  * data-loader manifest. SNAPSHOT semantics: the chain is corpus-global
  * (dedup group minima and pack prefix sums shift when any upstream doc
  * changes), so [[run]] rewrites the manifest and, with `deleteOrphans`
  * (default ON here, unlike the incremental builders), removes target
  * keys that no longer survive. Scale shape: stages 1–3 and 6 are
  * shuffle-free scan-speed projections/filters; the only exchanges are
  * the dedup hash shuffle, the decon gram aggregate, and the pack range
  * shuffle — nothing is all-pairs and nothing collects to the driver.
  */
class CurateBuilder(
    val source: Store,
    val target: Store,
    val model: Option[Store] = None,
    val eval: Option[Store] = None,
    val textField: String = "text",
    val stratumField: String = "lang",
    val minLineWords: Int = 3,
    val minWords: Int = 20,
    val clfThreshold: Double = 0.0,
    val clfBuckets: Int = 1024,
    val clfFamily: String = "md5",
    val clfSeed: Int = 0,
    val deconNgram: Int = 13,
    val mixRates: Map[String, Double] = Map.empty,
    val mixDefaultRate: Double = 1.0,
    val mixFamily: String = "md5",
    val mixSeed: Int = 0,
    val seqLen: Long = 2048,
    val criteria: Option[String] = None,
    val deleteOrphans: Boolean = true)
  extends Builder {

  private def scoped: DataFrame =
    criteria.map(c => MongoFilter(source.df, c)).getOrElse(source.df)

  /** The chain is a full-corpus snapshot: everything scoped is pending. */
  def pendingItems(): DataFrame = scoped

  /** The curated manifest as a plan (inspect/test hook):
    * `(key, stratum, n_tokens, pack_id, pack_offset)` — no caching, so
    * repeated actions re-execute the chain; [[run]] uses the persisted
    * variant. */
  def curated(): DataFrame = chain(identity)

  /** The chain with a caller-supplied hook at the post-dedup point —
    * the narrowest frame every downstream consumer reads. Downstream
    * holds FOUR executions of everything above it (decontaminate's
    * gram leg + its anti-join leg, packSequences' prefix pass + the
    * output pass), so [[run]] persists here: re-running the cleaned/
    * gated/deduped chain 4x is strictly worse than one
    * MEMORY_AND_DISK materialization of the survivors at any scale. */
  private def chain(mid: DataFrame => DataFrame): DataFrame = {
    val key = source.key
    // 1. C4: gate on the page rules, feed the CLEANED text forward
    val c4 = TextAnalysis.c4Filters(col(textField), minLineWords)
    val cleaned = scoped
      .select(col(key), col(stratumField), c4.alias("__c4"))
      .filter(col("__c4").getField("keep"))
      .select(col(key), col(stratumField),
        col("__c4").getField("clean").alias("__clean"))
    // 2. Gopher heuristics over the cleaned text
    val gophered = cleaned.filter(
      TextAnalysis.gopherRules(col("__clean"), minWords).getField("passes"))
    // 3. model-based quality gate (persisted NB counts; the 4-dp
    // rounded score is the gate input on BOTH engine and oracle)
    val qualified = model.filter(_.df.columns.contains("bucket")) match {
      case Some(m) =>
        val counts = m.df.select(col("bucket"),
          col("c0").cast("long").alias("c0"),
          col("c1").cast("long").alias("c1"))
        val keep = graft.ext.QualityClassifier
          .score(gophered, key, "__clean", counts, clfBuckets, clfFamily, clfSeed)
          .filter(col("q_score") > clfThreshold).select(col(key))
        gophered.join(keep, Seq(key), "left_semi")
      case None => gophered
    }
    // 4. exact dedup on the cleaned content: min key per hash wins.
    // min_by over groupBy(hash), NOT a row_number window — partial
    // aggregation collapses duplicate groups map-side, so hot hashes
    // (mega-duplicated boilerplate) reduce before the exchange instead
    // of streaming every copy through one reducer task
    val deduped = mid(qualified
      .groupBy(md5(col("__clean").cast("binary")).alias("__h"))
      .agg(min_by(struct(col(key), col(stratumField), col("__clean")),
        col(key)).alias("__w"))
      .select(col(s"__w.$key").alias(key),
        col(s"__w.$stratumField").alias(stratumField),
        col("__w.__clean").alias("__clean")))
    // 5. decontaminate vs the eval store's text (any shared window drops)
    val deconed = eval.filter(e => e.df.columns.contains(e.key)) match {
      case Some(e) =>
        Dedup.decontaminate(deduped,
          e.df.select(col(e.key).alias(key),
            col(textField).alias("__clean")),
          key, "__clean", deconNgram)
      case None => deduped
    }
    // 6. training-mix dial — one pushdown filter, no shuffle
    val mixed =
      if (mixRates.isEmpty && mixDefaultRate >= 1.0) deconed
      else Sampling.weightedMix(deconed, stratumField, key, mixRates,
        mixDefaultRate, family = mixFamily, seed = mixSeed)
    // 7. pack into fixed-length sequences by key order
    Sampling.packSequences(
        mixed.withColumn("__nt", TextAnalysis.tokenCount(col("__clean"))),
        orderCol = key, tokensCol = "__nt", seqLen = seqLen)
      .select(col(key), col(stratumField), col("__nt").alias("n_tokens"),
        col("pack_id"), col("pack_offset"))
  }

  def run(): BuildReport = {
    // persist the post-dedup survivors (see chain) and materialize the
    // manifest once for its own consumers (write + orphan diff + count)
    var handle: Option[DataFrame] = None
    val out = chain { d =>
      val p = d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      handle = Some(p)
      p
    }.localCheckpoint(true)
    try {
      val kept = out.count()
      // upsert keyed by the TARGET's key: a spec may wire a target whose
      // key column differs from the source's — merging on source.key
      // there would dedup on a column the target is not keyed by and the
      // orphan sweep's columns-contains guard would silently skip
      val keyed =
        if (source.key == target.key) out
        else out.withColumnRenamed(source.key, target.key)
      target.update(keyed, Seq(target.key))
      val orphans =
        if (deleteOrphans && target.df.columns.contains(target.key)) {
          val stale = target.df.select(col(target.key))
            .join(out.select(col(source.key).alias(target.key)),
              Seq(target.key), "left_anti")
            .localCheckpoint(true)
          try {
            val n = stale.count()
            if (n > 0) target.removeKeys(stale)
            n
          } finally stale.unpersist()
        } else 0L
      BuildReport(kept, 0, orphans)
    } finally {
      out.unpersist()
      handle.foreach(_.unpersist())
    }
  }
}
