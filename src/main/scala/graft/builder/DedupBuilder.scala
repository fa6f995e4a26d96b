package graft.builder

import graft.ext.Dedup
import graft.query.MongoFilter
import graft.store.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup build: write the canonical (duplicate-free) view of `source`
  * into `target` — the extension stack surfaced through the builder/
  * Runner plane, so a pipeline spec can declare deduplication like any
  * other build step.
  *
  * `method`:
  *  - `"exact"` / `"fingerprint"` — hash-group duplicates, keep min id
  *  - `"minhash"` — MinHash+LSH near-dup pairs → connected components →
  *    min-id survivor per cluster ([[Dedup.keepCanonical]])
  *  - `"simhash"` / `"ngram"` — same, over the respective pair producers
  *
  * The write follows the standard builder shape: the output plan is
  * materialized once (localCheckpoint), the report count reads the
  * cached blocks, and the upsert consumes them (see MapBuilder.run).
  */
class DedupBuilder(
    val source: Store,
    val target: Store,
    val textField: String,
    val method: String = "minhash",
    val threshold: Double = 0.7,
    val criteria: Option[String] = None)
  extends Builder {

  private def scoped: DataFrame =
    criteria.map(c => MongoFilter(source.df, c)).getOrElse(source.df)

  /** The candidate set for this build — the (scoped) source corpus. */
  def pendingItems(): DataFrame = scoped

  def run(): BuildReport = {
    val kept: DataFrame = method match {
      case "exact" | "fingerprint" =>
        val groups =
          if (method == "exact") Dedup.exact(scoped, source.key, textField)
          else Dedup.byFingerprint(scoped, source.key, textField)
        // losers = every group member except the canonical min id
        val losers = groups.select(explode(col("ids")).alias(source.key), col("keep"))
          .filter(col(source.key) =!= col("keep")).select(source.key)
        scoped.join(losers, Seq(source.key), "left_anti")
      case "minhash" =>
        Dedup.keepCanonical(scoped,
          Dedup.minhashLsh(scoped, source.key, textField, threshold = threshold),
          source.key)
      case "simhash" =>
        Dedup.keepCanonical(scoped,
          Dedup.simhashPairs(scoped, source.key, textField), source.key)
      case "ngram" =>
        Dedup.keepCanonical(scoped,
          Dedup.ngramJaccardPairs(scoped, source.key, textField,
            threshold = threshold),
          source.key)
      case other => throw new IllegalArgumentException(
        s"unknown dedup method: $other (exact|fingerprint|minhash|simhash|ngram)")
    }
    val mat = kept.localCheckpoint(true)
    val processed = mat.count()
    if (processed > 0) target.update(mat, Seq(target.key))
    mat.unpersist()
    BuildReport(processed, 0)
  }
}
