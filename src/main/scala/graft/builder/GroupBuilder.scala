package graft.builder

import graft.query.MongoFilter
import graft.store.Store
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental many→one grouped merge (reference `GroupBuilder`,
  * `builders/group_builder.py:18-236`).
  *
  * Semantics reproduced:
  *  - ids to process = source keys not yet covered by the target's plural
  *    `{key}s` membership arrays, ∪ `newer_in` delta, ∪ failed retries
  *    (`group_builder.py:183-212`) — all as distributed set algebra
  *    (`explode` + anti-join), never driver-side python sets
  *  - pending ids resolve to their distinct grouping-key tuples; whole
  *    groups are then re-fetched and re-merged (`group_builder.py:214-236`)
  *  - each output doc carries: target key = min(source key) of the group
  *    (the reference takes `keys[0]`; min pins determinism), the plural
  *    `{key}s` sorted membership array (`group_builder.py:66,146`),
  *    `max(last_updated)`, `state`, `_bt` (`group_builder.py:142-155`)
  *
  * The merge itself is declarative: a map of output column → aggregation
  * expression over the grouped docs (`agg`), so the whole build is one
  * shuffle on the grouping keys with partial (map-side) aggregation —
  * the shape that survives 100 TB. A `collect_list(struct(*))`-based
  * doc-function plane is available via `aggExprs = GroupBuilder.collectDocs`.
  */
class GroupBuilder(
    val source: Store,
    val target: Store,
    val groupingKeys: Seq[String],
    val aggExprs: Seq[Column],
    val criteria: Option[String] = None,
    val retryFailed: Boolean = false)
  extends Builder {

  private def spark = source.spark
  private def pluralKeys = s"${source.key}s"

  private def scopedSource: DataFrame =
    criteria.map(c => MongoFilter(source.df, c)).getOrElse(source.df)

  /** Source keys needing (re)processing (`group_builder.py:183-212`). */
  def pendingIds(): DataFrame = {
    val srcKeys = scopedSource.select(col(source.key))
    val processed: DataFrame =
      if (target.df.columns.contains(pluralKeys))
        target.df.select(explode(col(pluralKeys)).alias(source.key))
      else spark.emptyDataFrame.withColumn(source.key, lit(null)).limit(0)

    var pending = srcKeys.join(processed, Seq(source.key), "left_anti")

    // newer_in fast path: docs updated since the target's GLOBAL high
    // watermark — reference-faithful (group_builder.py:183-212 uses the
    // same store-level watermark): an update whose lu is out-of-order
    // below the global max is missed, exactly as in the reference; use
    // MapBuilder's exhaustive per-key delta when that matters
    target.lastUpdated.foreach { lu =>
      val updated = scopedSource
        .filter(col(source.lastUpdatedField) > lit(lu))
        .select(col(source.key))
      pending = pending.unionByName(updated)
    }
    if (retryFailed && target.df.columns.contains("state")) {
      val failed = target.df.filter(col("state") === "failed")
        .select(explode(col(pluralKeys)).alias(source.key))
      pending = pending.unionByName(failed)
    }
    pending.distinct()
  }

  /** Whole groups touching any pending id (distinct grouping tuples →
    * left-semi re-fetch, `group_builder.py:214-236`). */
  def pendingItems(): DataFrame = {
    val src = scopedSource
    val pendingTuples = src
      .join(pendingIds(), Seq(source.key), "left_semi")
      .select(groupingKeys.map(col): _*).distinct()
    src.join(pendingTuples, groupingKeys, "left_semi")
  }

  def run(): BuildReport = {
    val items = pendingItems()
    val aggs = Seq(
      min(col(source.key)).alias(target.key),
      sort_array(collect_list(col(source.key))).alias(pluralKeys),
      max(col(source.lastUpdatedField)).alias(source.lastUpdatedField)
    ) ++ aggExprs
    val out = items.groupBy(groupingKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("state", lit("successful"))
      .withColumn("_bt", current_timestamp())
    // materialize once: the report count and the upsert write are separate
    // actions; without this the whole group-agg (the expensive part of the
    // build) would execute twice (see MapBuilder.run for the full note)
    val mat = out.localCheckpoint(true)
    val processed = mat.count()
    if (processed > 0) target.update(mat, Seq(target.key))
    mat.unpersist()
    BuildReport(processed, 0)
  }
}

object GroupBuilder {
  /** The doc-plane merge: materialize each group's docs as an array of
    * structs (the reference hands `list[dict]` to `unary_function`). */
  def collectDocs(columns: Seq[String]): Seq[Column] =
    Seq(collect_list(struct(columns.map(col): _*)).alias("docs"))
}
