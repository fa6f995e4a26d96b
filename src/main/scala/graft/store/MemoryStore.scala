package graft.store

import graft.query.MongoFilter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-memory writable store (reference `MemoryStore`,
  * `stores/mongolike.py:506-603`): the DataFrame-native equivalent of a
  * mongomock collection. Used for tests and as builder scratch targets.
  *
  * Writes rebuild the plan (upsert = anti-join + union) and cache the
  * result; an empty store starts with no schema and adopts the first
  * batch's schema (maggma stores are schema-on-write).
  */
class MemoryStore(
    val spark: SparkSession,
    val name: String = "memory",
    val key: String = "task_id",
    override val lastUpdatedField: String = "last_updated")
  extends Store {

  private var current: Option[DataFrame] = None
  // true when `current` is a checkpoint THIS store created (mutation
  // paths) — only those may be unpersisted on replacement; a load()ed
  // frame belongs to the caller, who may have persisted it themselves
  private var ownsCurrent: Boolean = false
  private val generation = new java.util.concurrent.atomic.AtomicLong(0)
  // lineage nonce: a bare generation counter restarts at small integers
  // on every fresh instance, so a DURABLE consumer of the token (the
  // CurateBuilder facts fingerprint, a clean-pair marker sidecar) could
  // collide a restarted store's token with the one it stamped under
  // different content (ADVICE r15). The per-instance nonce makes tokens
  // unique per store lineage — exactly the lifetime of the contents.
  private val nonce = java.util.UUID.randomUUID().toString.take(8)

  def df: DataFrame = current.getOrElse(spark.emptyDataFrame)

  override private[graft] def contentToken: String =
    s"$nonce:${generation.get()}"

  def isEmpty: Boolean = current.isEmpty

  /** Replace contents wholesale (connect-time load). */
  def load(data: DataFrame): this.type = {
    if (ownsCurrent) current.foreach(_.unpersist())
    current = Some(data); ownsCurrent = false
    generation.incrementAndGet(); this
  }

  override def update(docs: DataFrame, keyFields: Seq[String] = Seq(key)): Unit = {
    val next = current match {
      case None => Store.dedupLastWins(docs, keyFields)
      case Some(t) => Store.upsertPlan(t, docs, keyFields)
    }
    // materialize eagerly: update() must be visible to subsequent reads
    // and must not grow an unbounded lazy plan across many updates
    val materialized = next.localCheckpoint(true)
    replace(materialized)
  }

  override def removeDocs(criteria: String): Unit = current.foreach { t =>
    replace(t.filter(!coalesce(MongoFilter.compile(criteria, Some(t.schema)),
                               lit(false))).localCheckpoint(true))
  }

  override def removeKeys(keys: DataFrame): Unit = current.foreach { t =>
    replace(t.join(keys.select(col(keys.columns.head).alias(key)),
      Seq(key), "left_anti").localCheckpoint(true))
  }

  /** Fused remove+upsert as ONE checkpointed plan (see
    * [[Store.updateRemoveKeys]]) — one materialization pass instead of
    * two over the whole store. */
  override def updateRemoveKeys(docs: DataFrame, removals: DataFrame,
                                keyFields: Seq[String] = Seq(key)): Unit =
    current match {
      case None => update(docs, keyFields)
      case Some(t) =>
        val cleaned = t.join(
          removals.select(col(removals.columns.head).alias(key)),
          Seq(key), "left_anti")
        replace(Store.upsertPlan(cleaned, docs, keyFields).localCheckpoint(true))
    }

  /** Swap in the freshly-checkpointed contents and free the replaced
    * snapshot's blocks — a long foreachBatch loop of update() calls must
    * hold ONE generation of blocks, not every generation until GC. Like
    * every durable store whose files rotate on write, a frame handed out
    * before a mutation is invalid after it (mongomock semantics: cursors
    * don't span writes). Only store-owned checkpoints are freed: a
    * `load`ed frame belongs to the caller. */
  private def replace(next: DataFrame): Unit = {
    val old = if (ownsCurrent) current else None
    current = Some(next)
    ownsCurrent = true
    generation.incrementAndGet()
    old.foreach(_.unpersist())
  }
}
