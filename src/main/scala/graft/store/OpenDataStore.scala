package graft.store

import graft.query.MongoFilter
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** C10-C12 `OpenDataStore` (reference `stores/open_data.py:455-794`):
  * data laid out as compressed JSONL under Hive-style `field=value/`
  * partition paths (`object_grouping`, `open_data.py:615-620`), plus a
  * manifest index (`open_data.py:388-426`).
  *
  * Spark mapping — this backend is where the reference's hand-rolled
  * machinery becomes *native*:
  *  - the `field=value/` object layout IS Spark partition discovery;
  *    criteria on grouping fields prune partitions at planning time
  *    (the reference loops over groups and issues per-prefix reads,
  *    `open_data.py:600-613` — Catalyst's `PartitionFilters` does this)
  *  - per-partition read-merge-write updates (`open_data.py:511-546`)
  *    become dynamic partition overwrite of exactly the touched groups
  *  - `manifest.jsonl` is regenerated from the written layout
  *
  * gzip JSONL matches the reference's `.jsonl.gz` objects byte-format;
  * at cluster scale the same class works over `s3a://` paths unchanged.
  */
class OpenDataStore(
    val spark: SparkSession,
    val root: String,
    val objectGrouping: Seq[String],
    val key: String = "task_id",
    override val lastUpdatedField: String = "last_updated")
  extends Store {

  require(objectGrouping.nonEmpty, "objectGrouping must name partition columns")
  val name: String = s"opendata:$root"

  private def dataPath = s"$root/data"
  private def manifestPath = s"$root/manifest.jsonl"

  // Hadoop FS, not java.io: the class contract says s3a:// roots work
  // unchanged, and local-FS probes would silently treat an object-store
  // instance as empty (the update path would then overwrite-lose data)
  private def hadoopFs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isEmpty: Boolean = {
    val path = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hadoopFs(dataPath)
    // ignore marker files: a remove-all overwrite leaves only _SUCCESS,
    // and treating that as "non-empty" would make every later read fail
    // schema inference — the store must read as empty instead
    !fs.exists(path) || fs.listStatus(path).forall { s =>
      val n = s.getPath.getName; n.startsWith("_") || n.startsWith(".")
    }
  }

  def df: DataFrame =
    if (isEmpty) spark.emptyDataFrame
    // inferTimestamp: the JSONL round-trip writes timestamps as ISO
    // strings; without it last_updated re-reads as string and the
    // watermark machinery (lastUpdated/newerIn) breaks on types
    else spark.read.option("inferTimestamp", "true").json(dataPath)

  override def update(docs: DataFrame, keyFields: Seq[String] = Seq(key)): Unit = {
    val next =
      if (isEmpty) Store.dedupLastWins(docs, keyFields)
      else {
        // merge only the partitions the batch touches: the batch's own
        // grouping tuples PLUS the current partitions of the batch's
        // keys — a doc whose grouping value changed must have its OLD
        // copy rewritten out of its previous partition, or both copies
        // would survive (key-uniqueness corruption)
        val d = df
        val batchTouched = docs.select(objectGrouping.map(col): _*).distinct()
        val movedFrom = d.join(docs.select(col(key)), Seq(key), "left_semi")
          .select(objectGrouping.map(col): _*).distinct()
        val touched = batchTouched.unionByName(movedFrom).distinct()
        val current = d.join(touched, objectGrouping, "left_semi")
        // sever lineage: the merged plan reads the files the dynamic
        // overwrite below replaces
        Store.upsertPlan(current, docs, keyFields).localCheckpoint(true)
      }
    next.write
      .mode(SaveMode.Overwrite)
      .partitionBy(objectGrouping: _*)
      // per-write scope: don't mutate the session-global overwrite mode
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "gzip")
      .json(dataPath)
    storeManifest()
  }

  override def removeDocs(criteria: String): Unit = if (!isEmpty) {
    val d = df
    val keep = d.filter(!coalesce(MongoFilter.compile(criteria, Some(d.schema)), lit(false)))
      .localCheckpoint(true) // sever lineage from the files being overwritten
    keep.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy(objectGrouping: _*).option("compression", "gzip").json(dataPath)
    storeManifest()
  }

  override def removeKeys(keys: DataFrame): Unit = if (!isEmpty) {
    val keep = df.join(keys.select(col(keys.columns.head).alias(key)), Seq(key), "left_anti")
      .localCheckpoint(true)
    keep.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy(objectGrouping: _*).option("compression", "gzip").json(dataPath)
    storeManifest()
  }

  /** Manifest = one record per partition group: grouping values, doc
    * count, max last_updated (the reference's index docs,
    * `open_data.py:388-426`). */
  def manifest: DataFrame = {
    val d = df
    val luAgg: org.apache.spark.sql.Column =
      if (d.columns.contains(lastUpdatedField)) max(col(lastUpdatedField))
      else first(lit(null))
    d.groupBy(objectGrouping.map(col): _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).alias("n_docs"), luAgg.alias("last_updated"))
  }

  private def storeManifest(): Unit = {
    val rows = manifest.toJSON.collect() // one line per partition: small
    val out = hadoopFs(manifestPath)
      .create(new org.apache.hadoop.fs.Path(manifestPath), true)
    try out.write(rows.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
