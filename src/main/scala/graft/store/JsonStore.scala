package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JSON-file-backed store (reference `JSONStore`,
  * `stores/mongolike.py:606-791`): one or many JSON / JSONL / .gz files;
  * `\$date` / `\$oid` BSON-JSON wrappers surfaced as timestamp / string
  * columns; optional write-back when `readOnly = false`.
  *
  * Reading delegates entirely to Spark's JSON source (multiLine for
  * document arrays, native .gz codec, schema merge across files — the
  * heterogeneous-documents property of SURVEY §1.1 falls out of Spark's
  * JSON schema inference: absent keys become nulls).
  */
class JsonStore(
    val spark: SparkSession,
    val paths: Seq[String],
    val key: String = "task_id",
    override val lastUpdatedField: String = "last_updated",
    val multiLine: Boolean = true,
    val readOnly: Boolean = true)
  extends Store {

  val name: String = s"json:${paths.mkString(",")}"

  private var overlay: Option[DataFrame] = None  // post-update contents

  /** Durable write-back location (reference rewrites the source file on
    * every update when writable, `stores/mongolike.py:743-766`; we write
    * a JSONL sibling instead of mutating the input mid-lineage — a
    * reopened store reads it in preference to the originals). */
  private def overlayDir = paths.head + ".graft"

  private def overlayExists: Boolean =
    new java.io.File(overlayDir, "_SUCCESS").exists()

  // The JSON writer renders timestamps as ISO strings; schema inference on
  // re-read would demote them to plain strings (breaking lastUpdated /
  // newerIn). Persist the writer-side schema as an underscore-prefixed
  // sidecar (ignored by Spark's file listing, like _SUCCESS) and read the
  // overlay with it.
  private def overlaySchemaFile = new java.io.File(overlayDir, "_schema.json")

  private def raw: DataFrame =
    if (overlayExists) {
      if (overlaySchemaFile.exists()) {
        val schemaJson = new String(
          java.nio.file.Files.readAllBytes(overlaySchemaFile.toPath), "UTF-8")
        val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.read.schema(schema).json(overlayDir)
      } else spark.read.json(overlayDir)
    } else spark.read.option("multiLine", multiLine).json(paths: _*)

  /** Unwrap BSON extended-JSON: `{f: {"$date": iso}}` → timestamp column,
    * `{f: {"$oid": hex}}` → string (reference `stores/mongolike.py:719`,
    * `utils.py:81-103`). Detected structurally from the inferred schema. */
  def df: DataFrame = overlay.getOrElse {
    val d = raw
    d.schema.fields.foldLeft(d) { (acc, f) =>
      f.dataType match {
        case s: org.apache.spark.sql.types.StructType
          if s.fieldNames.sameElements(Array("$date")) =>
          acc.withColumn(f.name, to_timestamp(col(s"`${f.name}`.`$$date`")))
        case s: org.apache.spark.sql.types.StructType
          if s.fieldNames.sameElements(Array("$oid")) =>
          acc.withColumn(f.name, col(s"`${f.name}`.`$$oid`"))
        case _ => acc
      }
    }
  }

  private def persist(next: DataFrame): Unit = {
    val snap = next.localCheckpoint(true) // sever lineage from overlayDir
    // the replaced snapshot's blocks are dead weight: any frame handed
    // out before this write was already invalid (its overlay files are
    // about to be overwritten), so free the old checkpoint now instead
    // of waiting for GC + ContextCleaner
    overlay.foreach(_.unpersist())
    overlay = Some(snap)
    snap.coalesce(1).write.mode(SaveMode.Overwrite).json(overlayDir)
    java.nio.file.Files.write(
      overlaySchemaFile.toPath, snap.schema.json.getBytes("UTF-8"))
  }

  override def update(docs: DataFrame, keyFields: Seq[String] = Seq(key)): Unit = {
    require(!readOnly, s"JsonStore $name is read-only")
    persist(Store.upsertPlan(df, docs, keyFields))
  }

  override def removeDocs(criteria: String): Unit = {
    require(!readOnly, s"JsonStore $name is read-only")
    val t = df
    persist(t.filter(!coalesce(
      graft.query.MongoFilter.compile(criteria, Some(t.schema)), lit(false))))
  }

  override def removeKeys(keys: DataFrame): Unit = {
    require(!readOnly, s"JsonStore $name is read-only")
    persist(df.join(keys.select(col(keys.columns.head).alias(key)),
      Seq(key), "left_anti"))
  }
}

/** Read-only store over an arbitrary DataFrame or parquet path — the
  * adapter that lets every engine operator run over the TESTDATA tables
  * or any externally-produced DataFrame. */
class TableStore(
    val spark: SparkSession,
    data: => DataFrame,
    val name: String,
    val key: String,
    override val lastUpdatedField: String = "last_updated")
  extends Store {
  def df: DataFrame = data
  override def update(docs: DataFrame, keyFields: Seq[String]): Unit =
    throw new UnsupportedOperationException(s"TableStore $name is read-only")
  override def removeDocs(criteria: String): Unit =
    throw new UnsupportedOperationException(s"TableStore $name is read-only")
  override def removeKeys(keys: DataFrame): Unit =
    throw new UnsupportedOperationException(s"TableStore $name is read-only")
}

object TableStore {
  def parquet(spark: SparkSession, path: String, key: String,
              lastUpdated: String = "last_updated"): TableStore =
    new TableStore(spark, spark.read.parquet(path), s"parquet:$path", key, lastUpdated)
}
