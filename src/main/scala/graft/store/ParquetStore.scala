package graft.store

import graft.query.MongoFilter
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Durable keyed table over parquet with versioned-directory writes — the
  * engine's canonical store (role of the reference's `MongoStore`/
  * `MontyStore`, `stores/mongolike.py:35-433,794-938`).
  *
  * Layout: `root/v_<n>/part-*.parquet`; `root/_current` names the live
  * version. Upsert/delete write a new version then flip the pointer —
  * readers never see partial data (a poor man's Delta transaction log;
  * with Delta Lake on the cluster this class swaps to `MERGE INTO` /
  * `DELETE WHERE` with no interface change).
  *
  * Scale notes: the upsert is a key anti-join (shuffles on the key — at
  * cluster scale bucketing the table by key makes it shuffle-free); reads
  * are plain parquet scans so filter/column pushdown apply.
  */
class ParquetStore(
    val spark: SparkSession,
    val root: String,
    val key: String = "task_id",
    override val lastUpdatedField: String = "last_updated",
    val numPartitions: Int = 0)
  extends Store {

  val name: String = s"parquet:$root"
  Files.createDirectories(Paths.get(root))

  private def currentFile: Path = Paths.get(root, "_current")

  private def currentVersion: Option[String] =
    if (Files.exists(currentFile)) Some(Files.readString(currentFile).trim).filter(_.nonEmpty)
    else None

  private def dataPath: Option[String] =
    currentVersion.map(v => s"$root/$v").filter(p => Files.exists(Paths.get(p)))

  def isEmpty: Boolean = dataPath.isEmpty

  // every committed write flips `_current` to a fresh version id, so the
  // version string IS the content token (one small file read, no action)
  override private[graft] def contentToken: String = currentVersion.getOrElse("")

  def df: DataFrame = dataPath match {
    case Some(p) => spark.read.parquet(p)
    case None    => spark.emptyDataFrame
  }

  /** Fields from [[ensureIndex]]: writes lay data out range-partitioned +
    * sorted on these, so parquet row-group min/max statistics prune point
    * lookups to one group (the Mongo `_id`-index analogue). */
  @volatile private var indexKeys: Seq[String] = Nil

  /** S8 on parquet: an "index" = key-clustered layout. Recorded fields
    * re-shape every subsequent write; existing data is re-laid-out once
    * immediately (like index creation on a populated collection). */
  override def ensureIndex(field: String, unique: Boolean = false): Boolean = {
    if (!indexKeys.contains(field)) {
      indexKeys = indexKeys :+ field
      if (!isEmpty) writeVersion(df)
    }
    true
  }

  private def writeVersion(data: DataFrame): Unit = {
    val next = "v_" + (currentVersion.map(_.drop(2).toLong + 1).getOrElse(0L))
    val out =
      if (indexKeys.nonEmpty) {
        // disjoint sorted ranges: one file/row-group holds any given key
        val parts =
          if (numPartitions > 0) numPartitions
          else spark.sessionState.conf.numShufflePartitions
        data.repartitionByRange(parts, indexKeys.map(col): _*)
          .sortWithinPartitions(indexKeys.map(col): _*)
      }
      else if (numPartitions > 0) data.repartition(numPartitions, col(key))
      else data
    out.write.mode(SaveMode.Overwrite).parquet(s"$root/$next")
    val old = currentVersion
    Files.writeString(currentFile, next)
    // GC: keep the immediately-previous version so plans captured before
    // this write (and concurrent readers of it) stay scannable; only the
    // grandparent generation is deleted. A long-lived plan two writes
    // behind can still fail — snapshot with localCheckpoint for that.
    // Files.list/walk return open directory streams — close them or every
    // versioned write leaks a descriptor (fatal for long-running drivers
    // doing many incremental builds)
    old.foreach { v =>
      val keep = Set(next, v)
      val ls = Files.list(Paths.get(root))
      try ls.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v_") && !keep.contains(name)) {
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
          finally walk.close()
        }
      } finally ls.close()
    }
  }

  /** S3 estimated-count fast path (reference `stores/mongolike.py:281-285`
    * answers no-criteria counts with `estimated_document_count`, O(1)):
    * a no-criteria count is answered from the parquet FOOTER row counts —
    * driver-side metadata reads, zero Spark jobs, zero data scanned. With
    * criteria it falls back to the filtered scan. At 100 TB this is the
    * difference between a catalog lookup and a cluster-wide count job
    * (and the footer loop parallelizes trivially if the file count ever
    * warrants it). */
  override def count(criteria: Option[String] = None): Long = criteria match {
    case Some(_) => super.count(criteria)
    case None => dataPath match {
      case None => 0L
      case Some(p) =>
        val conf = spark.sessionState.newHadoopConf()
        val dir = new org.apache.hadoop.fs.Path(p)
        val fs = dir.getFileSystem(conf)
        fs.listStatus(dir).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRecordCount finally r.close()
          }.sum
    }
  }

  override def update(docs: DataFrame, keyFields: Seq[String] = Seq(key)): Unit = {
    val next =
      if (isEmpty) Store.dedupLastWins(docs, keyFields)
      else Store.upsertPlan(df, docs, keyFields)
    writeVersion(next)
  }

  override def removeDocs(criteria: String): Unit = if (!isEmpty) {
    val t = df
    writeVersion(t.filter(!coalesce(
      MongoFilter.compile(criteria, Some(t.schema)), lit(false))))
  }

  override def removeKeys(keys: DataFrame): Unit = if (!isEmpty) {
    writeVersion(df.join(keys.select(col(keys.columns.head).alias(key)), Seq(key), "left_anti"))
  }
}
