package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface): phase
  * decomposition of the `text_unigram_update` and `text_bm25_update`
  * lifecycle rows — run 1 (train), run 2 (lu-update: drop + re-count),
  * score/serve — plus a JOB COUNT per phase (SparkListener), so the
  * store-action floor (~0.5 s/action, BASELINE.md r15) is attributable
  * per phase. Warm pass first (discarded), then the timed pass. */
object ProfLifecycle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def tm[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s, jobs ${jobs.get() - j0}")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (pass <- Seq("warm", "timed")) {
      println(s"=== pass $pass ===");
      // ---- text_unigram_update ----
      locally {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("prof_ulmu").toString
        val src = new graft.store.MemoryStore(spark, "plmu_src", "doc_id", "lu")
        val vocab = new graft.store.ParquetStore(spark, s"$base/vocab", "tok",
          "last_updated", deltaWrites = true)
        val contrib = new graft.store.ParquetStore(spark, s"$base/docs", "id",
          "lu", deltaWrites = true)
        def mk() = new graft.builder.UnigramLmBuilder(src, vocab, "text",
          docs = Some(contrib))
        val evens = docs.filter(col("doc_id") % 2 === 0)
        src.load(evens.withColumn("lu", lit(1L)))
        tm("ulm run1 (train evens)") { mk().run() }
        val mutated = evens.select(col("doc_id"),
          when(col("doc_id") % 6 === 0,
            concat(col("text"), lit(" updated "),
              substring(md5(col("doc_id").cast("string")), 1, 6)))
            .otherwise(col("text")).alias("text"),
          when(col("doc_id") % 6 === 0, lit(2L)).otherwise(lit(1L)).alias("lu"))
        src.load(mutated)
        val b2 = mk()
        tm("ulm run2 (lu-update)") { b2.run() }
        println(s"  run2 reconciled: ${b2.lastRunReconciled}")
        tm("ulm score (odd half)") {
          noop(graft.ext.TextAnalysis.scoreWithVocab(
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", vocab)
            .orderBy("doc_id"))
        }
      }
      // ---- text_bm25_update ----
      locally {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("prof_bmu").toString
        val src = new graft.store.MemoryStore(spark, "plmb_src", "doc_id", "lu")
        val index = new graft.store.ParquetStore(spark, s"$base/idx", "id",
          "term", deltaWrites = true)
        val stats = new graft.store.ParquetStore(spark, s"$base/st", "sid", "sid")
        def mk() = new graft.builder.Bm25IndexBuilder(src, index, stats, "text")
        val evens = docs.filter(col("doc_id") % 2 === 0)
        src.load(evens.withColumn("lu", lit(1L)))
        tm("bm25 run1 (index evens)") { mk().run() }
        val mutated = evens.select(col("doc_id"),
          when(col("doc_id") % 6 === 0,
            concat(col("text"), lit(" updated "),
              substring(md5(col("doc_id").cast("string")), 1, 6)))
            .otherwise(col("text")).alias("text"),
          when(col("doc_id") % 6 === 0, lit(2L)).otherwise(lit(1L)).alias("lu"))
        src.load(mutated)
        val b2 = mk()
        tm("bm25 run2 (lu-update)") { b2.run() }
        println(s"  run2 reconciled: ${b2.lastRunReconciled}")
        tm("bm25 topK (serve)") {
          noop(mk().topK(docs.filter(col("doc_id") % 89 === 0), k = 8))
        }
      }
    }
    spark.stop()
  }
}
