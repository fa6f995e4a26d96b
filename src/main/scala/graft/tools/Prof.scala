package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface).
  *
  * Round 14: phase decomposition of `stream_bm25_topk` per the
  * BASELINE.md isolation protocol (VERDICT r13 #3/#4) — trigger
  * machinery vs postings compute vs durable index write vs stats merge
  * vs serve, each timed separately so a regression can be attributed to
  * a phase instead of adjudicated on the lifecycle total. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // prep (untimed): the two file-source batches, evens older
    val base = java.nio.file.Files.createTempDirectory("prof_bm").toString
    val prepared = s"$base/docs"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(prepared)
    new java.io.File(prepared).listFiles().foreach(f =>
      f.setLastModified(1000000000000L))
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(prepared)
    // streaming warm-up: absorb StreamingQueryManager/state init like
    // Bench's untimed AvailableNow micro-trigger
    scala.util.Try {
      val wq = spark.readStream.format("rate").option("numPartitions", "1")
        .load().groupBy().count()
        .writeStream.format("memory").queryName("prof_stream_warm")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try wq.awaitTermination(60000L) finally wq.stop()
    }
    def freshStores(tag: String) = (
      new graft.store.ParquetStore(spark, s"$base/idx_$tag", "id", "term",
        deltaWrites = true),
      new graft.store.ParquetStore(spark, s"$base/st_$tag", "sid", "sid"))
    val queries = docs.filter(col("doc_id") % 83 === 0 && col("doc_id") < 1000000L)

    // 1. the full streaming lifecycle (what the bench row times,
    // including the serve leg)
    val (idxS, stS) = freshStores("stream")
    tm("stream_2triggers") {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(prepared)
      val q = graft.streaming.StreamingBuilder.bm25IndexStream(
        stream, "doc_id", "text", idxS, stS)
      try q.processAllAvailable() finally q.stop()
    }
    tm("serve_after_stream") {
      new graft.builder.Bm25IndexBuilder(
        new graft.store.TableStore(spark, docs, "prof_src", "doc_id", "doc_id"),
        idxS, stS, "text")
        .topK(queries, k = 6).collect()
    }

    // 2. the SAME two builds driven directly — no streaming machinery;
    // stream_2triggers − (buildA + buildB) = trigger/runtime overhead
    val (idxB, stB) = freshStores("batch")
    val srcStore = new graft.store.MemoryStore(spark, "prof_bsrc", "doc_id", "doc_id")
    srcStore.load(docs.filter(col("doc_id") % 2 === 0))
    tm("batch_buildA") {
      new graft.builder.Bm25IndexBuilder(srcStore, idxB, stB, "text").run()
    }
    srcStore.load(docs)
    tm("batch_buildB") {
      new graft.builder.Bm25IndexBuilder(srcStore, idxB, stB, "text").run()
    }
    tm("serve_after_batch") {
      new graft.builder.Bm25IndexBuilder(srcStore, idxB, stB, "text")
        .topK(queries, k = 6).collect()
    }

    // 3. within-build split: postings compute (kernel only, noop sink)
    // vs durable term-clustered write vs the one-row stats agg
    val postings = docs
      .select(col("doc_id").alias("id"),
        graft.functions.GraftFunctions.termCounts(spark,
          graft.ext.TextAnalysis.normTokens(col("text"))).alias("__tc"))
      .select(col("id"),
        coalesce(graft.functions.GraftFunctions.cntTotal(spark, col("__tc")),
          lit(0L)).alias("dl"),
        explode_outer(col("__tc")).alias("__t"))
      .select(coalesce(col("__t.term"), lit("")).alias("term"), col("id"),
        coalesce(col("__t.cnt").cast("long"), lit(0L)).alias("tf"), col("dl"))
    tm("postings_compute_noop") {
      postings.write.mode("overwrite").format("noop").save()
    }
    val (idxW, _) = freshStores("write")
    idxW.ensureIndex("term")
    tm("postings_durable_write") {
      idxW.update(postings, Seq("term", "id"))
    }
    tm("stats_one_row_agg") {
      docs.select(graft.functions.GraftFunctions.cntTotal(spark,
          graft.functions.GraftFunctions.termCounts(spark,
            graft.ext.TextAnalysis.normTokens(col("text")))).alias("dl"))
        .agg(count(lit(1)), sum(col("dl"))).head()
    }
    spark.stop()
  }
}
