package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface).
  *
  * Round 15: anatomy of the per-query STREAMING fixed cost (~5.8 s in
  * the r14 BM25 decomposition, carried by every `stream_*` bench row).
  * Isolates: query start/stop on an empty source, the per-trigger
  * marginal on a 2-file file source with a noop foreachBatch, and the
  * same with the store-write machinery the real rows run — so the
  * fixed cost can be attributed to the streaming engine vs the
  * builder work it hosts, and any conf-level win applies suite-wide. */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val base = java.nio.file.Files.createTempDirectory("prof_stream").toString
    val df = (1L to 1000L).map(i => (i, s"doc number $i body", 1L))
      .toDF("doc_id", "text", "lu")
    // two ordered files → two triggers with maxFilesPerTrigger=1
    df.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$base/in")
    new java.io.File(s"$base/in").listFiles().foreach(_.setLastModified(1000000000000L))
    df.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    val schema = df.schema

    // warm the batch-side machinery so the stream legs do not pay
    // first-job JIT/codegen
    tm("warm_batch_read")(spark.read.parquet(s"$base/in").count())

    // ---- ParquetStore.update anatomy (the store cost inside leg 3) ----
    val evens = df.filter(col("doc_id") % 2 === 0)
    val odds = df.filter(col("doc_id") % 2 === 1)
    for (round <- 1 to 3) {
      tm(s"w${round}_raw_parquet_write")(
        evens.write.mode("overwrite").parquet(s"$base/raw_$round"))
      val st = new graft.store.ParquetStore(spark,
        s"$base/anat_$round", "doc_id", "lu")
      tm(s"w${round}_update_empty")(st.update(evens, Seq("doc_id")))
      tm(s"w${round}_update_upsert")(st.update(odds, Seq("doc_id")))
      tm(s"w${round}_update_restate")(st.update(odds, Seq("doc_id")))
      val dst = new graft.store.ParquetStore(spark,
        s"$base/anatd_$round", "doc_id", "lu", deltaWrites = true)
      tm(s"w${round}_delta_empty")(dst.update(evens, Seq("doc_id")))
      tm(s"w${round}_delta_append")(dst.update(odds, Seq("doc_id")))
    }

    for (round <- 1 to 3) {
      // leg 1: start+stop on an already-consumed... simplest: noop
      // foreachBatch over both files, one trigger (no per-file cap)
      tm(s"r${round}_noop_1trigger") {
        val q = spark.readStream.schema(schema).parquet(s"$base/in")
          .writeStream.outputMode("update")
          .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
          .start()
        q.processAllAvailable(); q.stop()
      }
      // leg 2: two triggers (maxFilesPerTrigger=1) — the bench-row shape
      tm(s"r${round}_noop_2triggers") {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
          .writeStream.outputMode("update")
          .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
          .start()
        q.processAllAvailable(); q.stop()
      }
      // leg 3: two triggers, each upserting into a ParquetStore — the
      // stream_upsert machinery without any builder compute
      tm(s"r${round}_store_2triggers") {
        val tgt = new graft.store.ParquetStore(spark,
          s"$base/tgt_$round", "doc_id", "lu")
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
          .writeStream.outputMode("update")
          .foreachBatch((b: DataFrame, _: Long) =>
            tgt.update(b, Seq("doc_id")))
          .start()
        q.processAllAvailable(); q.stop()
      }
    }
    spark.stop()
  }
}
