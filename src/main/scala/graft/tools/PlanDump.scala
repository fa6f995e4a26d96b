package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Scratch plan-capture main (not part of the library surface): writes
  * `.explain("formatted")` for the optimization-target query frames to
  * `<outDir>/<name>_<tag>.txt` — the r16 before/after plan evidence
  * (guide §1: capture the plan shape before and after each change).
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <outDir> <tag>`
  *
  * Captured frames:
  *  - `text_quality_clf`: the train+score frame of the declared query
  *    (the returned DataFrame IS the scored odd-id split).
  *  - `pipeline_curate`: the snapshot curation chain over the planted
  *    corpus with a trained model + eval slice wired (the
  *    CurateBuilder.curated() plan — the part of the lifecycle row the
  *    optimization targets; the declared query's returned frame is just
  *    a target-store read).
  *  - `text_unigram_logprob`: the score side shared with the unigram
  *    lifecycle rows.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1); val tag = args(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(out))
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(out, s"${name}_$tag.txt"), plan)
      println(s"dumped $name ($tag): ${plan.linesIterator.size} lines")
    }

    dump("text_quality_clf", graft.SparkEntry.queries("text_quality_clf")(spark, dir))

    // curate chain: model trained once (a fixed dependency), then the
    // snapshot chain plan with model + eval wired — mirrors the
    // pipeline_curate Runner spec's curate row
    val cur = graft.SparkEntry.curateCorpus(spark, dir)
    val base = Files.createTempDirectory("graft_plandump").toString
    cur.write.parquet(s"$base/docs")
    val curP = spark.read.parquet(s"$base/docs")
    val clf = new graft.store.ParquetStore(spark, s"$base/clf", "bucket",
      "last_updated", deltaWrites = true)
    val clfSrc = new graft.store.MemoryStore(spark, "plandump_clfsrc", "doc_id", "doc_id")
    clfSrc.load(curP)
    new graft.builder.QualityClfBuilder(clfSrc, clf, "text", "label").run()
    val evalStore = new graft.store.MemoryStore(spark, "plandump_eval", "doc_id", "doc_id")
    evalStore.load(curP.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"),
        graft.ext.TextAnalysis.c4Filters(col("text")).getField("clean").alias("text")))
    val src = new graft.store.MemoryStore(spark, "plandump_src", "doc_id", "doc_id")
    src.load(curP)
    val tgt = new graft.store.MemoryStore(spark, "plandump_tgt", "doc_id", "doc_id")
    val cb = new graft.builder.CurateBuilder(src, tgt,
      model = Some(clf), eval = Some(evalStore),
      mixRates = Map("en" -> 0.5, "de" -> 0.25), mixDefaultRate = 0.1,
      seqLen = 2048)
    dump("pipeline_curate", cb.curated())

    dump("text_unigram_logprob",
      graft.SparkEntry.queries("text_unigram_logprob")(spark, dir))

    // BM25 serve leg (r17 target): the topK plan over a 2-run lifecycle
    // index — the stream_bm25_topk / text_bm25_incr serving shape
    locally {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val b2 = Files.createTempDirectory("graft_plandump_bm").toString
      val src = new graft.store.MemoryStore(spark, "plandump_bmsrc", "doc_id", "doc_id")
      val idx = new graft.store.ParquetStore(spark, s"$b2/idx", "id", "term",
        deltaWrites = true)
      val st = new graft.store.ParquetStore(spark, s"$b2/st", "sid", "sid")
      def mk() = new graft.builder.Bm25IndexBuilder(src, idx, st, "text")
      src.load(docs.filter(col("doc_id") % 2 === 0))
      mk().run()
      src.load(docs)
      mk().run()
      dump("bm25_serve", mk().topK(
        docs.filter(col("doc_id") % 89 === 0 && col("doc_id") < 1000000L), k = 8))
    }

    spark.stop()
  }
}
