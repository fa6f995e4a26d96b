package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface).
  *
  * Round 15: phase decomposition of `pipeline_curate` (VERDICT r14 #5)
  * and the image rows `dedup_images` / `stream_dedup_images` (VERDICT
  * r14 #6) per the BASELINE.md isolation protocol — each stage timed
  * separately (nested prefixes; marginal = stage_k − stage_{k−1}) so a
  * regression can be attributed to a phase instead of adjudicated on
  * the lifecycle total. Run min-of-3 across cold sessions.
  */
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
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    import graft.ext.{Dedup, Multimodal, Sampling, TextAnalysis}

    // ---- pipeline_curate fixture (the SparkEntry corpus, replicated) ----
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val idStr = col("doc_id").cast("string")
    val dupPage = lit("This exact duplicated page appears verbatim many " +
      "times across the whole corpus and is intentionally long enough to " +
      "satisfy every heuristic quality gate applied today.")
    val normal = concat(
      lit("This is a well formed and carefully written sentence number "),
      idStr, lit(" of the corpus crafted for document "), idStr,
      lit(" with twenty or more words total."),
      lit("\n"), col("text"), lit(" end."),
      when(col("doc_id") % 4 === 0, lit("\nclick here")).otherwise(lit("")),
      when(col("doc_id") % 17 === 0,
        lit("\nGenerated from lorem ipsum filler text.")).otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        lit("\nfunction f() { return 1; }")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit("\nWin money free click here now today please fast."))
        .otherwise(lit("")))
    val shortPage = lit("This tiny page is honestly much too short.")
    val cur = d.select(col("doc_id"), col("lang"),
      when(col("doc_id") % 19 === 2, dupPage)
        .when(col("doc_id") % 23 === 3, shortPage)
        .otherwise(normal).alias("text"),
      when(col("doc_id") % 7 === 0 && col("doc_id") % 19 =!= 2 &&
          col("doc_id") % 23 =!= 3, lit(0))
        .otherwise(lit(1)).alias("label"))
    val base = java.nio.file.Files.createTempDirectory("prof_cur").toString
    cur.write.parquet(s"$base/docs")
    val curP = spark.read.parquet(s"$base/docs")
    // model prep (untimed — a fixed dependency, the Runner spec trains it
    // as its own builder row)
    val clf = new graft.store.ParquetStore(spark, s"$base/clf", "bucket",
      "last_updated", deltaWrites = true)
    val clfSrc = new graft.store.MemoryStore(spark, "prof_clfsrc", "doc_id", "doc_id")
    clfSrc.load(curP)
    new graft.builder.QualityClfBuilder(clfSrc, clf, "text", "label").run()
    val evalDf = curP.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"),
        TextAnalysis.c4Filters(col("text")).getField("clean").alias("__clean"))

    // nested stage prefixes (marginal attribution = k − (k−1))
    val c4x = TextAnalysis.c4Filters(col("text"), 3)
    def cleaned = curP
      .select(col("doc_id"), col("lang"), c4x.alias("__c4"))
      .filter(col("__c4").getField("keep"))
      .select(col("doc_id"), col("lang"),
        col("__c4").getField("clean").alias("__clean"))
    def gophered = cleaned.filter(
      TextAnalysis.gopherRules(col("__clean"), 20).getField("passes"))
    def qualified = {
      val counts = clf.df.select(col("bucket"),
        col("c0").cast("long").alias("c0"), col("c1").cast("long").alias("c1"))
      val keep = graft.ext.QualityClassifier
        .score(gophered, "doc_id", "__clean", counts, 1024, "md5", 0)
        .filter(col("q_score") > 0.0).select(col("doc_id"))
      gophered.join(keep, Seq("doc_id"), "left_semi")
    }
    def deduped = qualified
      .groupBy(md5(col("__clean").cast("binary")).alias("__h"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("__clean")),
        col("doc_id")).alias("__w"))
      .select(col("__w.doc_id").alias("doc_id"), col("__w.lang").alias("lang"),
        col("__w.__clean").alias("__clean"))
    def deconed(in: DataFrame) = Dedup.decontaminate(in,
      evalDf.select(col("doc_id"), col("__clean")), "doc_id", "__clean", 13)
    def mixed(in: DataFrame) = Sampling.weightedMix(in, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25), 0.1)
    def packed(in: DataFrame) = Sampling.packSequences(
      in.withColumn("__nt", TextAnalysis.tokenCount(col("__clean"))),
      orderCol = "doc_id", tokensCol = "__nt", seqLen = 2048)
      .select(col("doc_id"), col("lang"), col("__nt").alias("n_tokens"),
        col("pack_id"), col("pack_offset"))
    tm("curate_s1_c4_gopher")(noop(gophered))
    tm("curate_s2_clf_gate")(noop(qualified))
    tm("curate_s3_dedup_exchange")(noop(deduped))
    tm("curate_s4_decon")(noop(deconed(deduped)))
    tm("curate_s5_mix_pack")(noop(packed(mixed(deconed(deduped)))))
    // the builder's own run (persists at post-dedup + post-mix, manifest
    // write + orphan sweep) — what the bench row times minus the Runner
    // clf training row
    val srcStore = new graft.store.MemoryStore(spark, "prof_cursrc", "doc_id", "doc_id")
    srcStore.load(curP)
    val evalStore = new graft.store.MemoryStore(spark, "prof_cureval", "doc_id", "doc_id")
    evalStore.load(evalDf.withColumnRenamed("__clean", "text"))
    val tgt = new graft.store.MemoryStore(spark, "prof_curtgt", "doc_id", "doc_id")
    tm("curate_builder_run") {
      new graft.builder.CurateBuilder(srcStore, tgt, model = Some(clf),
        eval = Some(evalStore), mixRates = Map("en" -> 0.5, "de" -> 0.25),
        mixDefaultRate = 0.1, seqLen = 2048).run()
    }
    tm("curate_clf_train") {
      val clf2 = new graft.store.ParquetStore(spark, s"$base/clf2", "bucket",
        "last_updated", deltaWrites = true)
      new graft.builder.QualityClfBuilder(clfSrc, clf2, "text", "label").run()
    }

    // ---- dedup_images decomposition ----
    import spark.implicits._
    val ids = d.select(col("doc_id")).as[Long]
    def imgs = ids.map(id => (id, Multimodal.syntheticCellBmp(id)))
      .union(ids.filter(_ % 10 == 0)
        .map(id => (id + 1000000L, Multimodal.syntheticCellBmp(id, perturbCell = 0))))
      .toDF("doc_id", "img")
    def sigs = Multimodal.imageHash(
      Multimodal.pack(imgs, "doc_id", col("img"), "image"))
      .select(col("media_id").alias("id"), col("simhash"))
    tm("images_bmp_build_decode_dhash")(noop(sigs))
    tm("images_full_pairs")(noop(
      Dedup.simhashPairsFromSigs(sigs, maxHamming = 2)
        .repartition(1).sortWithinPartitions("a", "b")))
    // banding+verify marginal = full_pairs − decode; the ORACLE replays
    // the dHash from the BMP formula WITHOUT building/decoding bytes —
    // the decode leg is the asymmetry BASELINE.md documents
  }
}
