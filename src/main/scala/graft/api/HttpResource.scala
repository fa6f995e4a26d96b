package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.query.QueryParams
import graft.store.Store
import org.apache.spark.sql.DataFrame

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

/** Shared 504 machinery for every HTTP resource: run `body` under a
  * per-request job group with a cancellation deadline. Job groups are
  * thread-local, so concurrent requests on different server threads
  * cancel independently. `cancelJobGroupAndFutureJobs` (not plain
  * cancel) closes the between-actions window: a request that is on the
  * driver between two Spark actions when the deadline fires still has
  * its NEXT action killed. The 504 decision keys on the watchdog's
  * fired flag, not wall clock, so a genuine post-deadline failure still
  * surfaces as 500 and a marginally-early cancellation still maps to
  * 504. */
private[api] trait TimedActions {
  protected def actionSpark: org.apache.spark.sql.SparkSession
  def timeoutMs: Long

  protected def timed[T](body: => T): T = {
    if (timeoutMs <= 0) return body
    val sc = actionSpark.sparkContext
    val group = s"graft-http-${Thread.currentThread().getId}-${System.nanoTime()}"
    sc.setJobGroup(group, "graft http request", interruptOnCancel = true)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val cancel = new java.util.TimerTask {
      // NEVER let a throw escape: an uncaught exception (e.g. cancelling
      // on a stopped SparkContext) kills the shared Timer thread, after
      // which every timed request fails at schedule()
      def run(): Unit =
        try { fired.set(true); sc.cancelJobGroupAndFutureJobs(group) }
        catch { case _: Throwable => () }
    }
    ReadResource.watchdog.schedule(cancel, timeoutMs)
    try body
    catch {
      case e: Throwable if fired.get() =>
        throw ApiError(504, s"query exceeded ${timeoutMs}ms")
    } finally {
      cancel.cancel(); sc.clearJobGroup()
    }
  }
}

private[api] object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

/** A11/A13: the HTTP resource layer (reference
  * `api/resource/read_resource.py:123-280`, `post_resource.py:18-130`)
  * served by the JDK's built-in `com.sun.net.httpserver` — no framework
  * dependency. The compile path is [[QueryOperator.compile]]; this class
  * only adds transport: URL/body params in, `{"data": [...], "meta":
  * {"total_doc": N, ...}}` out (the reference's `Response[model]`
  * envelope, `api/models.py`). Operators contribute result transforms
  * and meta entries through the A1 `postProcess`/`meta` hooks.
  *
  * Driver-side materialization here is bounded BY CONTRACT: every search
  * passes through [[PaginationQuery]] whose `maxLimit` caps the rows a
  * response may carry; `total_doc` is a count aggregate, not a collect.
  *
  * `timeoutMs > 0` bounds every Spark action a request runs (reference
  * `read_resource.py:256-267` aborts long queries with 504): the request
  * thread gets its own job group, a watchdog cancels the group at the
  * deadline, and the caller sees `504`. Without it one pathological
  * criteria (e.g. `$regex` over a huge store) wedges the serving thread
  * indefinitely.
  */
class ReadResource(
    val store: Store,
    val ops: Seq[QueryOperator],
    val defaultCriteria: Option[String] = None,
    val timeoutMs: Long = 0,
    val responseHeaders: Map[String, String] = Map.empty,
    val countTtlMs: Long = 0) extends TimedActions {

  private def withDefault(qp: QueryParams): QueryParams = defaultCriteria match {
    case None => qp
    case Some(dc) => qp.copy(criteria = qp.criteria match {
      case None => Some(dc)
      case Some(c) => Some(s"""{"$$and": [$dc, $c]}""")
    })
  }

  protected def actionSpark: org.apache.spark.sql.SparkSession = store.spark

  /** `total_doc` with an OPT-IN short-TTL cache keyed on the (merged)
    * criteria JSON. The default (`countTtlMs = 0`) matches the
    * reference — `total_doc` recomputed per request (`read_resource.py`)
    * — because a default-on cache silently serves stale totals after a
    * builder write. At scale a full count per request is a tail-latency
    * cliff, so deployments may opt in with `countTtlMs > 0`; cached
    * entries are additionally keyed on the store's [[Store.contentToken]]
    * freshness signal, so a committed write (ParquetStore version flip,
    * MemoryStore generation bump) invalidates them immediately even
    * inside the TTL. No-criteria counts still route through
    * `store.count(None)`'s ParquetStore footer-metadata fast path on a
    * miss. The map is bounded crudely (clear past 1024 distinct
    * criteria) — a TTL cache, not an LRU, on purpose: entries are tiny
    * and the serving tier restarts far more often than 1024 distinct hot
    * criteria accumulate. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String, Long)]()
  private def cachedCount(criteria: Option[String]): Long = {
    if (countTtlMs <= 0) return store.count(criteria)
    val k = criteria.getOrElse("")
    val now = System.nanoTime()
    val token = store.contentToken
    val hit = countCache.get(k)
    if (hit != null && hit._1 > now && hit._2 == token) hit._3
    else {
      val v = store.count(criteria)
      if (countCache.size > 1024) countCache.clear()
      countCache.put(k, (now + countTtlMs * 1000000L, token, v))
      v
    }
  }

  /** GET/POST search: params → operator compile → `{data, meta}`. */
  def search(params: Map[String, String]): String = timed {
    val qp0 = withDefault(QueryOperator.compile(params, ops))
    // the bounded-collect contract must hold even for a resource built
    // WITHOUT a PaginationQuery: an uncapped search would collect the
    // whole store onto the serving driver
    val capInjected = qp0.limit.isEmpty
    val qp = if (capInjected) qp0.copy(limit = Some(ReadResource.injectedCap)) else qp0
    val total = cachedCount(qp.criteria)
    // limit ≤ maxLimit by PaginationQuery contract → bounded collect
    val results = ops.foldLeft(store.query(qp))((d, op) => op.postProcess(d, params))
    val rows = results.toJSON.collect()
    // meta hooks see the criteria-filtered (pre-pagination) frame;
    // qp.criteria already carries the merged default — no re-wrap
    lazy val filtered = store.query(QueryParams(criteria = qp.criteria))
    // facet operators are folded into ONE explode-struct job per request
    // (FacetQuery.combinedMeta) instead of one action per facet field
    val facetMeta = FacetQuery.combinedMeta(filtered,
      ops.collect { case f: FacetQuery => f })
    // a silently-injected cap is not silent to the client: the applied
    // limit and a truncation flag land in the meta, so "data shorter
    // than total" is detectable without length arithmetic
    val capMeta =
      if (capInjected)
        Seq(s""""limit": ${ReadResource.injectedCap}""",
          s""""truncated": ${total > rows.length}""")
      else Nil
    val metaEntries = (s""""total_doc": $total""" +:
      (ops.filterNot(_.isInstanceOf[FacetQuery])
        .flatMap(_.meta(filtered, params).toSeq) ++ facetMeta).map {
        case (k, v) => s"${Json.str(k)}: $v"
      }) ++ capMeta
    s"""{"data": ${rows.mkString("[", ",", "]")}, "meta": ${metaEntries.mkString("{", ", ", "}")}}"""
  }

  /** GET `/{key}`: single doc by primary key (reference `get_by_key`).
    * The key literal is typed from the store schema. */
  def byKey(key: String): Option[String] = timed {
    val numeric = store.df.schema.fields.find(_.name == store.key)
      .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val lit = if (numeric) {
      if (!key.matches("-?\\d+(\\.\\d+)?"))
        throw ApiError(400, s"key '${key.take(64)}' is not numeric")
      key
    } else Json.str(key)
    val qp = withDefault(QueryParams(
      criteria = Some(s"""{${Json.str(store.key)}: $lit}"""), limit = Some(1)))
    store.query(qp).toJSON.collect().headOption
  }
}

object ReadResource {
  /** One shared daemon scheduler for every request deadline — per-request
    * Timer construction would churn an OS thread per call. */
  private[api] val watchdog = new java.util.Timer("graft-http-watchdog", true)

  /** Safety cap injected when a resource is built without a
    * PaginationQuery — the one definition both the query limit and the
    * response-meta marker read (reference `max_limit` default). */
  val injectedCap: Int = 1000
}

/** Read-only [[Store]] over a re-evaluated frame — lets a resource serve
  * a live derived view (e.g. submissions with their current state) whose
  * underlying store mutates between requests. */
private[api] class ViewStore(
    val spark: org.apache.spark.sql.SparkSession,
    val name: String,
    val key: String,
    override val lastUpdatedField: String,
    frame: () => DataFrame) extends Store {
  def df: DataFrame = frame()
  override def update(docs: DataFrame, keyFields: Seq[String]): Unit =
    throw new UnsupportedOperationException(s"ViewStore $name is read-only")
  override def removeDocs(criteria: String): Unit =
    throw new UnsupportedOperationException(s"ViewStore $name is read-only")
  override def removeKeys(keys: DataFrame): Unit =
    throw new UnsupportedOperationException(s"ViewStore $name is read-only")
}

/** A14 serving plane (reference `api/resource/submission.py:21-390`):
  * `POST /{name}` submits documents with duplicate rejection (all-dup
  * batch → 409), `PATCH /{name}/{submission_id}` appends to the state
  * history, and the inherited GET routes serve the live view with
  * `current_state` resolved from the history's last entry. */
class SubmissionResource(
    val sub: SubmissionStore,
    ops: Seq[QueryOperator],
    timeoutMs: Long = 0,
    responseHeaders: Map[String, String] = Map.empty)
  extends ReadResource(
    new ViewStore(sub.inner.spark, s"${sub.inner.name}-submissions",
      "submission_id", "last_updated", () => sub.withCurrentState),
    // countTtlMs = 0: a live intake view must reflect every submission
    // in total_doc immediately — no cached counts
    ops, None, timeoutMs, responseHeaders, countTtlMs = 0) {

  /** POST intake: body = one JSON object or an array of objects. */
  def submit(body: String): (Int, String) = timed {
    val spark = sub.inner.spark
    import spark.implicits._
    val trimmed = body.trim
    if (trimmed.isEmpty) throw ApiError(400, "empty submission body")
    val df = spark.read.json(Seq(trimmed).toDS())
    if (df.columns.contains("_corrupt_record"))
      throw ApiError(400, "submission body is not valid JSON")
    val (accepted, rejected) = sub.submit(df)
    if (accepted == 0 && rejected > 0)
      (409, s"""{"error": "duplicate submission", "accepted": 0, "rejected": $rejected}""")
    else (201, s"""{"accepted": $accepted, "rejected": $rejected}""")
  }

  /** PATCH `/{id}`: append `state` to the submission's history. */
  def patchState(id: String, state: String): (Int, String) = timed {
    if (state.isEmpty) throw ApiError(400, "missing 'state'")
    val n = sub.advance(s"""{"submission_id": ${Json.str(id)}}""", state)
    if (n == 0) (404, """{"error": "submission not found"}""")
    else (200, s"""{"matched": $n, "state": ${Json.str(state)}}""")
  }
}

/** A15 `S3URLResource` analogue (reference `api/resource/s3_url.py`):
  * the reference answers `GET /{key}` with a presigned S3 URL; with no
  * external object store (zero-egress build) the equivalent contract —
  * "hand the caller the blob behind this key" — is served directly:
  * `GET /{name}/{key}` → decompressed payload bytes
  * (`application/octet-stream`, `ETag` = content md5),
  * `GET /{name}/{key}/meta` → the metadata document as JSON. */
class BlobResource(val store: graft.store.BlobStore) {
  import org.apache.spark.sql.functions.col

  /** (payload bytes, md5) — single-key lookup, payload inflated. */
  def fetch(key: String): Option[(Array[Byte], String)] =
    store.inflated(store.df.filter(col(store.key) === key)).limit(1)
      .select(col("payload"), col("metadata.content_md5"))
      .collect().headOption
      .map(r => (r.getAs[Array[Byte]](0), r.getString(1)))

  def meta(key: String): Option[String] =
    store.df.filter(col(store.key) === key).limit(1)
      .select(col(store.key), col("metadata.*")).toJSON
      .collect().headOption
}

/** ANN serving over HTTP — the A11 analogue for the extension plane
  * (envelope/timeout semantics per reference
  * `api/resource/read_resource.py:232-267`): `POST /{name}` with body
  * `{"vector": [...], "k": 5, "nprobe": 4}` answers the IVF-PQ top-k
  * from the [[graft.builder.AnnIndexBuilder]]-backed PERSISTED codes
  * index — the query path never touches a float vector column
  * ([[graft.ext.Similarity.ivfPqTopKFromCodes]]). Same `{data, meta}`
  * envelope and 504 watchdog as every read resource; `k` is capped at
  * `maxK` (the PaginationQuery `max_limit` discipline — driver-side
  * materialization bounded by contract). */
/** A POST-body search endpoint: the contract the `/name` ann/search
  * handlers in [[GraftHttp.serve]] host (request bytes → response JSON,
  * errors via [[ApiError]]). */
trait BodySearchResource {
  def search(body: Array[Byte]): String
  def responseHeaders: Map[String, String]
}

class AnnResource(
    val builder: graft.builder.AnnIndexBuilder,
    val defaultK: Int = 10,
    val maxK: Int = 100,
    val defaultNprobe: Int = 4,
    val timeoutMs: Long = 0,
    val responseHeaders: Map[String, String] = Map.empty)
  extends TimedActions with BodySearchResource {

  protected def actionSpark: org.apache.spark.sql.SparkSession =
    builder.source.spark

  /** POST body → response JSON. */
  def search(body: Array[Byte]): String = timed {
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      catch { case _: Exception => throw ApiError(400, "body is not valid JSON") }
    if (node == null || !node.isObject || !node.has("vector") ||
        !node.get("vector").isArray || node.get("vector").isEmpty)
      throw ApiError(400, """body must be {"vector": [numbers], "k"?, "nprobe"?}""")
    val vecNode = node.get("vector")
    val vec = (0 until vecNode.size()).map { i =>
      val e = vecNode.get(i)
      if (!e.isNumber) throw ApiError(400, s"vector[$i] is not a number")
      e.asDouble()
    }
    val k = math.min(maxK,
      if (node.has("k")) node.get("k").asInt(defaultK) else defaultK)
    if (k <= 0) throw ApiError(400, "k must be positive")
    val nprobe =
      if (node.has("nprobe")) node.get("nprobe").asInt(defaultNprobe)
      else defaultNprobe
    if (nprobe <= 0) throw ApiError(400, "nprobe must be positive")
    val spark = actionSpark
    import spark.implicits._
    // sentinel query id: topK excludes self-matches by id equality, so
    // the query row must not collide with a corpus id — and it must
    // MATCH the corpus id TYPE (a long sentinel against string ids would
    // null out the comparison and drop every row)
    val idIsString = scala.util.Try(
      builder.index.df.schema("id").dataType ==
        org.apache.spark.sql.types.StringType).getOrElse(false)
    val q =
      if (idIsString) Seq((" graft-ann-query ", vec))
        .toDF(builder.source.key, builder.vecField)
      else Seq((Long.MinValue, vec)).toDF(builder.source.key, builder.vecField)
    val rows = builder.topK(q, k, nprobe).orderBy("rank")
      .select(org.apache.spark.sql.functions.col("rank"),
        org.apache.spark.sql.functions.col("n_id"),
        org.apache.spark.sql.functions.col("sim"))
      .collect() // ≤ k rows by contract
    val data = rows.map { r =>
      val id = r.get(1) match {
        case n: java.lang.Number => n.toString
        case other => Json.str(String.valueOf(other))
      }
      s"""{"rank": ${r.getInt(0)}, "id": $id, "sim": ${r.getDouble(2)}}"""
    }.mkString("[", ",", "]")
    s"""{"data": $data, "meta": {"k": $k, "nprobe": $nprobe, "returned": ${rows.length}}}"""
  }
}

/** Hybrid retrieval endpoint: POST `{"text": "...", "vector"?: [...],
  * "k"?, "nprobe"?}` → BM25 top-k over the persisted posting index
  * ([[graft.builder.Bm25IndexBuilder.topK]]), reciprocal-rank-fused
  * with the ANN leg ([[graft.builder.AnnIndexBuilder.topK]]) when a
  * vector rides the request and a vector builder is configured
  * ([[graft.ext.Similarity.rrfFuse]]) — the serving face of the
  * round-12 retrieval plane, same `{data, meta}` envelope and 504
  * watchdog as every resource. */
class SearchResource(
    val lexical: graft.builder.Bm25IndexBuilder,
    val vector: Option[graft.builder.AnnIndexBuilder] = None,
    val defaultK: Int = 10,
    val maxK: Int = 100,
    val defaultNprobe: Int = 4,
    val fuseC: Int = 60,
    val timeoutMs: Long = 0,
    val responseHeaders: Map[String, String] = Map.empty)
  extends TimedActions with BodySearchResource {

  protected def actionSpark: org.apache.spark.sql.SparkSession =
    lexical.source.spark

  def search(body: Array[Byte]): String = timed {
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      catch { case _: Exception => throw ApiError(400, "body is not valid JSON") }
    if (node == null || !node.isObject || !node.has("text") ||
        !node.get("text").isTextual)
      throw ApiError(400,
        """body must be {"text": "...", "vector"?: [numbers], "k"?, "nprobe"?}""")
    val text = node.get("text").asText()
    val k = math.min(maxK,
      if (node.has("k")) node.get("k").asInt(defaultK) else defaultK)
    if (k <= 0) throw ApiError(400, "k must be positive")
    val nprobe =
      if (node.has("nprobe")) node.get("nprobe").asInt(defaultNprobe)
      else defaultNprobe
    if (nprobe < 1) throw ApiError(400, "nprobe must be >= 1")
    val vec: Option[Seq[Double]] =
      if (!node.has("vector") || node.get("vector").isNull) None
      else {
        val vn = node.get("vector")
        if (!vn.isArray || vn.isEmpty)
          throw ApiError(400, "vector must be a non-empty number array")
        Some((0 until vn.size()).map { i =>
          val e = vn.get(i)
          if (!e.isNumber) throw ApiError(400, s"vector[$i] is not a number")
          e.asDouble()
        })
      }
    if (vec.isDefined && vector.isEmpty)
      throw ApiError(400, "no vector index is configured on this endpoint")
    // dimension check at parse time — the error contract promises a 400
    // here, not a 500 surfacing from inside the ANN scoring leg
    for (v <- vec; vb <- vector; d <- vb.vectorDim; if v.length != d)
      throw ApiError(400,
        s"vector has ${v.length} dimensions, the index expects $d")
    val spark = actionSpark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // sentinel query id (the AnnResource contract): must not collide
    // with a corpus id, so the self-match exclusion never drops a hit
    val lex = lexical.topK(
        Seq((Long.MinValue, text)).toDF("q_id", "q_text"),
        k, idCol = Some("q_id"), textCol = Some("q_text"))
      .select(col("q_id"), col("doc_id").alias("id"), col("rank"))
    val legs = lex +: vec.toSeq.map { v =>
      val vb = vector.get
      vb.topK(Seq((Long.MinValue, v)).toDF(vb.source.key, vb.vecField), k, nprobe)
        .select(col("q_id"), col("n_id").alias("id"), col("rank"))
    }
    val rows = graft.ext.Similarity.rrfFuse(legs, k, fuseC)
      .orderBy("rank")
      .select(col("rank"), col("id"), col("rrf"))
      .collect() // ≤ k rows by contract
    val data = rows.map { r =>
      s"""{"rank": ${r.getInt(0)}, "id": ${r.getLong(1)}, "rrf": ${r.getDouble(2)}}"""
    }.mkString("[", ",", "]")
    s"""{"data": $data, "meta": {"k": $k, "legs": ${legs.length}, "returned": ${rows.length}}}"""
  }
}

/** Tokenizer serving endpoint — closes the tokenizer loop: train once
  * ([[graft.ext.Bpe.trainBatched]] → [[graft.ext.Bpe.saveMerges]], or
  * the Runner `bpe_train` spec type), serve forever. POST
  * `{"text": "...", "encode"?: true}` → BPE token count per word and
  * in total under the PERSISTED merge list; `encode: true` additionally
  * returns the symbol sequence.
  *
  * Serving shape: the merge list loads ONCE per resource (bounded by
  * the numMerges contract) into the compiled
  * [[graft.functions.BpeCodec]] table, and each request encodes
  * DRIVER-SIDE — a request is one text, and spinning a Spark job per
  * HTTP call would serialize the serving path on the scheduler. The
  * tokenizer is the same kernel the engine's distributed encode uses
  * ([[graft.functions.TokenizeRuns]] + BpeCodec), so served counts are
  * bit-identical to `text_bpe_tokens`. Same `{data, meta}` envelope as
  * every resource. */
class TokenizeResource(
    val merges: graft.store.Store,
    val maxTextBytes: Int = 1 << 20,
    val timeoutMs: Long = 0,
    val responseHeaders: Map[String, String] = Map.empty)
  extends TimedActions with BodySearchResource {

  protected def actionSpark: org.apache.spark.sql.SparkSession = merges.spark

  /** Loaded once: merge stores are write-once training artifacts; a
    * retrained tokenizer is a NEW store (and a new resource) by
    * contract — the AnnIndexBuilder quantizer-cache discipline. */
  private lazy val table: graft.functions.BpeTable =
    graft.functions.BpeTable.parse(graft.ext.Bpe.mergesSpec(
      graft.ext.Bpe.loadMerges(merges)))

  def search(body: Array[Byte]): String = timed {
    if (body.length > maxTextBytes)
      throw ApiError(400, s"text exceeds $maxTextBytes bytes")
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      catch { case _: Exception => throw ApiError(400, "body is not valid JSON") }
    if (node == null || !node.isObject || !node.has("text") ||
        !node.get("text").isTextual)
      throw ApiError(400, """body must be {"text": "...", "encode"?: bool}""")
    val encode = node.has("encode") && node.get("encode").asBoolean(false)
    val text = node.get("text").asText()
    // the engine tokenizer (lower → alnum runs), driver-side
    val toks = graft.functions.TokenizeRuns.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text)
        .toLowerCase)
    val words = (0 until toks.numElements())
      .map(i => toks.getUTF8String(i).toString).filter(_.nonEmpty)
    val encoded = words.map(w => graft.functions.BpeCodec.encode(table, w))
    val nTokens = encoded.iterator.map(_.length).sum
    val tokensField =
      if (!encode) ""
      else encoded.flatten.map(Json.str).mkString(", \"tokens\": [", ",", "]")
    s"""{"data": {"n_tokens": $nTokens, "n_words": ${words.length}$tokensField}, """ +
      s""""meta": {"n_merges": ${table.size}}}"""
  }
}

/** Minimal multi-resource HTTP host. `serve(Map("orders" -> res), 0)`
  * binds an ephemeral port (see `getAddress.getPort`); stop with
  * `.stop(0)`. Resource and blob names must be disjoint (each owns the
  * `/{name}` root). JDK context matching is prefix-based, so every
  * handler re-checks that the path is exactly `/{name}` or starts with
  * `/{name}/` — `/ordersfoo` is a 404, not a key lookup on `orders`. */
object GraftHttp {

  private[api] def parseQuery(raw: String): Map[String, String] =
    Option(raw).filter(_.nonEmpty).toSeq
      .flatMap(_.split("&").toSeq).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) URLDecoder.decode(kv, UTF_8) -> ""
        else URLDecoder.decode(kv.take(i), UTF_8) ->
          URLDecoder.decode(kv.drop(i + 1), UTF_8)
      }.toMap

  private def parseJsonBody(body: Array[Byte]): Map[String, String] = {
    if (body.isEmpty) return Map.empty
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    if (!node.isObject) throw ApiError(400, "request body must be a JSON object")
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> (if (e.getValue.isTextual) e.getValue.asText()
                        else e.getValue.toString)
    }
    b.result()
  }

  /** Path below `/{name}`, or None if the request doesn't actually belong
    * to this context (JDK prefix matching hands `/ordersfoo` to the
    * `/orders` handler). */
  private def subPath(ex: HttpExchange, name: String): Option[String] = {
    val p = ex.getRequestURI.getPath
    if (p == s"/$name") Some("")
    else if (p.startsWith(s"/$name/"))
      Some(p.drop(name.length + 2).stripSuffix("/"))
    else None
  }

  def serve(resources: Map[String, ReadResource], port: Int = 0,
            blobs: Map[String, BlobResource] = Map.empty,
            anns: Map[String, BodySearchResource] = Map.empty): HttpServer = {
    val shared = (resources.keySet.intersect(blobs.keySet) ++
      resources.keySet.intersect(anns.keySet) ++
      blobs.keySet.intersect(anns.keySet))
    require(shared.isEmpty,
      s"resource, blob and ann names must be disjoint; shared: ${shared.toSeq.sorted.mkString(", ")}")
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    anns.foreach { case (name, res) =>
      server.createContext(s"/$name", new HttpHandler {
        private def send(ex: HttpExchange, status: Int, body: String): Unit = {
          val bytes = body.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          res.responseHeaders.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
          ex.sendResponseHeaders(status, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
        def handle(ex: HttpExchange): Unit = try {
          (ex.getRequestMethod, subPath(ex, name)) match {
            case (_, None) => send(ex, 404, """{"error": "not found"}""")
            case ("POST", Some("") | Some("search")) =>
              send(ex, 200, res.search(ex.getRequestBody.readAllBytes()))
            case (m, _) => send(ex, 405, s"""{"error": "method $m not allowed"}""")
          }
        } catch {
          case ApiError(status, msg) =>
            send(ex, status, s"""{"error": ${Json.str(msg)}}""")
          case e: Throwable =>
            send(ex, 500, s"""{"error": ${Json.str(String.valueOf(e.getMessage).take(500))}}""")
        }
      })
    }
    blobs.foreach { case (name, res) =>
      server.createContext(s"/$name", new HttpHandler {
        private def send(ex: HttpExchange, status: Int, body: Array[Byte],
                         ctype: String): Unit = {
          ex.getResponseHeaders.set("Content-Type", ctype)
          ex.sendResponseHeaders(status, body.length.toLong)
          ex.getResponseBody.write(body)
          ex.close()
        }
        def handle(ex: HttpExchange): Unit = try {
          (ex.getRequestMethod, subPath(ex, name)) match {
            case (_, None) =>
              send(ex, 404, """{"error": "not found"}""".getBytes(UTF_8), "application/json")
            case ("GET", Some(k)) if k.endsWith("/meta") =>
              res.meta(k.stripSuffix("/meta")) match {
                case Some(json) => send(ex, 200, json.getBytes(UTF_8), "application/json")
                case None => send(ex, 404, """{"error": "blob not found"}""".getBytes(UTF_8), "application/json")
              }
            case ("GET", Some(k)) if k.nonEmpty =>
              res.fetch(k) match {
                case Some((bytes, md5)) =>
                  ex.getResponseHeaders.set("ETag", md5)
                  send(ex, 200, bytes, "application/octet-stream")
                case None => send(ex, 404, """{"error": "blob not found"}""".getBytes(UTF_8), "application/json")
              }
            case (m, _) => send(ex, 405, s"""{"error": "method $m not allowed"}""".getBytes(UTF_8), "application/json")
          }
        } catch {
          case e: Throwable =>
            send(ex, 500, s"""{"error": ${Json.str(String.valueOf(e.getMessage).take(500))}}""".getBytes(UTF_8), "application/json")
        }
      })
    }
    resources.foreach { case (name, res) =>
      server.createContext(s"/$name", new HttpHandler {
        private def send(ex: HttpExchange, status: Int, body: String): Unit = {
          val bytes = body.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          // A16 HeaderProcessor analogue: resource-configured headers
          res.responseHeaders.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
          ex.sendResponseHeaders(status, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
        def handle(ex: HttpExchange): Unit = try {
          (ex.getRequestMethod, subPath(ex, name), res) match {
            case (_, None, _) =>
              send(ex, 404, """{"error": "not found"}""")
            case ("GET", Some(""), _) =>
              send(ex, 200, res.search(parseQuery(ex.getRequestURI.getRawQuery)))
            case ("POST", Some(""), sr: SubmissionResource) => // A14 intake
              val (code, body) =
                sr.submit(new String(ex.getRequestBody.readAllBytes(), UTF_8))
              send(ex, code, body)
            case ("POST", Some("") | Some("search"), _) => // A13 post resource
              send(ex, 200, res.search(
                parseJsonBody(ex.getRequestBody.readAllBytes())))
            case ("PATCH", Some(id), sr: SubmissionResource) if id.nonEmpty =>
              // state from ?state=... or the JSON body
              val params = parseQuery(ex.getRequestURI.getRawQuery) ++
                parseJsonBody(ex.getRequestBody.readAllBytes())
              val (code, body) = sr.patchState(id, params.getOrElse("state", ""))
              send(ex, code, body)
            case ("GET", Some(key), _) =>
              res.byKey(key) match {
                case Some(doc) => send(ex, 200, s"""{"data": [$doc]}""")
                case None => send(ex, 404, """{"error": "document not found"}""")
              }
            case (m, _, _) => send(ex, 405, s"""{"error": "method $m not allowed"}""")
          }
        } catch {
          case ApiError(status, msg) =>
            send(ex, status, s"""{"error": ${Json.str(msg)}}""")
          case e: Throwable =>
            send(ex, 500, s"""{"error": ${Json.str(String.valueOf(e.getMessage).take(500))}}""")
        }
      })
    }
    // without an executor the JDK server dispatches EVERY request on its
    // single dispatcher thread — concurrent clients would serialize (and
    // one slow query would block all others despite the 504 machinery).
    // A cached daemon pool gives each request its own thread, which is
    // also what the per-thread job-group cancellation design assumes.
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "graft-http"); t.setDaemon(true); t
    })
    server.start()
    server
  }
}
