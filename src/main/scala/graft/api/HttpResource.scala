package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.query.QueryParams
import graft.store.Store

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

/** A11/A13: the HTTP resource layer (reference
  * `api/resource/read_resource.py:123-280`, `post_resource.py:18-130`)
  * served by the JDK's built-in `com.sun.net.httpserver` — no framework
  * dependency. The compile path is [[QueryOperator.compile]]; this class
  * only adds transport: URL/body params in, `{"data": [...], "meta":
  * {"total_doc": N}}` out (the reference's `Response[model]` envelope,
  * `api/models.py`).
  *
  * Driver-side materialization here is bounded BY CONTRACT: every search
  * passes through [[PaginationQuery]] whose `maxLimit` caps the rows a
  * response may carry; `total_doc` is a count aggregate, not a collect.
  */
class ReadResource(
    val store: Store,
    val ops: Seq[QueryOperator],
    val defaultCriteria: Option[String] = None) {

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def withDefault(qp: QueryParams): QueryParams = defaultCriteria match {
    case None => qp
    case Some(dc) => qp.copy(criteria = qp.criteria match {
      case None => Some(dc)
      case Some(c) => Some(s"""{"$$and": [$dc, $c]}""")
    })
  }

  /** GET/POST search: params → operator compile → `{data, meta}`. */
  def search(params: Map[String, String]): String = {
    val qp = withDefault(QueryOperator.compile(params, ops))
    val total = store.count(qp.criteria)
    // limit ≤ maxLimit by PaginationQuery contract → bounded collect
    val rows = store.query(qp).toJSON.collect()
    s"""{"data": ${rows.mkString("[", ",", "]")}, "meta": {"total_doc": $total}}"""
  }

  /** GET `/{key}`: single doc by primary key (reference `get_by_key`).
    * The key literal is typed from the store schema. */
  def byKey(key: String): Option[String] = {
    val numeric = store.df.schema.fields.find(_.name == store.key)
      .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val lit = if (numeric) {
      if (!key.matches("-?\\d+(\\.\\d+)?"))
        throw ApiError(400, s"key '${key.take(64)}' is not numeric")
      key
    } else jsonStr(key)
    val qp = withDefault(QueryParams(
      criteria = Some(s"""{${jsonStr(store.key)}: $lit}"""), limit = Some(1)))
    store.query(qp).toJSON.collect().headOption
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

/** Minimal multi-resource HTTP host. `serve(Map("orders" -> res), 0)`
  * binds an ephemeral port (see `getAddress.getPort`); stop with
  * `.stop(0)`. */
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

  def serve(resources: Map[String, ReadResource], port: Int = 0,
            blobs: Map[String, BlobResource] = Map.empty): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
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
          val sub = ex.getRequestURI.getPath.stripPrefix(s"/$name")
            .stripPrefix("/").stripSuffix("/")
          (ex.getRequestMethod, sub) match {
            case ("GET", k) if k.endsWith("/meta") =>
              res.meta(k.stripSuffix("/meta")) match {
                case Some(json) => send(ex, 200, json.getBytes(UTF_8), "application/json")
                case None => send(ex, 404, """{"error": "blob not found"}""".getBytes(UTF_8), "application/json")
              }
            case ("GET", k) if k.nonEmpty =>
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
            send(ex, 500, s"""{"error": "${String.valueOf(e.getMessage).replace("\"", "'").take(500)}"}""".getBytes(UTF_8), "application/json")
        }
      })
    }
    resources.foreach { case (name, res) =>
      server.createContext(s"/$name", new HttpHandler {
        private def send(ex: HttpExchange, status: Int, body: String): Unit = {
          val bytes = body.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(status, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
        def handle(ex: HttpExchange): Unit = try {
          val sub = ex.getRequestURI.getPath.stripPrefix(s"/$name")
            .stripPrefix("/").stripSuffix("/")
          (ex.getRequestMethod, sub) match {
            case ("GET", "") =>
              send(ex, 200, res.search(parseQuery(ex.getRequestURI.getRawQuery)))
            case ("POST", "") | ("POST", "search") => // A13 post resource
              send(ex, 200, res.search(
                parseJsonBody(ex.getRequestBody.readAllBytes())))
            case ("GET", key) =>
              res.byKey(key) match {
                case Some(doc) => send(ex, 200, s"""{"data": [$doc]}""")
                case None => send(ex, 404, """{"error": "document not found"}""")
              }
            case (m, _) => send(ex, 405, s"""{"error": "method $m not allowed"}""")
          }
        } catch {
          case ApiError(status, msg) =>
            send(ex, status, s"""{"error": "${msg.replace("\"", "'")}"}""")
          case e: Throwable =>
            send(ex, 500, s"""{"error": "${String.valueOf(e.getMessage).replace("\"", "'").take(500)}"}""")
        }
      })
    }
    server.start()
    server
  }
}
