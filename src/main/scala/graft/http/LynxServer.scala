package graft.http

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.core.{TagNumber, TagString, TagValue, WriteRequest}
import graft.engine.{LynxEngine, Sinks}

/** HTTP API (reference main.rs:99-103): POST /api/v1/write,
  * POST /api/v1/query, GET /health. JSON bodies match the reference's
  * serde shapes (testdata/write.json, testdata/query.json):
  * write = {namespace, measurement, value, metadata?, timestamp};
  * query = {namespace, query, format?: "csv"|"json"|"table", version?: N}
  * (default table, reference main.rs:80; `version` = time-travel read
  * at a published tier manifest version, an engine extension).
  *
  * Jackson ships with Spark's classpath; only tree-model parsing is
  * used (no reflection databind).
  */
object Json {
  private val mapper = new ObjectMapper

  def parseWrite(body: Array[Byte]): WriteRequest =
    parseWriteNode(mapper.readTree(body))

  /** Batch form: a JSON array of write objects is N writes (one WAL
    * group commit engine-side); a single object is the reference's
    * one-request shape. Any invalid element rejects the whole batch —
    * the caller never has to reconcile a partially applied body.
    */
  def parseWriteBatch(body: Array[Byte]): Seq[WriteRequest] = {
    val n = mapper.readTree(body)
    if (!n.isArray) Seq(parseWriteNode(n))
    else {
      val it = n.elements()
      val b = Seq.newBuilder[WriteRequest]
      while (it.hasNext) b += parseWriteNode(it.next())
      b.result()
    }
  }

  private def parseWriteNode(
      n: com.fasterxml.jackson.databind.JsonNode): WriteRequest = {
    require(n.hasNonNull("namespace") && n.hasNonNull("measurement") &&
      n.hasNonNull("value") && n.hasNonNull("timestamp"),
      "missing required field")
    // i64 semantics (reference wal.rs:24): a non-numeric timestamp
    // must be rejected, not silently coerced to 0 — and an integer
    // outside i64 must 422, not wrap through asLong()
    require(n.get("timestamp").isIntegralNumber,
      "timestamp must be an integer (microseconds since epoch)")
    require(n.get("timestamp").bigIntegerValue().bitLength() <= 63,
      "timestamp out of i64 range")
    // the WHOLE NUL prefix is reserved for WAL marker records (seal
    // markers, stream-batch brackets, hwm checkpoints): JSON can
    // carry unicode NUL escapes, and a forged lynx.batch marker replayed
    // from the WAL could poison a sink's high-water mark (silently
    // skipping every future batch) or open a never-committed bracket
    // (discarding later writes) — reject the class, not one name
    require(!n.get("namespace").asText().startsWith("\u0000"),
      "reserved namespace")
    val metadata: Map[String, TagValue] =
      if (n.hasNonNull("metadata")) {
        val m = n.get("metadata")
        val it = m.properties().iterator()
        val b = Map.newBuilder[String, TagValue]
        while (it.hasNext) {
          val e = it.next()
          val v: TagValue =
            if (e.getValue.isNumber) {
              // u64 semantics (reference wal.rs:161): integral,
              // non-negative, ≤ 2^64-1; keep the raw 64 bits
              val n = e.getValue
              require(n.isIntegralNumber, s"tag ${e.getKey}: not a u64")
              val big = n.bigIntegerValue()
              require(big.signum() >= 0 && big.bitLength() <= 64,
                s"tag ${e.getKey}: out of u64 range")
              TagNumber(big.longValue())
            } else TagString(e.getValue.asText())
          require(e.getKey != "timestamp" && e.getKey != "value" &&
            !e.getKey.startsWith("__lynx"),
            s"tag ${e.getKey}: reserved key")
          b += e.getKey -> v
        }
        b.result()
      } else Map.empty
    WriteRequest(
      n.get("namespace").asText(),
      n.get("measurement").asText(),
      n.get("value").asText(),
      metadata,
      n.get("timestamp").asLong())
  }

  def parseQuery(body: Array[Byte])
      : (String, String, String, Option[Long]) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace") && n.hasNonNull("query"),
      "missing required field")
    val fmt = if (n.hasNonNull("format")) n.get("format").asText()
      else "table"
    // optional time travel: read at a published tier manifest
    // version. Same discipline as parseWrite's timestamp: a
    // non-integral version must 422, not coerce to 0 through asLong()
    val asOf = if (!n.hasNonNull("version")) None else {
      require(n.get("version").isIntegralNumber,
        "version must be an integer manifest version")
      require(n.get("version").bigIntegerValue().bitLength() <= 63,
        "version out of i64 range")
      Some(n.get("version").asLong())
    }
    (n.get("namespace").asText(), n.get("query").asText(), fmt, asOf)
  }

  /** {namespace, table, cluster_by?: [col,…]} for /admin/compact. */
  def parseCompact(body: Array[Byte]): (String, String, Seq[String]) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace") && n.hasNonNull("table"),
      "missing required field")
    val clusterBy: Seq[String] =
      if (n.hasNonNull("cluster_by")) {
        val arr = n.get("cluster_by")
        require(arr.isArray, "cluster_by must be an array")
        val it = arr.elements()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      } else Nil
    (n.get("namespace").asText(), n.get("table").asText(), clusterBy)
  }

  /** {namespace, table, group, value} for /api/v1/rollup. */
  def parseRollup(body: Array[Byte]): (String, String, String, String) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace") && n.hasNonNull("table") &&
      n.hasNonNull("group") && n.hasNonNull("value"),
      "missing required field")
    // group/value name parquet COLUMNS (they reach a plan unquoted);
    // restrict to identifier characters so the endpoint can't smuggle
    // expressions past the SELECT-only gatekeeper
    val g = n.get("group").asText()
    val v = n.get("value").asText()
    require(g.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      v.matches("[A-Za-z_][A-Za-z0-9_]*"),
      "group/value must be bare column names")
    (n.get("namespace").asText(), n.get("table").asText(), g, v)
  }

  /** {namespace, table, column} for /api/v1/bloom. The column names a
    * parquet column (it reaches a plan unquoted) — identifier-
    * restricted like rollup's group/value.
    */
  def parseBloom(body: Array[Byte]): (String, String, String) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace") && n.hasNonNull("table") &&
      n.hasNonNull("column"), "missing required field")
    val c = n.get("column").asText()
    require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      "column must be a bare column name")
    (n.get("namespace").asText(), n.get("table").asText(), c)
  }

  /** {index, vector, k?, nprobe?, labels?} for /api/v1/ann. The
    * index name is identifier-restricted like rollup's columns (it
    * becomes a filesystem path segment under the tier root);
    * k/nprobe/labels are bounded so one request can't demand an
    * unbounded collect. `labels` (integer array) = filtered search:
    * rank only vectors whose persisted label is listed.
    */
  def parseAnn(body: Array[Byte])
      : (String, Array[Float], Int, Int, Option[Seq[Long]]) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("index") && n.hasNonNull("vector"),
      "missing required field")
    val name = n.get("index").asText()
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      "index must be a bare identifier")
    val vNode = n.get("vector")
    require(vNode.isArray && vNode.size() > 0 && vNode.size() <= 4096,
      "vector must be a non-empty numeric array")
    val vec = new Array[Float](vNode.size())
    var i = 0
    while (i < vec.length) {
      require(vNode.get(i).isNumber, "vector elements must be numbers")
      vec(i) = vNode.get(i).floatValue()
      i += 1
    }
    val k = if (n.hasNonNull("k")) n.get("k").asInt() else 3
    val nprobe = if (n.hasNonNull("nprobe")) n.get("nprobe").asInt() else 3
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    require(nprobe >= 1 && nprobe <= 64, "nprobe must be in [1, 64]")
    val labels: Option[Seq[Long]] =
      if (!n.hasNonNull("labels")) None
      else {
        val lNode = n.get("labels")
        require(lNode.isArray && lNode.size() > 0 && lNode.size() <= 1000,
          "labels must be a non-empty array of at most 1000 integers")
        Some((0 until lNode.size()).map { i =>
          require(lNode.get(i).isIntegralNumber,
            "labels elements must be integers")
          lNode.get(i).asLong()
        })
      }
    (name, vec, k, nprobe, labels)
  }

  /** {namespace, table, before_day: "yyyy-MM-dd"} for /admin/expire. */
  def parseExpire(body: Array[Byte]): (String, String, String) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace") && n.hasNonNull("table") &&
      n.hasNonNull("before_day"), "missing required field")
    val day = n.get("before_day").asText()
    require(day.matches("""\d{4}-\d{2}-\d{2}"""),
      "before_day must be yyyy-MM-dd")
    (n.get("namespace").asText(), n.get("table").asText(), day)
  }

  /** {namespace} for /admin/fence and /admin/unfence. */
  def parseNamespace(body: Array[Byte]): String = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace"), "missing required field")
    n.get("namespace").asText()
  }

  /** {namespace, snapshot, table?, version?} for /admin/export and
    * /admin/import. The snapshot id becomes a directory name under
    * the configured exchange root — identifier-restricted so an
    * untrusted caller can never address a path outside it (the
    * runSQLOnFiles=false discipline applied to the admin plane).
    */
  def parseSnapshot(body: Array[Byte])
      : (String, String, Option[String], Option[Long]) = {
    val n = mapper.readTree(body)
    require(n.hasNonNull("namespace") && n.hasNonNull("snapshot"),
      "missing required field")
    val snap = n.get("snapshot").asText()
    require(snap.matches("[A-Za-z0-9][A-Za-z0-9._-]*") &&
      !snap.contains(".."),
      "snapshot must be a bare identifier")
    val table =
      if (n.hasNonNull("table")) Some(n.get("table").asText()) else None
    val version = if (!n.hasNonNull("version")) None else {
      require(n.get("version").isIntegralNumber,
        "version must be an integer manifest version")
      Some(n.get("version").asLong())
    }
    (n.get("namespace").asText(), snap, table, version)
  }
}

final class LynxServer(engine: LynxEngine, host: String, port: Int,
    exchangeDir: Option[File] = None) {
  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)
  // without an executor every request serializes on the dispatch
  // thread; the reference serves each request on its own tokio task
  // (main.rs:91) and the engine is concurrency-safe (ConcurrencySpec),
  // so give the server a real pool
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(8, Runtime.getRuntime.availableProcessors()))
  server.setExecutor(pool)

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/health", (ex: HttpExchange) => respond(ex, 200))

  // operational introspection (extension; the reference exposes only
  // /health): buffered row/namespace counts and result-cache hits as
  // one flat JSON object — enough for a scrape without a client lib
  server.createContext("/metrics", (ex: HttpExchange) => {
    try {
      // one rowCounts snapshot feeds both counters, so a concurrent
      // write can't tear the response into a state that never existed
      // (namespaces = those with buffered rows, by construction)
      val counts = engine.buffer.rowCounts
      val rows = counts.values.map(_.toLong).sum
      val namespaces = counts.keysIterator.map(_._1).toSet.size
      // per-ANN-index drift since the last build: the rebuild alarm
      // AnnStore.append maintains (outside-old-radius fraction of
      // appended vectors) — dashboards watch the ratio climb
      val driftEntries = engine.ann.toSeq.flatMap { as =>
        as.indexNames.flatMap(n => as.drift(n).map { case (a, o, r) =>
          s""""$n":{"appended":$a,"outside":$o,"ratio":$r}"""
        })
      }
      val annDrift =
        if (driftEntries.isEmpty) ""
        else driftEntries.mkString(""","ann_drift":{""", ",", "}")
      // per-sink streaming high-water marks (WAL-derived): a stalled
      // stream reads as a mark that stops advancing between scrapes
      val hwms = engine.streamHighWaterMarks
      val hwmJson =
        if (hwms.isEmpty) ""
        else hwms.toSeq.sortBy(_._1).map { case (s, b) =>
          s"${graft.engine.Sinks.jsonString(s)}:$b"
        }.mkString(""","stream_hwm":{""", ",", "}")
      // WAL tail repairs at the last startup: data-affecting events
      // an operator must see without grepping stderr
      val recov = engine.walRecoveries
      val recovJson =
        if (recov.isEmpty) ""
        else recov.map { r =>
          s"""{"segment":${Sinks.jsonString(r.segment)},"kept_bytes":${
            r.keptBytes},"discarded_bytes":${r.discardedBytes
            },"reason":${Sinks.jsonString(r.reason)}}"""
        }.mkString(""","wal_recoveries":[""", ",", "]")
      respond(ex, 200,
        s"""{"buffered_rows":$rows""" +
          s""","namespaces":$namespaces""" +
          s""","result_cache_hits":${engine.resultCacheHits.get}""" +
          annDrift + hwmJson + recovJson + "}")
    } catch {
      case e: Exception =>
        System.err.println(e)
        respond(ex, 500)
    }
  })

  // malformed request bodies → 422 (the reference's axum Json
  // extractor rejects them pre-handler with a 4xx); engine-side
  // failures, including bad SQL, → 500 (reference main.rs:84-87)
  server.createContext("/api/v1/write", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseWriteBatch(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right(Seq(w)) =>
          try {
            engine.write(w)
            respond(ex, 200)
          } catch {
            case e: LynxEngine.NamespaceFencedException =>
              fencedResponse(ex, e)
            case e: Exception =>
              System.err.println(e)
              respond(ex, 500)
          }
        case Right(ws) =>
          try {
            engine.writeBatch(ws)
            respond(ex, 200)
          } catch {
            case e: LynxEngine.NamespaceFencedException =>
              fencedResponse(ex, e)
            case e: Exception =>
              System.err.println(e)
              respond(ex, 500)
          }
      }
    }
  })

  /** Migration-fenced namespace: 422 + Retry-After — transient for a
    * racing writer (a retry after the router flip lands on the new
    * owner), so it must be distinguishable from a permanent 4xx.
    */
  private def fencedResponse(ex: HttpExchange,
      e: LynxEngine.NamespaceFencedException): Unit = {
    ex.getResponseHeaders.set("Retry-After", "2")
    respond(ex, 422, s"""{"error":${
      Sinks.jsonString(e.getMessage)},"retryable":true}""")
  }

  server.createContext("/api/v1/query", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseQuery(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((ns, sql, fmt, asOf)) =>
          try {
            engine.query(ns, sql, asOf) match {
              case Some(result) =>
                respond(ex, 200, fmt match {
                  case "json" => Sinks.toJson(result)
                  case "csv" => Sinks.toCsv(result)
                  case _ => Sinks.toTable(result)
                })
              case None => respond(ex, 404)
            }
          } catch {
            case e: Exception =>
              System.err.println(e)
              respond(ex, 500)
          }
      }
    }
  })

  // admin: flush the RAM tail to the tier and truncate the WAL
  // (no-op engine-side without a configured tier)
  server.createContext("/api/v1/admin/checkpoint", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else try {
      engine.checkpoint()
      respond(ex, 200)
    } catch {
      case e: Exception =>
        System.err.println(e)
        respond(ex, 500)
    }
  })

  // admin: rewrite a table's tier files (one per day, optionally
  // clustered on tag columns for row-group pruning)
  server.createContext("/api/v1/admin/compact", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseCompact(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((ns, table, clusterBy)) =>
          try {
            engine.compact(ns, table, clusterBy)
            respond(ex, 200)
          } catch {
            case e: Exception =>
              System.err.println(e)
              respond(ex, 500)
          }
      }
    }
  })

  // maintained rollup: count + exact-decimal sum per group over the
  // tiered table, served incrementally (only unseen segments are
  // aggregated — see graft.engine.RollupStore). 404 when the engine
  // has no tier (nothing immutable to maintain against).
  server.createContext("/api/v1/rollup", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseRollup(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((ns, table, group, value)) =>
          engine.rollups match {
            case None => respond(ex, 404)
            case Some(store) =>
              try {
                val rows = store.rollup(ns, table, group, value)
                  .map { case (g, c, s) =>
                    // group values are arbitrary tag strings —
                    // control characters included — so route through
                    // the sink escaper, not a hand-rolled replace()
                    val gj = g.map(Sinks.jsonString).getOrElse("null")
                    s"""{"group":$gj,"count":$c,"sum":$s}"""
                  }.mkString("[", ",", "]")
                respond(ex, 200, rows)
              } catch {
                // cardinality-bound rejections carry the limit in the
                // message — surface it as a client error, not a bare
                // 500, so the caller learns the contract
                case e: IllegalArgumentException =>
                  respond(ex, 422, s"""{"error":${
                    Sinks.jsonString(e.getMessage)}}""")
                case e: Exception =>
                  System.err.println(e)
                  respond(ex, 500)
              }
          }
      }
    }
  })

  // ANN top-k over a built IVF index (see graft.engine.AnnStore):
  // POST {index, vector, k?, nprobe?, labels?} →
  // [{"vec_id":…,"cos":…}…]; labels restricts ranking to vectors
  // whose persisted label is listed (filter-then-rank).
  // Builds are engine-side only — an HTTP-triggered build would read
  // an arbitrary host parquet path on behalf of an untrusted caller
  // (the runSQLOnFiles=false rationale). 404 when the engine has no
  // tier or the index was never built.
  server.createContext("/api/v1/ann", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseAnn(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((name, vec, k, nprobe, labels)) =>
          engine.ann match {
            case None => respond(ex, 404)
            case Some(store) =>
              try store.query(name, vec, k, nprobe, labels) match {
                case None => respond(ex, 404)
                case Some(hits) =>
                  val body = hits.map { case (id, cos) =>
                    s"""{"vec_id":$id,"cos":$cos}"""
                  }.mkString("[", ",", "]")
                  respond(ex, 200, body)
              } catch {
                // dimension/bounds violations carry the contract in
                // the message — client error, not a bare 500
                case e: IllegalArgumentException =>
                  respond(ex, 422, s"""{"error":${
                    Sinks.jsonString(e.getMessage)}}""")
                case e: Exception =>
                  System.err.println(e)
                  respond(ex, 500)
              }
          }
      }
    }
  })

  // per-file value-bloom index maintenance (see graft.engine.
  // BloomStore): POST {namespace, table, column} builds/refreshes the
  // bloom index for the table's current manifest; subsequent queries
  // with `column = 'literal'` predicates skip files whose blooms
  // exclude the literal. Returns the newly indexed file count and the
  // table's indexed columns. 404 when the engine has no tier.
  server.createContext("/api/v1/bloom", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseBloom(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((ns, table, column)) =>
          engine.valueBlooms match {
            case None => respond(ex, 404)
            case Some(store) =>
              try {
                val n = store.index(ns, table, column)
                val cols = store.indexedColumns(ns, table)
                  .toSeq.sorted.map(Sinks.jsonString).mkString(",")
                respond(ex, 200,
                  s"""{"indexed":$n,"columns":[$cols]}""")
              } catch {
                // type/identifier rejections carry the contract in
                // the message — client error, not a bare 500
                case e: IllegalArgumentException =>
                  respond(ex, 422, s"""{"error":${
                    Sinks.jsonString(e.getMessage)}}""")
                case e: Exception =>
                  System.err.println(e)
                  respond(ex, 500)
              }
          }
      }
    }
  })

  // admin: list a table's published manifest versions (oldest first)
  // with file counts — how a client discovers the `version` values the
  // query endpoint's time-travel parameter accepts
  server.createContext("/api/v1/admin/versions", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseCompact(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((ns, table, _)) =>
          try {
            val vs = engine.tierVersions(ns, table)
              .map { case (v, n) => s"""{"version":$v,"files":$n}""" }
              .mkString("[", ",", "]")
            respond(ex, 200, vs)
          } catch {
            case e: Exception =>
              System.err.println(e)
              respond(ex, 500)
          }
      }
    }
  })

  // admin: retention — age out day partitions older than before_day
  // (exclusive); reports how many data files the manifest dropped
  server.createContext("/api/v1/admin/expire", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else {
      val parsed =
        try Right(Json.parseExpire(ex.getRequestBody.readAllBytes()))
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          System.err.println(e)
          respond(ex, 422)
        case Right((ns, table, day)) =>
          try {
            val dropped = engine.expire(ns, table, day)
            respond(ex, 200, s"""{"dropped_files":$dropped}""")
          } catch {
            case e: Exception =>
              System.err.println(e)
              respond(ex, 500)
          }
      }
    }
  })

  // admin: write-fence a namespace (the migration drain barrier) /
  // lift it. Fencing is idempotent and durable across restarts.
  server.createContext("/api/v1/admin/fence", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else handleNamespaceToggle(ex, engine.fence)
  })
  server.createContext("/api/v1/admin/unfence", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else handleNamespaceToggle(ex, engine.unfence)
  })

  private def handleNamespaceToggle(ex: HttpExchange,
      f: String => Unit): Unit = {
    val parsed =
      try Right(Json.parseNamespace(ex.getRequestBody.readAllBytes()))
      catch { case e: Exception => Left(e) }
    parsed match {
      case Left(e) =>
        System.err.println(e)
        respond(ex, 422)
      case Right(ns) =>
        try { f(ns); respond(ex, 200) }
        catch {
          case e: Exception =>
            System.err.println(e)
            respond(ex, 500)
        }
    }
  }

  // admin: snapshot export/import through the EXCHANGE DIR — the
  // shared-storage handoff area of backup/restore and namespace
  // migration. Only registered when the operator configured one
  // (LYNX_EXCHANGE_DIR): the snapshot id is identifier-restricted
  // and resolves strictly under that root, so the HTTP plane can
  // never read or write an arbitrary host path (the ANN-build /
  // runSQLOnFiles security stance). 404 without the config.
  private def snapshotEndpoint(ex: HttpExchange)(
      handle: (String, File, Option[String], Option[Long]) => String)
      : Unit =
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else exchangeDir match {
      case None => respond(ex, 404)
      case Some(root) =>
        val parsed =
          try Right(Json.parseSnapshot(ex.getRequestBody.readAllBytes()))
          catch { case e: Exception => Left(e) }
        parsed match {
          case Left(e) =>
            System.err.println(e)
            respond(ex, 422)
          case Right((ns, snap, table, version)) =>
            try respond(ex, 200,
              handle(ns, new File(root, snap), table, version))
            catch {
              case e: IllegalArgumentException =>
                respond(ex, 422, s"""{"error":${
                  Sinks.jsonString(e.getMessage)}}""")
              case e: Exception =>
                System.err.println(e)
                respond(ex, 500, s"""{"error":${
                  Sinks.jsonString(String.valueOf(e.getMessage))}}""")
            }
        }
    }

  server.createContext("/api/v1/admin/export", (ex: HttpExchange) =>
    snapshotEndpoint(ex) { (ns, dest, table, version) =>
      table match {
        case Some(t) =>
          val n = engine.exportSnapshot(ns, t, version, dest)
          s"""[{"table":${Sinks.jsonString(t)},"files":$n}]"""
        case None =>
          engine.exportNamespace(ns, dest).map { case (t, n) =>
            s"""{"table":${Sinks.jsonString(t)},"files":$n}"""
          }.mkString("[", ",", "]")
      }
    })

  server.createContext("/api/v1/admin/import", (ex: HttpExchange) =>
    snapshotEndpoint(ex) { (ns, src, table, _) =>
      table match {
        case Some(t) =>
          val v = engine.importSnapshot(ns, t, src)
          s"""[{"table":${Sinks.jsonString(t)},"version":$v}]"""
        case None =>
          engine.importNamespace(ns, src).map { case (t, v) =>
            s"""{"table":${Sinks.jsonString(t)},"version":$v}"""
          }.mkString("[", ",", "]")
      }
    })

  // admin: reclaim an exchange-dir snapshot (the migration driver
  // calls this after a successful flip or a failed attempt — without
  // it every migration leaves a full namespace copy on the shared
  // storage forever). Same identifier-under-the-exchange-root
  // discipline as export/import; 404 without the config.
  server.createContext("/api/v1/admin/dropsnapshot", (ex: HttpExchange) =>
    if (ex.getRequestMethod != "POST") respond(ex, 405)
    else exchangeDir match {
      case None => respond(ex, 404)
      case Some(root) =>
        val parsed = try {
          val n = new ObjectMapper()
            .readTree(ex.getRequestBody.readAllBytes())
          require(n.hasNonNull("snapshot"), "missing required field")
          val snap = n.get("snapshot").asText()
          require(snap.matches("[A-Za-z0-9][A-Za-z0-9._-]*") &&
            !snap.contains(".."), "snapshot must be a bare identifier")
          Right(snap)
        } catch { case e: Exception => Left(e) }
        parsed match {
          case Left(e) =>
            System.err.println(e)
            respond(ex, 422)
          case Right(snap) =>
            def rm(f: File): Unit = {
              Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
              f.delete()
              ()
            }
            val dir = new File(root, snap)
            val existed = dir.exists()
            if (existed) rm(dir)
            respond(ex, 200, s"""{"dropped":$existed}""")
        }
    })

  def start(): Unit = server.start()
  def stop(): Unit = {
    server.stop(0)
    pool.shutdown()
  }
  def boundPort: Int = server.getAddress.getPort
}

/** Entry point; env config mirrors the reference (main.rs:19-29):
  * LYNX_HTTP_ADDR (default 127.0.0.1:3000), LYNX_WAL_MAX_SEGMENT_SIZE
  * (default 50 MiB), plus LYNX_WAL_DIR for the segment directory.
  * Engine extensions: LYNX_MAX_RESULT_ROWS caps what one query may
  * materialize on the driver (default unbounded, reference-faithful);
  * LYNX_WAL_GROUP_COMMIT_MS enables WAL group commit (default 0 =
  * flush per record like the reference); LYNX_WAL_FSYNC=1 upgrades
  * every WAL flush to an fsync (power-loss durability — pair with
  * group commit for one fsync per interval); LYNX_TIER_DIR enables
  * the parquet tier at that root (POST /api/v1/admin/checkpoint then
  * seals the RAM tail there and truncates the WAL — without it the
  * endpoint is a no-op, reference-faithful); LYNX_AUTO_COMPACT_FILES
  * compacts a table inline when its manifest holds that many files
  * beyond compaction's one-per-day floor (default 0 = manual
  * compaction only; needs LYNX_TIER_DIR); LYNX_BLOOM_COLUMNS
  * (comma-separated column names) keeps bloom/zone file-skip indexes
  * current automatically — every seal/compaction incrementally
  * indexes its new files for those columns, so `col = 'lit'` pruning
  * never lags ingest (default empty = index via POST /api/v1/bloom
  * only; needs LYNX_TIER_DIR).
  */
object LynxServerMain {
  def main(args: Array[String]): Unit = {
    val addr = sys.env.getOrElse("LYNX_HTTP_ADDR", "127.0.0.1:3000")
    val Array(host, port) = addr.split(":", 2)
    val maxSeg = sys.env.get("LYNX_WAL_MAX_SEGMENT_SIZE")
      .map(_.toLong).getOrElse(50L * 1024 * 1024)
    val maxRows = sys.env.get("LYNX_MAX_RESULT_ROWS")
      .map(_.toInt).getOrElse(Int.MaxValue)
    val groupCommitMs = sys.env.get("LYNX_WAL_GROUP_COMMIT_MS")
      .map(_.toLong).getOrElse(0L)
    val walFsync = sys.env.get("LYNX_WAL_FSYNC").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    val walDir = new File(sys.env.getOrElse("LYNX_WAL_DIR", "lynx-wal"))
    val tierDir = sys.env.get("LYNX_TIER_DIR").map(new File(_))
    val autoCompact = sys.env.get("LYNX_AUTO_COMPACT_FILES")
      .map(_.toInt).getOrElse(0)
    val autoBloom = sys.env.get("LYNX_BLOOM_COLUMNS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-lynx")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the HTTP SQL surface gets the native graft functions too (the
    // extension covers fresh sessions; this covers a pre-existing one)
    graft.functions.GraftFunctions.register(spark)
    val engine = new LynxEngine(spark, walDir, maxSeg,
      tier = tierDir.map(new graft.tier.ParquetTier(_)),
      maxResultRows = maxRows, walGroupCommitMillis = groupCommitMs,
      walFsync = walFsync, autoCompactFileThreshold = autoCompact,
      autoBloomColumns = autoBloom,
      // operator ack for bounded WAL tail recovery: accept the loss
      // and truncate at the last proven frame boundary even when the
      // damage is mid-log or larger than the auto ceiling
      walForceTailTruncate = sys.env.get("LYNX_WAL_FORCE_TAIL_TRUNCATE")
        .exists(v => v == "1" || v.equalsIgnoreCase("true")),
      // LYNX_SHARDS (name=url,…) + LYNX_SHARD_SELF (this engine's
      // shard name): with both set, ANN index builds assert this
      // engine is the name's rendezvous owner — a misplaced index
      // fails at creation instead of 404ing at serve time
      annPlacement = for {
        selfName <- sys.env.get("LYNX_SHARD_SELF")
        table <- sys.env.get("LYNX_SHARDS")
        parsed = table.split(",").toSeq.map(_.trim)
          .filter(_.nonEmpty).map { s =>
            val Array(name, url) = s.split("=", 2)
            (name, url)
          }
        if parsed.nonEmpty
      } yield (selfName, parsed))
    // LYNX_EXCHANGE_DIR: shared-storage handoff root for snapshot
    // export/import (backup/restore + namespace migration); the
    // endpoints are absent without it
    val server = new LynxServer(engine, host, port.toInt,
      exchangeDir = sys.env.get("LYNX_EXCHANGE_DIR").map(new File(_)))
    server.start()
    println(s"lynx-graft listening on $host:${server.boundPort}")
    Thread.currentThread().join()
  }
}
