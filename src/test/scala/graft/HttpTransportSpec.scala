package graft

import graft.sources.{BooksTransport, PagedBooksTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Drives the REAL JDK-HttpClient transport ([[BooksTransport.HttpTransport]])
  * through the full DataSourceV2 scan against an in-JVM loopback
  * `com.sun.net.httpserver.HttpServer` on 127.0.0.1 — zero egress, live
  * sockets (VERDICT r9 #3: the one transport leg previously argued from
  * code reading alone). Covers the reference extract contract
  * (/root/reference/scripts/extract.py:31-72): happy-path pagination,
  * short-feed stop, 429-quota and 5xx retry-with-backoff, quota-header
  * bookkeeping, API-key header, malformed-payload abort (no retry), and
  * limit pushdown reaching the wire (pages past the cap never requested).
  *
  * EVERY case runs in two transport modes (VERDICT r10 #3):
  * - plain: HTTP/1.1, identity encoding, Content-Length framing;
  * - secure: HTTPS (self-signed cert + PKCS12 truststore through the
  *   `trustStore` option), gzip-encoded bodies, chunked transfer —
  *   the three behaviors a real api endpoint would exercise that
  *   plaintext loopback can't.
  */
class HttpTransportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Transport mode a whole case set runs under. */
  private final case class Mode(name: String, tls: Boolean,
                                gzip: Boolean, chunked: Boolean)
  private val Plain = Mode("plain", tls = false, gzip = false, chunked = false)
  private val Secure = Mode("https+gzip+chunked", tls = true, gzip = true, chunked = true)

  /** One self-signed PKCS12 for the suite (key + its own cert as trust),
    * SAN ip:127.0.0.1 so the client's hostname verification passes on
    * loopback. Generated with the JDK's own keytool. */
  private lazy val keystore: (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls").toString
    val path = s"$dir/ks.p12"
    val pass = "graft-test"
    val keytool = s"${System.getProperty("java.home")}/bin/keytool"
    val p = new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", path, "-storepass", pass, "-keypass", pass,
      "-dname", "CN=graft-loopback", "-validity", "2",
      "-ext", "san=ip:127.0.0.1").redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    require(p.waitFor() == 0, s"keytool failed: $out")
    (path, pass)
  }

  /** Per-offset request counter + (offset, limit) request log, reset per
    * server. Handlers run on a pool (pages fetch in parallel), so all
    * bookkeeping is concurrent. */
  private final class Log {
    val attempts = new ConcurrentHashMap[Long, AtomicInteger]()
    val requests = ConcurrentHashMap.newKeySet[(Long, Long)]()
    val apiKeys = ConcurrentHashMap.newKeySet[String]()
    def attempt(offset: Long): Int =
      attempts.computeIfAbsent(offset, _ => new AtomicInteger).incrementAndGet()
  }

  /** One feed record, byte-compatible with [[BooksTransport.Deterministic]]
    * so HTTP results compare row-for-row against the no-network formula. */
  private def pageJson(offset: Long, limit: Long, feedRows: Long): String =
    (offset until math.min(offset + limit, feedRows)).map(i =>
      s"""{"id":$i,"title":"book-$i","rating":${(i % 100) / 100.0}}""")
      .mkString("[", ",", "]")

  /** Start a loopback server in `mode`; `respond` returns
    * (status, body, quotaHeader) given (offset, limit, attempt#). Always
    * JSON on 200. Secure mode wraps the listener in TLS, gzips every
    * non-empty body (Content-Encoding: gzip) and frames responses with
    * chunked transfer (sendResponseHeaders length 0) instead of
    * Content-Length. */
  private def withServer(mode: Mode)
                        (respond: (Long, Long, Int) => (Int, String, Option[Long]))
                        (body: (String, Log) => Unit): Unit = {
    val log = new Log
    val srv =
      if (mode.tls) {
        val (ksPath, ksPass) = keystore
        val ks = java.security.KeyStore.getInstance("PKCS12")
        val in = new java.io.FileInputStream(ksPath)
        try ks.load(in, ksPass.toCharArray) finally in.close()
        val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
          javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(ks, ksPass.toCharArray)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(kmf.getKeyManagers, null, null)
        val s = com.sun.net.httpserver.HttpsServer
          .create(new InetSocketAddress("127.0.0.1", 0), 0)
        s.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx))
        s
      } else com.sun.net.httpserver.HttpServer
        .create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/books", ex => try {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val kv = q.split("&").filter(_.contains("=")).map { p =>
        val Array(k, v) = p.split("=", 2); k -> v
      }.toMap
      val off = kv("offset").toLong
      val lim = kv("limit").toLong
      log.requests.add((off, lim))
      Option(ex.getRequestHeaders.getFirst("X-Api-Key")).foreach(log.apiKeys.add)
      val (status, payload, quota) = respond(off, lim, log.attempt(off))
      quota.foreach(v =>
        ex.getResponseHeaders.add("X-RateLimit-Remaining", v.toString))
      val plainBytes = payload.getBytes(StandardCharsets.UTF_8)
      val bytes =
        if (mode.gzip && plainBytes.nonEmpty) {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(plainBytes); gz.close()
          ex.getResponseHeaders.add("Content-Encoding", "gzip")
          bos.toByteArray
        } else plainBytes
      if (bytes.isEmpty) ex.sendResponseHeaders(status, -1)
      else {
        // chunked framing: length 0 = "unknown", the server streams chunks
        ex.sendResponseHeaders(status, if (mode.chunked) 0 else bytes.length)
        ex.getResponseBody.write(bytes)
      }
    } finally ex.close())
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    srv.start()
    val scheme = if (mode.tls) "https" else "http"
    try body(s"$scheme://127.0.0.1:${srv.getAddress.getPort}/books", log)
    finally srv.stop(0)
  }

  private def httpFeed(mode: Mode, baseUrl: String, rows: Long,
                       pageSize: Long = 100L, apiKey: String = "") = {
    var r = spark.read.format("graft.sources.PagedBooksSource")
      .option("rows", rows).option("pageSize", pageSize)
      .option("transport", "http").option("baseUrl", baseUrl)
      .option("backoffMs", 1)
    if (apiKey.nonEmpty) r = r.option("apiKey", apiKey)
    if (mode.tls) {
      val (ksPath, ksPass) = keystore
      r = r.option("trustStore", ksPath).option("trustStorePass", ksPass)
    }
    r.load()
  }

  for (mode <- Seq(Plain, Secure)) {

    test(s"[${mode.name}] happy path: live-socket pages == deterministic formula; key + quota headers flow") {
      withServer(mode)((off, lim, _) => (200, pageJson(off, lim, 400L), Some(99L))) {
        (url, log) =>
          BooksTransport.quotaRemaining.set(-1L)
          // sort DRIVER-side: a Spark orderBy adds a range-partitioning
          // sampling job that scans (= fetches) every page a second time,
          // which would break the exactly-one-request-per-page assertion
          val got = httpFeed(mode, url, rows = 400, apiKey = "k-test-123")
            .collect().sortBy(_.getLong(0))
          val want = BooksTransport.Deterministic.fetchPage(0, 400)
          assert(got.length == 400)
          got.zip(want).foreach { case (g, w) =>
            assert(g.getLong(0) == w.id && g.getString(1) == w.title &&
              g.getDouble(2) == w.rating)
          }
          // every page requested exactly once over the wire, at page size
          assert(log.requests.size() == 4 &&
            (0L until 400L by 100L).forall(o => log.requests.contains((o, 100L))))
          assert(log.attempts.values().stream().allMatch(_.get == 1),
            "healthy endpoint must see exactly one attempt per page")
          // the API key reached the server; the quota header reached the JVM
          assert(log.apiKeys.contains("k-test-123"))
          assert(BooksTransport.quotaRemaining.get() == 99L)
      }
    }

    test(s"[${mode.name}] short feed: pages past the end return empty arrays -> fewer rows, no failure") {
      withServer(mode)((off, lim, _) => (200, pageJson(off, lim, 250L), None)) {
        (url, _) =>
          val df = httpFeed(mode, url, rows = 400)
          assert(df.count() == 250L)
          assert(df.agg(sum("id")).head().getLong(0) == (0L until 250L).sum)
      }
    }

    test(s"[${mode.name}] over-long pages are clamped to the requested count (server ignores the limit param)") {
      // each page returns TWICE the requested rows; pushLimit reports full
      // pushdown (Catalyst drops the Limit), so without the reader-side
      // clamp the scan would over-emit and break LIMIT semantics (review r10)
      withServer(mode)((off, lim, _) => (200, pageJson(off, lim * 2, Long.MaxValue), None)) {
        (url, _) =>
          val df = httpFeed(mode, url, rows = 250, pageSize = 100)
          assert(df.count() == 250L)
          val stats = df.agg(min("id"), max("id"), countDistinct("id")).head()
          assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) == ((0L, 249L, 250L)))
      }
    }

    test(s"[${mode.name}] 429 quota + 5xx: first attempts fail, in-reader backoff recovers every page") {
      PagedBooksTable.retriesObserved.set(0L)
      withServer(mode) { (off, lim, attempt) =>
        if (attempt == 1 && off == 0L) (429, "", Some(0L))       // quota trip
        else if (attempt == 1 && off == 100L) (503, "oops", None) // server error
        else (200, pageJson(off, lim, 300L), Some(7L))
      } { (url, log) =>
        val df = httpFeed(mode, url, rows = 300)
        assert(df.count() == 300L)
        // both faulted pages were re-fetched (attempt 2 succeeded), healthy
        // page was not
        assert(log.attempts.get(0L).get == 2 && log.attempts.get(100L).get == 2)
        assert(log.attempts.get(200L).get == 1)
        assert(PagedBooksTable.retriesObserved.get() >= 2L)
      }
    }

    test(s"[${mode.name}] persistent 429 exhausts the capped backoff and fails the task (never hangs)") {
      withServer(mode)((_, _, _) => (429, "", Some(0L))) { (url, log) =>
        val e = intercept[org.apache.spark.SparkException](
          httpFeed(mode, url, rows = 100).count())
        assert(e.getMessage.contains("quota") || e.getCause != null)
        // MaxAttempts = 4 in the page reader: capped, not retry-forever
        assert(log.attempts.get(0L).get == 4,
          s"expected 4 capped attempts, saw ${log.attempts.get(0L)}")
      }
    }

    test(s"[${mode.name}] malformed payload aborts WITHOUT retry (re-fetching a bad page can't fix it)") {
      withServer(mode) { (off, lim, _) =>
        if (off == 0L) (200, """[{"id":1,"title":"no-rating"}]""", None)
        else (200, pageJson(off, lim, 200L), None)
      } { (url, log) =>
        val e = intercept[org.apache.spark.SparkException](
          httpFeed(mode, url, rows = 200).count())
        assert(e.getMessage.contains("rating") || e.getMessage.contains("malformed"))
        assert(log.attempts.get(0L).get == 1,
          "malformed page must abort on the FIRST attempt, not burn retries")
      }
    }

    test(s"[${mode.name}] wrong-TYPED fields abort with the field named (no silent asLong coercion to 0)") {
      // Jackson's asLong()/asDouble() coerce a non-numeric node to 0 —
      // pre-guard, {"id":"abc"} ingested as id=0 silently (review r10)
      withServer(mode) { (off, lim, _) =>
        if (off == 0L)
          (200, """[{"id":"abc","title":"x","rating":"N/A"}]""", None)
        else (200, pageJson(off, lim, 200L), None)
      } { (url, log) =>
        val e = intercept[org.apache.spark.SparkException](
          httpFeed(mode, url, rows = 200).count())
        assert(e.getMessage.contains("'id'") && e.getMessage.contains("expected"),
          e.getMessage)
        assert(log.attempts.get(0L).get == 1,
          "wrong-typed page must abort on the FIRST attempt")
      }
    }

    test(s"[${mode.name}] non-array JSON body aborts loudly (contract violation, not a crash)") {
      withServer(mode)((_, _, _) => (200, """{"not":"an array"}""", None)) { (url, _) =>
        val e = intercept[org.apache.spark.SparkException](
          httpFeed(mode, url, rows = 100).count())
        assert(e.getMessage.contains("array"))
      }
    }

    test(s"[${mode.name}] limit pushdown reaches the wire: pages past the cap are never requested") {
      withServer(mode)((off, lim, _) => (200, pageJson(off, lim, 1000L), None)) {
        (url, log) =>
          assert(httpFeed(mode, url, rows = 1000).limit(42).collect().length == 42)
          assert(log.requests.size() == 1 && log.requests.contains((0L, 42L)),
            s"expected exactly one capped page request, saw ${log.requests}")
      }
    }
  }

  test("HttpHubClient over https+gzip+chunked == the deterministic formula client, incl. 503 backoff + bearer auth (S5, VERDICT r12 #5)") {
    import graft.sources.HubModelsSource
    // hub catalog endpoint: one GET ?limit=N, the whole listing in one
    // JSON array — serialize the FORMULA registry so equality against
    // the no-network client is exact, field for field
    def catalogJson(limit: Int): String =
      HubModelsSource.DeterministicHub.listModels(limit).map { m =>
        val tags = m.tags.map(t => s""""$t"""").mkString("[", ",", "]")
        s"""{"model_id":"${m.model_id}","author":"${m.author}",""" +
          s""""pipeline_tag":"${m.pipeline_tag}","tags":$tags,""" +
          s""""downloads":${m.downloads},""" +
          s""""last_modified":"${m.last_modified.toInstant.toString}"}"""
      }.mkString("[", ",", "]")
    val attempts = new AtomicInteger()
    val bearers = ConcurrentHashMap.newKeySet[String]()
    // TLS server (suite keystore), gzip bodies, chunked framing; first
    // attempt answers 503 so the driver-side capped backoff must retry
    val (ksPath, ksPass) = keystore
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val ksIn = new java.io.FileInputStream(ksPath)
    try ks.load(ksIn, ksPass.toCharArray) finally ksIn.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, ksPass.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val srv = com.sun.net.httpserver.HttpsServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx))
    srv.createContext("/models", ex => try {
      Option(ex.getRequestHeaders.getFirst("Authorization"))
        .foreach(bearers.add)
      val limit = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst { case p if p.startsWith("limit=") =>
          p.stripPrefix("limit=").toInt }.getOrElse(0)
      if (attempts.incrementAndGet() == 1) {
        ex.sendResponseHeaders(503, -1)
      } else {
        val plain = catalogJson(limit).getBytes(StandardCharsets.UTF_8)
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(plain); gz.close()
        ex.getResponseHeaders.add("Content-Encoding", "gzip")
        ex.sendResponseHeaders(200, 0) // chunked
        ex.getResponseBody.write(bos.toByteArray)
      }
    } finally ex.close())
    srv.start()
    try {
      val url = s"https://127.0.0.1:${srv.getAddress.getPort}/models"
      val client = new HubModelsSource.HttpHubClient(url,
        bearerToken = "hub-token", trustStore = ksPath,
        trustStorePass = ksPass, backoffMs = 10L)
      val got = client.listModels(50)
      val want = HubModelsSource.DeterministicHub.listModels(50)
      assert(got == want,
        "the HTTPS client must reproduce the formula client exactly")
      assert(attempts.get() >= 2, "the 503 must have been retried")
      assert(bearers.contains("Bearer hub-token"),
        "the bearer token must reach the server")
      // and the DataFrame face rides the same client unchanged
      val viaHttp = HubModelsSource.read(spark, client, limit = 50)
        .collect().map(_.toString).sorted
      val viaFormula = HubModelsSource
        .read(spark, HubModelsSource.DeterministicHub, limit = 50)
        .collect().map(_.toString).sorted
      assert(viaHttp.sameElements(viaFormula))
    } finally srv.stop(0)
  }

  test("an untrusted HTTPS endpoint fails the TLS handshake loudly (no silent fallback)") {
    // same TLS server, but the client keeps the JDK default trust: the
    // self-signed cert must be REJECTED — proving the trustStore option
    // is what made the secure cases pass, not a disabled verifier
    withServer(Secure)((off, lim, _) => (200, pageJson(off, lim, 100L), None)) {
      (url, _) =>
        val e = intercept[org.apache.spark.SparkException](
          httpFeed(Plain, url, rows = 100).count())
        def chain(t: Throwable): Seq[Throwable] =
          Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
        assert(chain(e).exists(t =>
          t.isInstanceOf[javax.net.ssl.SSLException] ||
            t.getMessage != null && t.getMessage.contains("SSL")),
          s"expected an SSL failure in the cause chain, got: $e")
    }
  }
}
