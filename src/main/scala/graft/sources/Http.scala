package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.Duration

/** HTTP transport adapter (reference: sources/adapters/http.py HttpTransport
  * — url + headers + merged query params, streamed to the decoder).
  *
  * Spark-first shape: HTTP is a *staging* transport, not a splittable
  * source — the reference streams the response on one node too. The adapter
  * fetches the payload to a filesystem path once (driver-side), and the
  * distributed read happens from that path with the normal schema'd readers
  * (`Tables.readCsv`/`readJsonl`, gzip auto-codec). On a cluster, point
  * `dest` at shared storage so every executor sees the staged file.
  */
object Http {

  /** Merge extra query params into a URL, preserving any existing query —
    * reference HttpTransport._build_url.
    */
  def buildUrl(url: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) url
    else {
      val enc = params.map { case (k, v) =>
        URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val sep = if (url.contains("?")) "&" else "?"
      url + sep + enc
    }

  /** Canonical local staging path for an http source: one slot per
    * (url, source id) under the JVM tmpdir. Shared by the config runtime
    * (which fetches into it) and the artifact fingerprints (which stat it —
    * a re-fetch that changed the payload invalidates cached artifacts).
    */
  def stagedPath(url: String, sourceId: String, format: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_http_staged/" +
      s"${math.abs(url.hashCode)}/$sourceId.$format"

  /** Fetch `url` to local path `dest` (parent dirs created). Non-2xx is an
    * error, like the reference's HTTPError propagation. Returns `dest`.
    */
  def fetchToLocal(url: String, dest: String,
                   headers: Map[String, String] = Map.empty,
                   params: Seq[(String, String)] = Nil,
                   timeoutSeconds: Long = 30): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds))
      .build()
    var builder = HttpRequest.newBuilder(URI.create(buildUrl(url, params)))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET()
    headers.foreach { case (k, v) => builder = builder.header(k, v) }
    val p: Path = Paths.get(dest)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    // TRUNCATE_EXISTING: a refetch into an existing staged file must not
    // leave stale trailing bytes when the new payload is shorter.
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofFile(p,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING))
    require(resp.statusCode() / 100 == 2,
      s"HTTP ${resp.statusCode()} fetching $url")
    dest
  }

  /** Serve a single local file over loopback HTTP for tests/verification;
    * returns (server, url). Caller must `stop(0)` the server.
    */
  def serveFile(path: String, route: String): (com.sun.net.httpserver.HttpServer, String) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(route, exchange => {
      val bytes = Files.readAllBytes(Paths.get(path))
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      val os = exchange.getResponseBody
      os.write(bytes)
      os.close()
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}$route")
  }
}
