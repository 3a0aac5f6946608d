package graft

import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** The example network embedder against a LOCAL in-process mock server
  * (zero egress): batching, response validation, and — the seam
  * contract — store and query sides flowing through the SAME instance.
  */
class HttpEmbedderSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // the mock "model": deterministic, strictly positive (so cosine of
  // identical texts is exactly 1), nothing like HashEmbed — retrieval
  // outcomes prove WHICH embedder ran
  private def mockVec(text: String, dim: Int): Seq[Float] =
    Seq.tabulate(dim)(i =>
      (math.floorMod(text.hashCode.toLong * 31 + i * 7, 17) + 1).toFloat)

  private val nRequests = new AtomicInteger(0)
  private val seen =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private var server: com.sun.net.httpserver.HttpServer = _
  private var endpoint: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed",
      new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange)
            : Unit = {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val texts = body.split("\n", -1).filter(_.nonEmpty).map(b =>
            new String(java.util.Base64.getDecoder.decode(b), "UTF-8"))
          nRequests.incrementAndGet()
          texts.foreach(seen.add)
          val resp = texts
            .map(t => mockVec(t, 8).mkString(","))
            .mkString("\n").getBytes("UTF-8")
          ex.sendResponseHeaders(200, resp.length.toLong)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      })
    server.start()
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/embed"
  }

  override def afterAll(): Unit = {
    try server.stop(0)
    finally super.afterAll()
  }

  test("embed: appends the server's vectors row-aligned, in batches") {
    nRequests.set(0)
    seen.clear()
    val texts = Seq("alpha", "beta\nwith newline", "gamma", "delta", "eps")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(1) // one partition → countable batches
    val out = new HttpEmbedder(endpoint, batchSize = 2)
      .embed(df, "text", dim = 8)
      .select(col("id"), col("text"), col("embedding"))
      .as[(Long, String, Seq[Float])].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == texts)
    out.foreach { case (_, t, v) => assert(v == mockVec(t, 8), s"row $t") }
    // 5 texts at batchSize 2 in one partition = 3 requests, and the
    // newline-bearing text survived the wire intact
    assert(nRequests.get == 3, s"got ${nRequests.get} requests")
    assert(seen.contains("beta\nwith newline"))
  }

  test("a misaligned response fails the task instead of mis-pairing") {
    val lying = server.createContext("/short",
      new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange)
            : Unit = {
          ex.getRequestBody.readAllBytes() // one vector, whatever was asked
          val resp = mockVec("x", 8).mkString(",").getBytes("UTF-8")
          ex.sendResponseHeaders(200, resp.length.toLong)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      })
    try {
      val base =
        s"http://127.0.0.1:${server.getAddress.getPort}/short"
      val e = intercept[Exception] {
        new HttpEmbedder(base, batchSize = 4)
          .embed(Seq((1L, "a"), (2L, "b")).toDF("id", "text")
            .repartition(1), // both rows in ONE request batch
            "text", 8)
          .collect()
      }
      assert(e.getMessage.contains("vectors for") ||
        Option(e.getCause).exists(_.getMessage.contains("vectors for")))
    } finally server.removeContext(lying)
  }

  test("the seam contract end-to-end: Engine store AND query sides hit " +
      "the same endpoint; identical text retrieves at cosine 1") {
    nRequests.set(0)
    seen.clear()
    val store = java.nio.file.Files
      .createTempDirectory("graft_http_embed").toString + "/store"
    val e = new Engine(spark, store, dim = 8, chunkSize = 40,
      overlap = 10, embedder = new HttpEmbedder(endpoint))
    e.addDocument("john likes tea")
    e.addDocument("completely different content here")
    // stored vectors are the SERVER's, proving ingest used the seam
    val stored = e.documents()
      .select(col("content"), col("embedding")).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(stored("john likes tea") == mockVec("john likes tea", 8))
    // the query path embeds through the same instance: the exact-text
    // query scores its doc at cosine 1 (identical server vector)
    val hits = e.search("john likes tea", k = 2).collect()
      .map(r => r.getString(2) -> r.getDouble(1)).toMap
    assert(math.abs(hits("john likes tea") - 1.0) < 1e-9)
    assert(seen.contains("john likes tea"))
    assert(nRequests.get >= 2, "store and query sides must both call out")
  }
}
