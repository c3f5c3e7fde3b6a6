package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.DataFrame

/** Authenticated HTTP bulk-insert transport — the reference's ClickHouse
  * write path reproduced natively (SURVEY §2 A11/A12;
  * `/root/reference/trace-converter.py:5-17,66-72`): each batch is
  * serialized to JSONEachRow and POSTed to
  * `ADDR?database=DB&query=INSERT INTO TABLE FORMAT JSONEachRow` with
  * HTTP Basic credentials.
  *
  * Execution shape: `df.toJSON` runs distributed (per-partition Jackson
  * serialization, no driver funnel); each PARTITION posts one blob from
  * its executor — the reference's one-file-one-POST contract at
  * partition grain, which is what a 1000-executor cluster needs (the
  * driver never sees the data; a failed POST throws, the task retries,
  * and at-least-once delivery matches the reference's semantics, whose
  * store dedups on merge). `partitions` (default: leave as-is) lets a
  * caller coalesce first when the remote prefers fewer, larger inserts.
  *
  * Streaming: pass [[append]] inside `writeStream.foreachBatch` — one
  * micro-batch = one logical insert, the A11 batch-at-once contract.
  *
  * No ClickHouse ships in this environment, so the integration tests run
  * against an in-JDK embedded HTTP server ([[graft.sinks.HttpSinkSpec]])
  * capturing auth, query params and bodies byte-for-byte.
  */
object HttpBulkSink {

  final case class Config(addr: String, database: String, table: String,
                          user: Option[String] = None, pass: Option[String] = None)

  /** One client per JVM (HttpClient is thread-safe): a client per POST
    * would spawn a selector thread + pool each insert and re-do
    * connection setup every micro-batch. */
  @transient private lazy val client: HttpClient = HttpClient.newHttpClient()

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private[sources] def insertUri(c: Config): URI =
    new URI(s"${c.addr}?database=${enc(c.database)}" +
      s"&query=${enc(s"INSERT INTO ${c.table} FORMAT JSONEachRow")}")

  private[sources] def authHeader(c: Config): Option[String] =
    for (u <- c.user; p <- c.pass) yield
      "Basic " + Base64.getEncoder.encodeToString(
        s"$u:$p".getBytes(StandardCharsets.UTF_8))

  /** POST one JSONEachRow blob; throws on any non-2xx status (task retry
    * → at-least-once, the reference's failure contract: keep the file,
    * print the error — trace-converter.py:109-112). */
  private[sources] def post(c: Config, blob: String): Unit = {
    val b = HttpRequest.newBuilder(insertUri(c))
      .POST(HttpRequest.BodyPublishers.ofString(blob, StandardCharsets.UTF_8))
      .header("Content-Type", "application/x-ndjson")
    authHeader(c).foreach(b.header("Authorization", _))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"bulk insert to ${c.addr} failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
  }

  /** Max bytes buffered per POST: a whole partition as one String would
    * tie task memory to partition size (multi-GB at the target scale) —
    * chunking bounds memory while keeping requests few and large. */
  private val MaxPostBytes = 8 << 20

  /** Bulk-insert `df`: executor-side POSTs, one per ≤[[MaxPostBytes]]
    * chunk per (non-empty) partition. */
  def append(df: DataFrame, c: Config, partitions: Option[Int] = None): Unit = {
    val json = partitions.fold(df)(n => df.coalesce(n)).toJSON
    json.foreachPartition { rows: Iterator[String] =>
      val buf = new java.lang.StringBuilder
      rows.foreach { r =>
        buf.append(r).append('\n')
        if (buf.length >= MaxPostBytes) { post(c, buf.toString); buf.setLength(0) }
      }
      if (buf.length > 0) post(c, buf.toString)
    }
  }

  /** Execute one SQL statement over the same transport (the reference's
    * `create_schema` path — trace-converter.py:58-61: `CREATE DATABASE
    * IF NOT EXISTS` + table DDL posted as the request body, database
    * selection via query param). Driver-side single POST; idempotent
    * when the statement is IF NOT EXISTS, like the original. */
  def exec(c: Config, statement: String, withDatabase: Boolean = true): Unit = {
    val uri = new URI(c.addr +
      (if (withDatabase) s"?database=${enc(c.database)}" else ""))
    val b = HttpRequest.newBuilder(uri)
      .POST(HttpRequest.BodyPublishers.ofString(statement, StandardCharsets.UTF_8))
    authHeader(c).foreach(b.header("Authorization", _))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"DDL exec on ${c.addr} failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
  }

  /** The reference's bootstrap (`--create-schema`): create the database
    * (no database param — it may not exist yet), then the table DDL
    * against it. `Ddl.clickhouse` produces the statement. */
  def createSchema(c: Config, tableDdl: String): Unit = {
    exec(c, s"CREATE DATABASE IF NOT EXISTS ${c.database}", withDatabase = false)
    exec(c, tableDdl)
  }
}
