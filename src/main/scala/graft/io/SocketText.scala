package graft.io

import java.io.{BufferedWriter, OutputStreamWriter, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** Loopback text server backing Spark's `socket` streaming source — the
  * push-based source family (SURVEY.md §2.2 "sources other than local
  * text") that file replay cannot represent: rows arrive over a TCP
  * connection with no filesystem listing, no replay, and no end-of-stream
  * marker, exactly like Flink's `socketTextStream` ingestion shape.
  *
  * Scale note: Spark's socket source is driver-side and single-connection
  * BY DESIGN (the engine documents it as a test/demo source — there is no
  * partitioned ingest to distribute); the distributed-scale paths in this
  * repo are the file/parquet streams and JDBC ranges. What the socket form
  * proves is the operator contract: the keyed-state ops are
  * source-agnostic, running unchanged on a non-replayable push source.
  *
  * Protocol: the caller `start()`s a streaming query reading from
  * [[port]], then calls [[accept]] (blocking, bounded by `soTimeoutMs`)
  * once the source has connected, and [[send]]s line chunks from the
  * driver thread. Sending chunk N+1 only after the caller has OBSERVED
  * chunk N's rows in the sink forces a micro-batch boundary between
  * chunks — the cross-batch state witness the specs pin. TCP preserves
  * line order, so per-key `ord` order survives end to end.
  */
final class SocketText(soTimeoutMs: Int = 60000) extends AutoCloseable {
  private val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
  server.setSoTimeout(soTimeoutMs)
  private var client: Socket = _
  private var out: PrintWriter = _

  def host: String = server.getInetAddress.getHostAddress
  def port: Int = server.getLocalPort

  /** Block until the socket source connects (the query must already be
    * started — Spark connects when the first micro-batch is planned). */
  def accept(): Unit = {
    client = server.accept()
    out = new PrintWriter(new BufferedWriter(new OutputStreamWriter(
      client.getOutputStream, StandardCharsets.UTF_8)))
  }

  /** Write one chunk of lines and flush. The connection stays open — the
    * socket source treats EOF as a source failure, so lifetime is managed
    * by [[close]] after the query is stopped, never by shutting the pipe. */
  def send(lines: Iterable[String]): Unit = {
    require(out != null, "send() before accept(): the source never connected")
    lines.foreach(out.println)
    out.flush()
  }

  override def close(): Unit = {
    if (client != null) client.close()
    server.close()
  }
}
