package graft

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.security.MessageDigest
import java.util.Base64

/** RFC 6455 websocket server for the dev watch live-reload channel
  * (ref: server/dev/watch.go:321-443): a browser tab opened with
  * `?dev=ws://localhost:<port>/ws` connects to
  * `/ws?dashboardId=<id>`, and every watch deploy of that dashboard
  * broadcasts one text frame `{"type":"reload","dashboardId":"<id>"}`
  * (watch.go:416-440). [[notify]] reports whether anyone was listening
  * — the watch loop opens a browser when it returns false
  * (watch.go:260-290), which is exactly how the reference decides
  * between "reload the open tab" and "open a new one".
  *
  * Dependency-free: the reference leans on gobwas/ws, and the JDK
  * ships a websocket CLIENT (`java.net.http.WebSocket`, which the spec
  * uses to talk to this server) but no server — so the handshake and
  * framing are hand-rolled for the protocol subset the reference
  * exercises: the HTTP upgrade (Sec-WebSocket-Accept =
  * base64(SHA-1(key + RFC magic))), UNMASKED server→client text
  * frames, client close echoed and ping answered with a matching
  * pong, all other client data read and discarded (the reference
  * "doesn't expect any", watch.go:386-392). One daemon thread per
  * connection, like the reference's per-conn goroutine.
  */
final class LiveReload(log: String => Unit = _ => ()) extends AutoCloseable {
  private val server = new ServerSocket(0)
  /** Random port, the reference's `net.Listen(":0")` (watch.go:324). */
  val port: Int = server.getLocalPort

  private final case class Conn(id: String, socket: Socket, out: OutputStream)
  private val conns = scala.collection.mutable.Map.empty[String, List[Conn]]
  @volatile private var running = true

  private def acceptLoop(): Unit = {
    while (running) {
      val s = try server.accept() catch { case _: Exception => return }
      val t = new Thread(() => handle(s), "graft-dev-ws-conn")
      t.setDaemon(true)
      t.start()
    }
  }
  private val acceptor = new Thread(() => acceptLoop(), "graft-dev-ws-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(socket: Socket): Unit = {
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    def fail(status: String, msg: String): Unit = {
      out.write((s"HTTP/1.1 $status\r\nContent-Type: text/plain\r\n" +
        s"Content-Length: ${msg.length}\r\nConnection: close\r\n\r\n$msg").getBytes(UTF_8))
      out.flush(); socket.close()
    }
    try {
      val (path, headers) = readRequest(in)
      val (route, query) = path.span(_ != '?')
      val params = query.stripPrefix("?").split("&").collect {
        case kv if kv.contains('=') =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      if (route != "/ws") { fail("404 Not Found", "not found"); return }
      val dashboardId = params.getOrElse("dashboardId", "")
      if (dashboardId.isEmpty) {
        // watch.go:353-356: dashboardId is required
        fail("400 Bad Request", "dashboardId parameter required"); return
      }
      val key = headers.getOrElse("sec-websocket-key", "")
      if (key.isEmpty || !headers.getOrElse("upgrade", "")
          .equalsIgnoreCase("websocket")) {
        fail("400 Bad Request", "websocket upgrade required"); return
      }
      val accept = Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(ISO_8859_1)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(ISO_8859_1))
      out.flush()
      val conn = Conn(dashboardId + "-" + System.nanoTime(), socket, out)
      conns.synchronized {
        conns(dashboardId) = conn :: conns.getOrElse(dashboardId, Nil)
      }
      log(s"WebSocket connection established for dashboard '$dashboardId'")
      try readLoop(in, out)
      finally {
        conns.synchronized {
          val rest = conns.getOrElse(dashboardId, Nil).filterNot(_.id == conn.id)
          if (rest.isEmpty) conns.remove(dashboardId) else conns(dashboardId) = rest
        }
        try socket.close() catch { case _: Exception => () }
        log(s"WebSocket connection closed for dashboard '$dashboardId'")
      }
    } catch { case _: Exception => try socket.close() catch { case _: Exception => () } }
  }

  /** Request line + headers up to the blank line; returns (path,
    * lower-cased header map). */
  private def readRequest(in: InputStream): (String, Map[String, String]) = {
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    val request = line()
    val parts = request.split(" ")
    if (parts.length < 2 || parts(0) != "GET")
      throw new java.io.IOException(s"bad request line: $request")
    val headers = Iterator.continually(line()).takeWhile(_.nonEmpty).flatMap { h =>
      val i = h.indexOf(':')
      if (i < 0) None else Some(h.substring(0, i).toLowerCase -> h.substring(i + 1).trim)
    }.toMap
    (parts(1), headers)
  }

  /** Reads client frames until close/EOF: close echoed, ping answered
    * with a pong carrying the (unmasked) payload, everything else
    * discarded. */
  private def readLoop(in: InputStream, out: OutputStream): Unit = {
    while (true) {
      val b0 = in.read(); if (b0 == -1) return
      val b1 = in.read(); if (b1 == -1) return
      val opcode = b0 & 0x0f
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7f
      if (len == 126) len = (in.read() << 8 | in.read()).toLong
      else if (len == 127) {
        len = 0
        for (_ <- 0 until 8) len = (len << 8) | in.read()
      }
      val mask = new Array[Byte](4)
      if (masked) { var i = 0; while (i < 4) { mask(i) = in.read().toByte; i += 1 } }
      val payload = new Array[Byte](math.min(len, 125L).toInt)
      var read = 0L
      while (read < len) {
        val c = in.read(); if (c == -1) return
        if (read < payload.length)
          payload(read.toInt) = (c ^ (if (masked) mask((read % 4).toInt) else 0)).toByte
        read += 1
      }
      opcode match {
        case 0x8 => // close: echo and drop the connection
          out.synchronized { out.write(Array(0x88.toByte, 0x00.toByte)); out.flush() }
          return
        case 0x9 => // ping -> pong with the same payload
          out.synchronized {
            out.write(0x8A); out.write(payload.length); out.write(payload); out.flush()
          }
        case _ => () // client data: not expected, discarded (watch.go:388)
      }
    }
  }

  /** One unmasked server→client text frame. */
  private def writeText(out: OutputStream, msg: String): Unit = {
    val bytes = msg.getBytes(UTF_8)
    out.synchronized {
      out.write(0x81)
      if (bytes.length < 126) out.write(bytes.length)
      else { // reload messages are short, but keep 16-bit lengths correct
        out.write(126); out.write(bytes.length >> 8); out.write(bytes.length & 0xff)
      }
      out.write(bytes)
      out.flush()
    }
  }

  /** Broadcast the reload message to every connection of
    * `dashboardId`; false when nobody is listening (the caller's
    * open-a-browser signal, watch.go:416-423). Broken connections are
    * dropped by their read loops. */
  def notify(dashboardId: String): Boolean = {
    val targets = conns.synchronized { conns.getOrElse(dashboardId, Nil) }
    if (targets.isEmpty) return false
    val msg = s"""{"type":"reload","dashboardId":"$dashboardId"}"""
    targets.foreach { c =>
      try writeText(c.out, msg)
      catch { case _: Exception => () } // read loop will clean up
    }
    true
  }

  /** Connection count for a dashboard (test introspection). */
  private[graft] def connections(dashboardId: String): Int =
    conns.synchronized { conns.getOrElse(dashboardId, Nil).size }

  override def close(): Unit = {
    running = false
    conns.synchronized {
      conns.values.flatten.foreach(c =>
        try c.socket.close() catch { case _: Exception => () })
      conns.clear()
    }
    try server.close() catch { case _: Exception => () }
  }
}
