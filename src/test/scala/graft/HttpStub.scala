package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback HTTP stub shared by the transport and streaming suites: pages
  * keyed by path suffix; failures[path] = responses to serve before the real
  * page (status code, optional Retry-After seconds). Missing paths 404 —
  * which the streaming frontier probe treats as "no such page yet".
  */
final class HttpStub {
  val hits = new ConcurrentHashMap[String, AtomicInteger]()
  @volatile var pages: Map[String, String] = Map.empty
  @volatile var failures: Map[String, Seq[(Int, Option[Int])]] = Map.empty
  val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (x: HttpExchange) => {
    val path = x.getRequestURI.getPath
    val n = hits.computeIfAbsent(path, _ => new AtomicInteger()).getAndIncrement()
    val planned = failures.getOrElse(path, Seq.empty)
    if (n < planned.size) {
      val (code, retryAfter) = planned(n)
      retryAfter.foreach(s => x.getResponseHeaders.add("Retry-After", s.toString))
      x.sendResponseHeaders(code, -1)
    } else pages.get(path) match {
      case Some(body) =>
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes)
      case None => x.sendResponseHeaders(404, -1)
    }
    x.close()
  })
  server.start()
  def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
  def hitCount(path: String): Int =
    Option(hits.get(path)).map(_.get()).getOrElse(0)
}

object HttpStub {
  /** One canned bar page in the upstream response shape. */
  def barPage(ts: Seq[Long], next: Option[String]): String = {
    val bars = ts.map(t =>
      s"""{"t":$t,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":100.0,"vw":1.2,"n":3}""")
      .mkString("[", ",", "]")
    s"""{"status":"OK","results":$bars,"next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}"""
  }
}
