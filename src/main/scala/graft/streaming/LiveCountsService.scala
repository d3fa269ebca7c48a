package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HTTP dashboard shim over the live-counts memory sink — the
  * reference's `GET /counts` endpoint (`app3/live_counts.py:73-95`):
  * answers `{"gender": {...}, "occupation": {...}, "age": {...}}`
  * computed from the accumulated `feedback_raw`-style table, 500 with
  * the error text on failure, 404 elsewhere (the reference serves its
  * static dashboard on other paths; the engine shim has no files to
  * serve).
  *
  * Same serving pattern as [[graft.reco.RecommenderService]]: JDK
  * built-in HttpServer + Spark's own Jackson, zero added dependencies.
  * One deviation, documented: the reference pulls the whole table to
  * pandas and `value_counts` per request — here the three categorical
  * counts are ONE Spark aggregation over the memory sink (count per (gender, occupation,
  * age_bin) triple, bounded by the tiny category product, with the
  * three marginals summed on the driver), so the request cost is an
  * in-memory scan + tiny agg, not a full driver materialization of
  * every row ever received.
  */
object LiveCountsService {

  final class Handle private[streaming] (server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Counts for the three dashboard dimensions, computed in Spark.
    * Exposed for tests and reuse by non-HTTP front ends.
    */
  def computeCounts(spark: SparkSession, table: String)
      : Map[String, Map[String, Long]] = {
    val rows = spark.table(table)
      .select(col("gender"), col("occupation"), col("age_bin"))
      .groupBy(col("gender"), col("occupation"), col("age_bin"))
      .agg(count(lit(1)).as("n"))
      .collect()
    def tally(dim: Int): Map[String, Long] = rows.iterator
      .filter(r => !r.isNullAt(dim))
      .toSeq.groupBy(_.getString(dim))
      .map { case (k, rs) => k -> rs.map(_.getLong(3)).sum }
    Map("gender" -> tally(0), "occupation" -> tally(1), "age" -> tally(2))
  }

  def start(spark: SparkSession, table: String, port: Int = 0): Handle = {
    val mapper = new ObjectMapper()
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    def respond(ex: HttpExchange, code: Int, contentType: String,
        body: Array[Byte]): Unit = {
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    }

    server.createContext("/counts", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (ex.getRequestMethod != "GET") {
          ex.sendResponseHeaders(404, -1); ex.close(); return
        }
        try {
          val counts = computeCounts(spark, table)
          val out = mapper.createObjectNode()
          Seq("gender", "occupation", "age").foreach { dim =>
            val o = out.putObject(dim)
            counts(dim).toSeq.sortBy(_._1).foreach { case (k, v) =>
              o.put(k, v)
            }
          }
          respond(ex, 200, "application/json",
            mapper.writeValueAsBytes(out))
        } catch {
          case e: Exception =>
            respond(ex, 500, "text/plain",
              String.valueOf(e.getMessage)
                .getBytes(StandardCharsets.UTF_8))
        }
      }
    })
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(404, -1); ex.close()
      }
    })
    server.start()
    new Handle(server)
  }
}
