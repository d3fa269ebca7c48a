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
  * the error text on failure; `GET /` serves a self-contained HTML
  * dashboard (the functional twin of `app3/index.html`: three SVG bar
  * panels polling `/counts` every 2 s — written from scratch, no
  * reference markup), 404 elsewhere.
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

  final class Handle private[streaming] (server: HttpServer,
      pool: java.util.concurrent.ExecutorService) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = { server.stop(0); pool.shutdown() }
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
    // Without an explicit executor every request — including the
    // static dashboard page — serializes on the single dispatcher
    // thread, and each /counts request runs a blocking Spark collect:
    // one slow Spark job would freeze the page the browser polls from
    // (r11 advice). A small fixed pool lets static serving and
    // /counts polling proceed independently.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)

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
        if (ex.getRequestMethod == "GET" &&
          (ex.getRequestURI.getPath == "/" ||
            ex.getRequestURI.getPath == "/index.html")) {
          respond(ex, 200, "text/html; charset=utf-8",
            DashboardHtml.getBytes(StandardCharsets.UTF_8))
        } else { ex.sendResponseHeaders(404, -1); ex.close() }
      }
    })
    server.start()
    new Handle(server, pool)
  }

  /** Zero-dependency live dashboard: three bar panels fed by /counts. */
  private[streaming] val DashboardHtml: String =
    """<!DOCTYPE html>
      |<html><head><meta charset="utf-8"/>
      |<title>graft live counts</title>
      |<style>
      | body{font-family:sans-serif;margin:1rem;background:#fafafa}
      | .panel{display:inline-block;vertical-align:top;background:#fff;
      |   border:1px solid #ddd;border-radius:8px;padding:.75rem;
      |   margin:.5rem;min-width:280px}
      | .panel h3{margin:.1rem 0 .5rem}
      |</style></head><body>
      |<h2>Live feedback counts</h2>
      |<div id="state">waiting for data…</div>
      |<div class="panel"><h3>gender</h3><svg id="p_gender" width="280" height="200"></svg></div>
      |<div class="panel"><h3>age</h3><svg id="p_age" width="280" height="200"></svg></div>
      |<div class="panel"><h3>occupation</h3><svg id="p_occupation" width="280" height="280"></svg></div>
      |<script>
      |const NS='http://www.w3.org/2000/svg';
      |function bars(id,counts){
      |  const svg=document.getElementById('p_'+id);
      |  while(svg.firstChild)svg.removeChild(svg.firstChild);
      |  const es=Object.entries(counts||{}).sort((a,b)=>b[1]-a[1]);
      |  if(!es.length)return;
      |  const top=Math.max(...es.map(e=>e[1]));
      |  es.forEach(([k,v],i)=>{
      |    const r=document.createElementNS(NS,'rect');
      |    r.setAttribute('x',0);r.setAttribute('y',i*24);
      |    r.setAttribute('height',18);
      |    r.setAttribute('width',Math.max(2,220*v/top));
      |    r.setAttribute('fill','#3a7bd5');svg.appendChild(r);
      |    const t=document.createElementNS(NS,'text');
      |    t.setAttribute('x',4);t.setAttribute('y',i*24+14);
      |    t.setAttribute('fill','#fff');t.setAttribute('font-size','12');
      |    t.textContent=k+' ('+v+')';svg.appendChild(t);
      |  });
      |}
      |async function tick(){
      |  try{
      |    const r=await fetch('/counts');
      |    const c=await r.json();
      |    document.getElementById('state').textContent=
      |      'updated '+new Date().toLocaleTimeString();
      |    for(const d of ['gender','age','occupation'])bars(d,c[d]);
      |  }catch(e){
      |    document.getElementById('state').textContent='error: '+e;
      |  }
      |}
      |tick();setInterval(tick,2000);
      |</script></body></html>
      |""".stripMargin
}
