package graft.streaming

import graft.SparkSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** End-to-end check for the /counts dashboard shim: MemoryStream →
  * FeedbackPipeline parse + memory sink → HTTP GET /counts, compared
  * against a driver-side tally of the generated messages.
  */
class LiveCountsServiceSpec extends SparkSuite {

  private def get(port: Int, path: String): (Int, String) = {
    val url = java.net.URI.create(s"http://localhost:$port$path").toURL
    val conn = url.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (in == null) "" else
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    conn.disconnect()
    (code, body)
  }

  test("GET /counts returns the gender/occupation/age_bin tallies") {
    val src = new MemorySource(spark)
    val parsed = FeedbackPipeline.parse(src.load(spark))
    val q = FeedbackPipeline.startMemoryAppend(parsed, "feedback_http")
    val svc = LiveCountsService.start(spark, "feedback_http")
    try {
      // empty table: the endpoint answers with three empty objects
      val (c0, b0) = get(svc.port, "/counts")
      assert(c0 == 200)
      val m = new ObjectMapper()
      val empty = m.readTree(b0)
      assert(Seq("gender", "occupation", "age").forall(d =>
        empty.path(d).isObject && empty.path(d).size == 0), b0)

      val msgs = FeedbackGenerator.batch("inserso", 0, 20) ++
        FeedbackGenerator.batch("masculino", 0, 15) ++
        FeedbackGenerator.batch("random", 0, 10)
      src.add(msgs)
      q.processAllAvailable()

      val (code, body) = get(svc.port, "/counts")
      assert(code == 200)
      val got = m.readTree(body)

      // independent driver tally over the raw JSON messages
      def field(msg: String, k: String): String = {
        val n = m.readTree(msg)
        if (k == "age") {
          val a = n.get("age").asInt
          if (a < 18) "<18" else if (a <= 24) "18-24"
          else if (a <= 34) "25-34" else if (a <= 44) "35-44"
          else if (a <= 49) "45-49" else if (a <= 55) "50-55" else "56+"
        } else n.get(if (k == "age") "age" else k).asText
      }
      Seq("gender" -> "gender", "occupation" -> "occupation",
        "age" -> "age").foreach { case (dim, k) =>
        val want = msgs.groupBy(field(_, k)).view.mapValues(_.size).toMap
        val node = got.path(dim)
        val names = {
          val it = node.fieldNames()
          Iterator.continually(if (it.hasNext) it.next() else null)
            .takeWhile(_ != null).toSeq
        }
        val gm = names.map(n => n -> node.get(n).asLong()).toMap
        assert(gm == want.map { case (a, b) => a -> b.toLong },
          s"$dim: got $gm want $want")
      }

      // the root serves the self-contained dashboard page
      val (hc, hb) = get(svc.port, "/")
      assert(hc == 200 && hb.contains("<svg") && hb.contains("/counts"), hb.take(120))
      // contract edges: other paths 404
      assert(get(svc.port, "/nope")._1 == 404)
    } finally { svc.stop(); q.stop() }
  }
}
