package graft.reco

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.SparkSuite

class RecommenderServiceSpec extends SparkSuite {

  private lazy val model = FoldInRecommender.fromFactors(
    Array(10, 11, 12, 13),
    Array(
      Array(1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0),
      Array(1.0, 1.0, 0.0)),
    Map(10 -> "A", 11 -> "B", 12 -> "C", 13 -> "D"))

  private def post(port: Int, path: String, body: String)
      : (Int, String) = {
    val conn = URI.create(s"http://localhost:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    // bodyless responses (404 with length -1) have a null error stream
    val text =
      if (is == null) ""
      else new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, text)
  }

  test("POST /recommend answers the fold-in top-N as JSON") {
    val h = RecommenderService.start(model, spark = Some(spark))
    try {
      val (code, body) = post(h.port, "/recommend",
        """{"ratings":[{"filmId":10,"rating":4},{"filmId":11,"rating":2}]}""")
      assert(code == 200)
      // same algebra as the hand-built-Y RecoSpec case: item 13 = 6/1.1
      // leads, item 12 scores 0
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val recs = mapper.readTree(body).get("recommendations")
      assert(recs.size == 2)
      assert(recs.get(0).get("filmId").asInt == 13)
      assert(recs.get(0).get("title").asText == "D")
      assert(math.abs(recs.get(0).get("score").asDouble - 6.0 / 1.1) < 1e-9)
      assert(recs.get(1).get("filmId").asInt == 12)
      // the request was mirrored into the reference's temp view
      val logged = spark.sql(
        "SELECT filmId, rating FROM last_request_ratings ORDER BY filmId")
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
      assert(logged == Seq((10, 4.0), (11, 2.0)))
    } finally h.stop()
  }

  test("malformed payloads get 400, unknown paths 404 (reference parity)") {
    val h = RecommenderService.start(model)
    try {
      assert(post(h.port, "/recommend", """{"ratings":[]}""")._1 == 400)
      assert(post(h.port, "/recommend", "not json")._1 == 400)
      assert(post(h.port, "/other", "{}")._1 == 404)
    } finally h.stop()
  }
}
