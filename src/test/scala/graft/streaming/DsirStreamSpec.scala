package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import graft.text.TextOps

/** Stream==batch differential for DSIR scoring: the in-row fold over
  * the frozen map literal must reproduce the batch explode+join+agg
  * exactly, doc for doc, across micro-batch boundaries.
  */
class DsirStreamSpec extends SparkSuite {

  private def jsonDoc(id: Long, text: String): String = {
    val q = "\"" + text.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"doc_id": $id, "ts": ${1700000000000L + id}, "text": $q,""" +
      """ "lang": "en", "source": "src0"}"""
  }

  test("streamed DSIR scores equal the batch query row-for-row") {
    val lr = TextOps.dsirLogRatios(spark, sf0001)
    assert(lr.nonEmpty && lr.size <= TextOps.DsirBuckets)

    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val msgs = docs.map { case (id, t) => jsonDoc(id, t) }

    val src = new MemorySource(spark)
    val scored = DsirStream.score(
      IngestCuration.parse(src.load(spark)), lr)
    val q = scored.writeStream.format("memory")
      .queryName("dsir_stream_test").outputMode("append").start()
    try {
      val (b1, b2) = msgs.splitAt(msgs.length / 3)
      src.add(b1); q.processAllAvailable()
      src.add(b2); q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql(
        "select doc_id, n_bigrams, dsir_sum_e6, selected from dsir_stream_test")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val expect = TextOps.textDsirWeight(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got == expect, {
      val diff = (got.keySet ++ expect.keySet)
        .filter(k => got.get(k) != expect.get(k)).take(5)
      s"first diverging docs: ${diff.map(k => (k, got.get(k), expect.get(k)))}"
    })
  }

  test("the scoring projection is stateless (no state store nodes)") {
    val lr = TextOps.dsirLogRatios(spark, sf0001)
    val src = new MemorySource(spark)
    val scored = DsirStream.score(IngestCuration.parse(src.load(spark)), lr)
    val q = scored.writeStream.format("memory")
      .queryName("dsir_stateless_test").outputMode("append").start()
    try {
      src.add(Seq(jsonDoc(1, "a b c d e")))
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.isEmpty,
        s"unexpected stateful operators: ${progress.stateOperators.mkString}")
    } finally q.stop()
  }
}
