package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Stream==batch differential for the admission pipeline: replaying the
  * WHOLE document table through the stream (corpus rows included, plus
  * at-least-once retries) must admit exactly the docs the equivalent
  * batch computation keeps — quality-keep, first occurrence per
  * fingerprint, fingerprint not already in the standing corpus.
  */
class IngestCurationSpec extends SparkSuite {

  private val base = 1700000000000L

  private def jsonDoc(id: Long, text: String, lang: String, source: String,
      tsMs: Long): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"doc_id": $id, "ts": ${base + tsMs}, "text": ${q(text)},""" +
      s""" "lang": ${q(lang)}, "source": ${q(source)}}"""
  }

  test("streaming admission equals the batch quality+dedup+screen") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    val msgs = docs.map { case (id, t, l, s) => jsonDoc(id, t, l, s, id * 100) }

    val src = new MemorySource(spark)
    val admitted = IngestCuration.admit(
      IngestCuration.parse(src.load(spark)),
      IngestCuration.corpusFingerprints(spark, sf0001))
    val q = admitted.writeStream.format("memory")
      .queryName("ingest_admit_test").outputMode("append").start()
    // two ordered batches, then re-deliver a slice of the first batch
    // with drifted timestamps (at-least-once retry): nothing new may
    // be admitted for those
    val (b1, b2) = msgs.splitAt(msgs.length / 2)
    src.add(b1); q.processAllAvailable()
    src.add(b2); q.processAllAvailable()
    src.add(docs.take(20).map { case (id, t, l, s) =>
      jsonDoc(id, t, l, s, id * 100 + 5000)
    }); q.processAllAvailable()
    val got = spark.sql("select doc_id from ingest_admit_test")
      .collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "a doc was admitted twice")

    // independent batch mirror over the same replay order
    import org.apache.spark.sql.expressions.Window
    val fpExpr = "md5(array_join(array_sort(array_distinct(" +
      "split(lower(text), ' '))), ' '))"
    val keep = graft.text.TextOps
      .withQualityReason(Tables.documents(spark, sf0001))
      .filter(col("reason") === "keep")
      .withColumn("fp", expr(fpExpr))
    val firstPerFp = keep.withColumn("rn",
        row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val corpusFp = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 4 =!= 0).select(expr(fpExpr).as("fp"))
    val expected = firstPerFp
      .join(corpusFp, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.toSet == expected,
      s"missed ${expected -- got.toSet}; spurious ${got.toSet -- expected}")
    // fixture must exercise all three stages: some docs rejected by
    // quality, some deduped, some screened by the corpus, some admitted
    assert(expected.nonEmpty && expected.size < docs.length)
    q.stop()
  }
}
