package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables
import graft.text.TextOps

/** Differential for [[DriftMonitor.driftStream]]: replay the sf0.001
  * documents through a memory stream in 4 micro-batches; the latest
  * emit_seq snapshot must equal the batch text_drift_psi over the same
  * corpus, and intermediate emissions must exist (live re-scoring).
  */
class DriftMonitorSpec extends SparkSuite {
  import spark.implicits._

  test("streaming drift monitor converges to the batch PSI table") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val esc = r.getString(2).replace("\\", "\\\\").replace("\"", "\\\"")
        s"""{"source": "${r.getString(1)}", "text": "$esc"}"""
      }
    val src = new MemorySource(spark)
    val parsed = src.load(spark)
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "source string, text string")).as("j"))
      .select("j.*")
    val buf = scala.collection.mutable.ArrayBuffer.empty[DriftMonitor.DriftCell]
    val q = DriftMonitor.driftStream(parsed) { out =>
      buf.synchronized { buf ++= out.collect() }
    }.start()
    docs.grouped(math.max(1, docs.length / 4 + 1)).foreach { b =>
      src.add(b.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val maxSeq = buf.map(_.emit_seq).max
    val fin = buf.filter(_.emit_seq == maxSeq)
      .map(c => (c.bin, c.base_n, c.cand_n, c.psi_e6)).sortBy(_._1).toSeq
    val batch = TextOps.textDriftPsi(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(fin == batch, s"stream snapshot $fin != batch $batch")
    assert(buf.map(_.emit_seq).distinct.size >= 3,
      "expected multiple incremental snapshots")
  }
}
