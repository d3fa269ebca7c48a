package graft.multimodal

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("featurize appends a well-typed feature struct per row") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val out = MultimodalOps.featurize(spark, docs)
    assert(out.schema.fieldNames.contains("features"))
    assert(out.schema("features").dataType == MultimodalOps.featureSchema)
    val rows = out.select("doc_id", "features.width", "features.height",
      "features.n_frames", "features.mean_luma").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(3) >= 1)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 255.0)
    }
  }

  test("featurize is deterministic (same payload, same features)") {
    val docs = Tables.documents(spark, sf0001).limit(10)
    val a = MultimodalOps.featurize(spark, docs)
      .select("doc_id", "features").collect().map(_.toString).sorted
    val b = MultimodalOps.featurize(spark, docs)
      .select("doc_id", "features").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("resizePlan matches a driver fakeDecode + integer-fit recompute") {
    val docs = Tables.documents(spark, sf0001)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = MultimodalOps.resizePlan(spark, docs).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val (w, h, _, _) =
        MultimodalOps.fakeDecode(texts(r.getLong(0)).getBytes("UTF-8"))
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc ${r.getLong(0)} dims")
      val long = math.max(w, h)
      assert(r.getLong(3) == math.max(1, w * 224 / long))
      assert(r.getLong(4) == math.max(1, h * 224 / long))
      // the fit preserves the budget: long side exactly 224 (dims >= 16)
      assert(math.max(r.getLong(3), r.getLong(4)) == 224L)
    }
  }

  test("sampleFrames explodes by stride with distinct frame hashes") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val frames = MultimodalOps.sampleFrames(spark, docs, stride = 8)
    val byDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("frame_sha")).as("d"))
      .collect()
    assert(byDoc.nonEmpty)
    // every sampled frame of a doc hashes differently
    byDoc.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }
}
