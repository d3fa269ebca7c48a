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

  test("chunk ranges tile every payload exactly, last range short") {
    val lens = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(cast(text as binary))")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = MultimodalOps.mmChunkRanges(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cb = MultimodalOps.ChunkBytes
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == lens.filter(_._2 > 0).keySet)
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // dense indices, contiguous non-overlapping ranges covering the
      // payload exactly — the ranged-GET manifest contract
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.zipWithIndex.foreach { case ((_, i, off, len), ix) =>
        assert(off == ix * cb, s"doc $doc chunk $i offset $off")
        assert(len > 0 && len <= cb, s"doc $doc chunk $i len $len")
      }
      assert(sorted.map(_._4).sum == lens(doc),
        s"doc $doc ranges don't sum to payload")
      assert(sorted.init.forall(_._4 == cb),
        s"doc $doc has a short range before the last")
    }
    // the fixture exercises the short-tail case
    assert(got.exists(_._4 < cb), "no short last range in fixture")
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

  test("featurize decodes REAL PNG payloads; text falls back to stub") {
    import org.apache.spark.sql.types._
    // two real PNGs and one text payload through the SAME featurizer
    val rows = Seq(
      (1L, "not an image", MultimodalOps.synthPng(1L)),
      (2L, "also text", MultimodalOps.synthPng(2L)),
      (3L, "plain text payload", "plain text payload".getBytes("UTF-8")))
    val df = spark.createDataFrame(rows)
      .toDF("doc_id", "text", "payload")
    val got = MultimodalOps.featurize(spark, df)
      .select("doc_id", "features.width", "features.height",
        "features.n_frames", "features.mean_luma")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    // PNG rows: true synthesized dims + exact mean of the raster
    Seq(1L, 2L).foreach { id =>
      val (w, h) = MultimodalOps.synthDims(id)
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield MultimodalOps.synthPixel(id, x, y).toLong).sum
      val (gw, gh, gf, gl) = got(id)
      assert(gw == w && gh == h && gf == 1, s"dims at $id: ($gw,$gh,$gf)")
      assert(math.abs(gl - sum.toDouble / (w * h)) < 1e-12, s"luma at $id")
    }
    // text row: the deterministic fake (no ImageIO reader claims it)
    val fake = MultimodalOps.fakeDecode(
      "plain text payload".getBytes("UTF-8"))
    assert(got(3L) == fake, s"text fallback ${got(3L)} vs $fake")
  }

  test("real decode rejects garbage and truncated PNGs cleanly") {
    assert(MultimodalOps.realDecode(Array[Byte](1, 2, 3)).isEmpty)
    assert(MultimodalOps.realDecode(Array.empty[Byte]).isEmpty)
    val truncated = MultimodalOps.synthPng(7L).take(20)
    assert(MultimodalOps.realDecode(truncated).isEmpty)
  }
}
