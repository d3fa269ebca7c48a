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

  test("synthWav bytes parse via an INDEPENDENT manual RIFF walk") {
    // independent of javax.sound.sampled: walk the RIFF chunks by hand
    // and check the fmt fields and every PCM sample against the synth
    def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    Seq(0L, 1L, 42L, 100L, 437L).foreach { id =>
      val wav = MultimodalOps.synthWav(id)
      assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      var off = 12
      var fmtOk = false
      var data: Option[Array[Byte]] = None
      while (off + 8 <= wav.length) {
        val ckId = new String(wav.slice(off, off + 4), "US-ASCII")
        val ckSz = le32(wav, off + 4)
        if (ckId == "fmt ") {
          assert(le16(wav, off + 8) == 1, "PCM format tag")
          assert(le16(wav, off + 10) == 1, "mono")
          assert(le32(wav, off + 12) == 8000, "sample rate")
          assert(le16(wav, off + 22) == 16, "bit depth")
          fmtOk = true
        } else if (ckId == "data") {
          data = Some(wav.slice(off + 8, off + 8 + ckSz))
        }
        off += 8 + ckSz + (ckSz & 1)
      }
      assert(fmtOk, s"no fmt chunk for id $id")
      val expected = MultimodalOps.synthAudioSamples(id)
      val pcm = data.getOrElse(fail(s"no data chunk for id $id"))
      assert(pcm.length == expected.length * 2, s"pcm bytes for id $id")
      expected.zipWithIndex.foreach { case (s, i) =>
        assert(le16(pcm, i * 2).toShort == s, s"sample $i of id $id")
      }
    }
  }

  test("mm_audio_decode matches a driver arithmetic recompute") {
    val got = MultimodalOps.mmAudioDecode(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5))).toMap
    assert(got.size == 500)
    got.keys.foreach { id =>
      val samples = MultimodalOps.synthAudioSamples(id)
      val exp = (8000, 1, 16, samples.length,
        samples.foldLeft(0L)(_ + _))
      assert(got(id) == exp, s"doc $id: ${got(id)} vs $exp")
    }
  }
}
