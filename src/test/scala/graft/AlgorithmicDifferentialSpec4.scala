package graft

/** Fourth differential batch: the multimodal planning ops re-derived
  * on the driver, including an independent replay of the fake-decode
  * arithmetic (Java Arrays.hashCode int32 wraparound, truncating
  * division) that the stub, the Spark plan, and the DuckDB oracle all
  * share.
  */
class AlgorithmicDifferentialSpec4 extends SparkSuite {

  private def sha256hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String)] =
    graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  // independent hashCode replay: h = fold(1, 31*h + signedByte) int32
  private def javaArrayHash(bytes: Array[Byte]): Int =
    bytes.foldLeft(1)((h, b) => 31 * h + b)

  test("mm_binary_meta equals driver byte length + sha256") {
    val want = docs.map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      id -> ((b.length.toLong, sha256hex(b)))
    }.toMap
    val got = graft.multimodal.MultimodalOps.mmBinaryMeta(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Number](1).longValue(), r.getString(2)))).toMap
    assert(got == want)
  }

  test("mm_frame_sample equals a driver fake-decode frame plan") {
    val want = docs.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val h = javaArrayHash(b)
      val nFrames = 1 + math.abs((h / 7) % 32)
      (0 until nFrames by 8).map { f =>
        (id, f, sha256hex(b ++ f.toString.getBytes("UTF-8")))
      }
    }.toSet
    val got = {
      val s = spark
      graft.SparkEntry.queries("mm_frame_sample")(s, sf0001).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    }
    assert(got == want)
  }

  test("mm_resize_plan equals a driver aspect-fit computation") {
    val want = docs.map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val h = javaArrayHash(b)
      val w = 16 + math.abs(h % 1024)
      val ht = 16 + math.abs((h / 1024) % 1024)
      val long = math.max(w, ht)
      val nw = math.max(1, w * 224 / long)
      val nh = math.max(1, ht * 224 / long)
      (id, w, ht, nw, nh,
        sha256hex((text + "x" + nw + "x" + nh).getBytes("UTF-8")))
    }.toSet
    val got = graft.SparkEntry.queries("mm_resize_plan")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue(),
        r.getAs[Number](2).intValue(), r.getAs[Number](3).intValue(),
        r.getAs[Number](4).intValue(), r.getString(5))).toSet
    assert(got == want)
  }
}
