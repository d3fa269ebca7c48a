package graft.pipeline

import graft.SparkSuite
import java.security.MessageDigest

/** Differential test for [[PipelineOps.shardManifest]]: recompute
  * every shard row — including the 60-bit md5 hash and the xor
  * checksum — on the driver, and pin the manifest invariants (doc
  * counts sum to the corpus, checksum is order-independent by
  * construction of xor).
  */
class ShardManifestSpec extends SparkSuite {

  private def h60(id: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("pipe_shard_manifest matches a driver recompute") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs
      .map { case (id, nc) => (h60(id) % PipelineOps.ManifestShards, id, nc) }
      .groupBy(_._1).toSeq
      .map { case (s, xs) =>
        (s, xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).min,
          xs.map(_._2).max, xs.map(t => h60(t._2)).reduce(_ ^ _))
      }
      .sortBy(_._1)
    val got = PipelineOps.shardManifest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == docs.length.toLong,
      "shard doc counts must sum to the corpus")
  }
}
