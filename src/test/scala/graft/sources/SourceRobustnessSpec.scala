package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Source-layer robustness the engine relies on at ingest time:
  * the binaryFile format for opaque media payloads (the real-world
  * entry point the multimodal family's synthetic payloads stand in
  * for), and the three CSV malformed-record policies.
  */
class SourceRobustnessSpec extends SparkSuite {

  test("binaryFile source: schema, content, and pushed path filter") {
    val dir = Files.createTempDirectory("graft_bin")
    val payloads = Map(
      "a.img" -> "fake-image-bytes".getBytes(StandardCharsets.UTF_8),
      "b.img" -> Array.tabulate(256)(_.toByte),
      "c.txt" -> "not-an-image".getBytes(StandardCharsets.UTF_8))
    payloads.foreach { case (name, bytes) =>
      Files.write(dir.resolve(name), bytes)
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img") // prune non-media at the SOURCE
      .load(dir.toString)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = df
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), sha2(col("content"), 256).as("sha"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows.keySet == Set("a.img", "b.img"), "glob filter leaked")
    payloads.filter(_._1.endsWith(".img")).foreach { case (name, bytes) =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val want = md.digest(bytes).map("%02x".format(_)).mkString
      assert(rows(name) == ((bytes.length.toLong, want)), s"payload $name")
    }
  }

  test("CSV malformed-record policies: permissive, drop, failfast") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.write(dir.resolve("rows.csv"), java.util.Arrays.asList(
      "id,qty", "1,10", "2,not_a_number", "3,30"),
      StandardCharsets.UTF_8)
    val schema = "id INT, qty INT, _corrupt_record STRING"

    val permissive = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(dir.toString)
      // SPARK-21610: corrupt-record rows materialize only when a data
      // column is also selected from a cached/complete parse
      .cache()
    assert(permissive.count() == 3, "permissive keeps every row")
    val corrupt = permissive.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(corrupt.toSeq == Seq("2,not_a_number"),
      s"corrupt capture: ${corrupt.toSeq}")

    val dropped = spark.read.schema("id INT, qty INT")
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(dir.toString)
    assert(dropped.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))

    // collect(), not count(): count() prunes every column, so the bad
    // cell is never parsed and FAILFAST has nothing to fail on
    val failfast = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id INT, qty INT")
        .option("header", "true").option("mode", "FAILFAST")
        .csv(dir.toString).collect()
    }
    // the malformed-record error sits in the cause chain under the
    // generic FAILED_READ_FILE wrapper
    val chain = Iterator.iterate(failfast: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.toLowerCase.contains("malformed"),
      s"unexpected failure chain: ${chain.take(300)}")
  }
}
