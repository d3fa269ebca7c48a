package graft.sources

import graft.SparkSuite
import graft.etl.MovieLens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The custom DataSource V2 must (a) parse byte-for-byte what the
  * Hadoop-text fallback parses — including latin-1 titles, (b) keep
  * row ownership exact across byte-range splits, and (c) actually
  * prune and push down (asserted on the planned scan, not trusted).
  */
class DatSourceSpec extends SparkSuite {

  private val usersDat = "/root/reference/datasets/Originales/users.dat"
  private val moviesDat = "/root/reference/datasets/Originales/movies.dat"

  private val userSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("gender", StringType),
    StructField("age", IntegerType),
    StructField("occupation", IntegerType),
    StructField("zip", StringType)))

  private val movieSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("film", StringType),
    StructField("genders", StringType)))

  private def viaV2(path: String, schema: StructType,
      splitBytes: Long = 32L * 1024 * 1024): DataFrame =
    spark.read.format("graftdat").schema(schema)
      .option("splitbytes", splitBytes.toString).load(path)

  private def datScan(df: DataFrame): DatScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head.asInstanceOf[DatScan]

  test("v2 source matches the Hadoop-text reader row-for-row (latin-1)") {
    for ((path, schema) <- Seq((usersDat, userSchema), (moviesDat, movieSchema))) {
      val legacy = MovieLens.readDat(spark, path, schema)
      val v2 = viaV2(path, schema)
      assert(v2.count() == legacy.count())
      assert(v2.exceptAll(legacy).isEmpty && legacy.exceptAll(v2).isEmpty,
        s"row mismatch for $path")
    }
    // the latin-1 payload specifically: accented titles decode right
    // (id 73 = "Misérables, Les (1995)" in movies.dat)
    val title = viaV2(moviesDat, movieSchema)
      .filter(col("id") === 73).select("film").collect()(0).getString(0)
    assert(title.contains("Misérables"), s"latin-1 decode broke: $title")
  }

  test("byte-range splits neither drop nor duplicate boundary lines") {
    val one = viaV2(usersDat, userSchema).collect().map(_.toString).sorted
    // 64 KB floor → the 134 KB file fans out into 3 splits
    val many = viaV2(usersDat, userSchema, splitBytes = 1)
    assert(many.rdd.getNumPartitions >= 2, "expected multiple splits")
    assert(many.collect().map(_.toString).sorted.toSeq == one.toSeq)
  }

  test("column pruning reaches the scan") {
    val df = viaV2(usersDat, userSchema).select("age")
    assert(datScan(df).readSchema().fieldNames.toSeq == Seq("age"))
  }

  test("supported filters are pushed and removed from the post-scan plan") {
    val df = viaV2(usersDat, userSchema).filter(col("age") > 25)
    val scan = datScan(df)
    assert(scan.description().contains("GreaterThan(age,25)"),
      s"not pushed: ${scan.description()}")
    val residualFilters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(residualFilters.isEmpty,
      "fully-pushed predicate still evaluated post-scan")
    // and the result is right
    val expected = MovieLens.readDat(spark, usersDat, userSchema)
      .filter(col("age") > 25).count()
    assert(df.count() == expected)
  }

  test("unsupported filters fall back to Spark evaluation, results equal") {
    val pred = col("zip").endsWith("1") // EndsWith is not pushable here
    val df = viaV2(usersDat, userSchema).filter(pred)
    val scan = datScan(df)
    assert(!scan.description().contains("EndsWith"))
    val expected = MovieLens.readDat(spark, usersDat, userSchema)
      .filter(pred).count()
    assert(df.count() == expected && df.count() > 0)
  }

  test("short-name registration and schema inference work") {
    val df = spark.read.format("graftdat").load(usersDat)
    assert(df.schema.fieldNames.toSeq == Seq("f0", "f1", "f2", "f3", "f4"))
    assert(df.count() ==
      MovieLens.readDat(spark, usersDat, userSchema).count())
  }
}
