package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Parity tests against the reference's pinned behaviors
  * (FIXTURES.md §1; golden values from Explorativa1_pyspark.ipynb cell
  * outputs).
  */
class MovieLensSpec extends SparkSuite {

  private def writeDat(dir: Path, name: String, lines: Seq[String],
      latin1: Boolean = false): String = {
    val p = dir.resolve(name)
    val cs = if (latin1) StandardCharsets.ISO_8859_1 else StandardCharsets.UTF_8
    Files.write(p, lines.mkString("\n").getBytes(cs))
    p.toString
  }

  private lazy val dir = Files.createTempDirectory("ml_fixture")

  private lazy val moviesPath = writeDat(dir, "movies.dat", Seq(
    "1::Toy Story (1995)::Animation|Children's|Comedy",
    "2::Jumanji (1995)::Adventure|Children's|Fantasy",
    "3::Heat (1995)::Action|Crime|Thriller",
    "4::Yearless Film::Drama",
    "5::Broken Genres (1999)::Comedy||Drama",
    "6::Amélie (2001)::Romance"), latin1 = true)

  private lazy val usersPath = writeDat(dir, "users.dat", Seq(
    "1::F::1::10::48067",
    "2::M::56::16::70072",
    "3::M::25::15::55117",
    "4::M::45::7::02460",
    "5::M::25::20::55455",
    "6::F::50::9::x12",
    "7::M::35::1::09001",
    "8::F::18::3::95370"))

  private lazy val ratingsPath = writeDat(dir, "ratings.dat", Seq(
    "1::1::5::978300760",
    "1::2::3::978302109",
    "2::1::4::978301968",
    "3::3::4::978300275",
    "4::999::2::978824291", // filmId absent from movies -> null attrs
    "5::2::5::978824268"))

  private lazy val movies =
    MovieLens.cleanMovies(
      MovieLens.readDat(spark, moviesPath, MovieLens.moviesSchema))
  private lazy val users =
    MovieLens.enrichUsers(spark,
      MovieLens.readDat(spark, usersPath, MovieLens.usersSchema))

  test("short/blank/malformed lines degrade to null fields, not errors") {
    val p = writeDat(dir, "mangled.dat", Seq(
      "1::F::1::10::48067", // well-formed
      "2::M::56",           // truncated: occupation/zip missing
      "",                   // blank line
      "x::y::z::w::v"))     // wrong types everywhere
    val rows = MovieLens.readDat(spark, p, MovieLens.usersSchema)
      .collect()
    assert(rows.length == 4)
    val truncated = rows.find(r => !r.isNullAt(0) && r.getInt(0) == 2).get
    assert(truncated.isNullAt(3) && truncated.isNullAt(4))
    assert(rows.exists(r => (0 until 5).forall(r.isNullAt))) // blank
    val wrongTypes = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(wrongTypes.exists(_.getString(1) == "y")) // strings survive
  }

  test("movies cleaning: year extract, title strip, genre split+filter") {
    val rows = movies.orderBy("filmId").collect()
    val toy = rows(0)
    assert(toy.getAs[String]("film") == "Toy Story")
    assert(toy.getAs[Int]("year") == 1995)
    assert(toy.getAs[scala.collection.Seq[String]]("genders").toSeq ==
      Seq("Animation", "Children's", "Comedy"))
    // no-year title: year null, film untouched
    val yearless = rows(3)
    assert(yearless.isNullAt(yearless.fieldIndex("year")))
    assert(yearless.getAs[String]("film") == "Yearless Film")
    // empty genre segment dropped
    assert(rows(4).getAs[scala.collection.Seq[String]]("genders").toSeq == Seq("Comedy", "Drama"))
    // latin-1 accent survives
    assert(rows(5).getAs[String]("film") == "Amélie")
  }

  test("users enrichment matches reference golden rows (cell 13 output)") {
    val byId = users.collect().map(r => r.getAs[Int]("userId") -> r).toMap
    // golden from Explorativa1_pyspark.ipynb users_mod show(5)
    assert(byId(1).getAs[String]("occupation") ==
      "Estudiante (Escuela/Instituto)")
    assert(byId(1).getAs[Int]("age_group_mean") == 17)
    assert(byId(1).getAs[String]("age_group_letter") == "A")
    assert(byId(1).getAs[String]("state") == "MI")
    assert(byId(2).getAs[String]("occupation") == "Autónomo")
    assert(byId(2).getAs[Int]("age_group_mean") == 60)
    assert(byId(2).getAs[String]("state") == "LA")
    assert(byId(3).getAs[String]("occupation") == "Científico")
    assert(byId(3).getAs[String]("state") == "MN")
  }

  test("zip_to_state edge cases: leading zeros, short, non-digit, military") {
    val byId = users.collect().map(r => r.getAs[Int]("userId") -> r).toMap
    assert(byId(4).getAs[String]("state") == "MA") // "02460" -> 24 -> MA
    assert(byId(6).getAs[String]("state") == "Other") // "x12" -> 2 digits
    assert(byId(7).getAs[String]("state") == "Other") // military 090 -> 90
    assert(byId(8).getAs[String]("state") == "CA") // 953 -> CA
  }

  test("users schema drops age/zip and keeps reference column set") {
    assert(users.columns.toSet ==
      Set("userId", "gender", "occupation", "age_group_mean",
        "age_group_letter", "state"))
  }

  test("ratings date: epoch->dd/MM/yyyy string in UTC") {
    val ratings = MovieLens.dateRatings(
      MovieLens.readDat(spark, ratingsPath, MovieLens.ratingsSchema))
    val first = ratings.filter(col("userId") === 1 && col("filmId") === 1)
      .select("date").head()
    // 978300760 = 2000-12-31 22:12:40 UTC (session tz pinned to UTC;
    // the reference relied on container-local time, SURVEY §7.4 item 7)
    assert(first.getString(0) == "31/12/2000")
    assert(!ratings.columns.contains("timestamp"))
  }

  test("full join preserves fact rows; unmatched dims yield nulls") {
    val full = MovieLens.buildRatingsFull(spark, moviesPath, usersPath,
      ratingsPath)
    assert(full.count() == 6)
    val orphan = full.filter(col("filmId") === 999).head()
    assert(orphan.isNullAt(orphan.fieldIndex("film")))
    // joined schema matches the reference's ratings_full
    assert(full.columns.toSet == Set("userId", "filmId", "rating", "date",
      "film", "genders", "year", "gender", "occupation", "age_group_mean",
      "age_group_letter", "state"))
  }

  test("topFilms ranks by count with posicion") {
    val full = MovieLens.buildRatingsFull(spark, moviesPath, usersPath,
      ratingsPath)
    val top = MovieLensAnalytics.topFilms(full, 10).collect()
    assert(top.head.getAs[String]("film") == "Toy Story")
    assert(top.head.getAs[Long]("num_notas") == 2)
    assert(top.head.getAs[Int]("posicion") == 1)
    assert(top.map(_.getAs[Int]("posicion")).toSeq ==
      (1 to top.length).toSeq)
  }

  test("topFilmsFullRank (reference-faithful global window) equals topFilms") {
    val full = MovieLens.buildRatingsFull(spark, moviesPath, usersPath,
      ratingsPath)
    val a = MovieLensAnalytics.topFilms(full, 5).collect()
      .map(r => (r.getAs[Int]("filmId"), r.getAs[Int]("posicion"))).toSet
    val b = MovieLensAnalytics.topFilmsFullRank(full, 5).collect()
      .map(r => (r.getAs[Int]("filmId"), r.getAs[Int]("posicion"))).toSet
    assert(a == b)
    // Catalyst must have rewritten the global rank-filter into a top-k
    // (TakeOrderedAndProject) instead of a full single-partition sort
    val plan = MovieLensAnalytics.topFilmsFullRank(full, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("topPerGenre picks the most-rated film in each genre") {
    val full = MovieLens.buildRatingsFull(spark, moviesPath, usersPath,
      ratingsPath)
    val per = MovieLensAnalytics.topPerGenre(full).collect()
      .map(r => r.getAs[String]("genre") ->
        (r.getAs[String]("film"), r.getAs[Long]("num_notas"))).toMap
    assert(per("Animation") == ("Toy Story", 2L))
    assert(per("Adventure") == ("Jumanji", 2L))
    assert(per("Action") == ("Heat", 1L))
    // ties broken by filmId: Toy Story (2) beats Jumanji (2) on Children's
    assert(per("Children's") == ("Toy Story", 2L))
  }

  // ---- full-dataset parity against the reference's persisted artifacts.
  // The artifact of record for every downstream notebook is
  // datasets/Transformados/{users_mod,movies_mod}.parquet; these tests
  // prove our ETL reproduces them row-for-row over ALL rows (6,040 users /
  // 3,883 movies), not just the notebook's show(5) goldens. The reference
  // parquet upcasts int columns to long (pandas writer — SURVEY §1.3), so
  // our output is cast to the persisted schema before the diff.
  private val refData = "/root/reference/datasets"

  private def assertZeroDiff(ours: org.apache.spark.sql.DataFrame,
      ref: org.apache.spark.sql.DataFrame): Unit = {
    val aligned = ours.select(ref.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    assert(aligned.count() == ref.count())
    val missing = ref.exceptAll(aligned).count()
    val extra = aligned.exceptAll(ref).count()
    assert(missing == 0 && extra == 0,
      s"diff vs reference parquet: $missing missing, $extra extra")
  }

  test("enrichUsers reproduces users_mod.parquet over all 6,040 rows") {
    assume(Files.exists(java.nio.file.Paths.get(s"$refData/Transformados/users_mod.parquet")))
    val ref = spark.read.parquet(s"$refData/Transformados/users_mod.parquet")
    val ours = MovieLens.enrichUsers(spark,
      MovieLens.readDat(spark, s"$refData/Originales/users.dat",
        MovieLens.usersSchema))
    assertZeroDiff(ours, ref)
  }

  test("cleanMovies reproduces movies_mod.parquet over all 3,883 rows") {
    assume(Files.exists(java.nio.file.Paths.get(s"$refData/Transformados/movies_mod.parquet")))
    val ref = spark.read.parquet(s"$refData/Transformados/movies_mod.parquet")
    val ours = MovieLens.cleanMovies(
      MovieLens.readDat(spark, s"$refData/Originales/movies.dat",
        MovieLens.moviesSchema))
    assertZeroDiff(ours, ref)
  }

  test("genresWon re-aggregates the per-genre winners (A3, cell 9)") {
    val full = MovieLens.buildRatingsFull(spark, moviesPath, usersPath,
      ratingsPath)
    val rows = MovieLensAnalytics.genresWon(full).collect()
      .map(r => (r.getAs[Int]("filmId"), r.getAs[String]("film"),
        r.getAs[Long]("num_notas"), r.getAs[Long]("cant")))
    // Toy Story wins Animation+Children's+Comedy; Heat wins its 3 solo
    // genres; Jumanji keeps Adventure+Fantasy (loses Children's on the
    // filmId tiebreak). Order: cant desc, num_notas desc, filmId asc.
    assert(rows.toSeq == Seq(
      (1, "Toy Story", 2L, 3L),
      (3, "Heat", 1L, 3L),
      (2, "Jumanji", 2L, 2L)))
  }

  test("genreCounts explodes and counts") {
    val counts = MovieLensAnalytics.genreCounts(movies).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("Children's") == 2)
    assert(counts("Comedy") == 2)
    assert(counts("Romance") == 1)
  }
}
