package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's exploratory analytics over `ratings_full`
  * (`Explorativa/Explorativa2.ipynb` cells 5-9) — top-K films, top film
  * per genre, genre counts.
  */
object MovieLensAnalytics {

  /** Ratings-count per film with global rank (`posicion`).
    * Reference: `Explorativa2.ipynb:133-140` (cell 5) ranks the FULL
    * table through a single-partition window (C12 anti-pattern). Here:
    * aggregate, take top `limit` via TakeOrderedAndProject, and only
    * rank those — identical output for any asked-for prefix, scalable
    * input. `groupBy` includes the array column `genders` exactly as
    * the reference does (A2).
    */
  def topFilms(ratingsFull: DataFrame, limit: Int = 100): DataFrame = {
    val agg = ratingsFull
      .groupBy("filmId", "film", "genders")
      .agg(count(lit(1)).as("num_notas"))
      .orderBy(desc("num_notas"), asc("filmId"))
      .limit(limit)
    agg.withColumn("posicion",
      row_number().over(Window.orderBy(desc("num_notas"), asc("filmId"))))
  }

  /** Reference-faithful variant of [[topFilms]]: rank EVERYTHING with a
    * global-order `row_number`, then filter `posicion <= limit`
    * (`Explorativa2.ipynb:133-140` verbatim). Safe in Spark 4 because
    * Catalyst's LimitPushDownThroughWindow/InferWindowGroupLimit
    * rewrites the rank-filter into TakeOrderedAndProject — per-task
    * top-k heaps — so the single-partition window only ever sees
    * `limit` rows (verified via explain: `Window <- TakeOrderedAndProject`).
    */
  def topFilmsFullRank(ratingsFull: DataFrame, limit: Int = 100): DataFrame =
    ratingsFull
      .groupBy("filmId", "film", "genders")
      .agg(count(lit(1)).as("num_notas"))
      .withColumn("posicion",
        row_number().over(Window.orderBy(desc("num_notas"), asc("filmId"))))
      .filter(col("posicion") <= limit)

  /** Top-1 film per genre — explode + partitioned row_number, keep
    * rn == 1. Reference: `Explorativa2.ipynb:194-196` (cell 7); the
    * canonical scalable top-k-per-group (W2).
    */
  def topPerGenre(ratingsFull: DataFrame): DataFrame = {
    val counts = ratingsFull
      .groupBy("filmId", "film", "genders")
      .agg(count(lit(1)).as("num_notas"))
      .withColumn("genre", explode(col("genders")))
    val w = Window.partitionBy("genre")
      .orderBy(desc("num_notas"), asc("filmId"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("genre", "filmId", "film", "num_notas")
  }

  /** Genre winners from the top-`limit` films: explode the top films to
    * genres and keep the most-rated film per genre. Reference's
    * `per_genre` (`Explorativa2.ipynb:190-196`, cell 7) — topPerGenre's
    * sibling, restricted to the top-100 like the notebook. filmId is a
    * deterministic tiebreak the reference omits (its equal-count winner
    * is partition-order dependent).
    */
  def perGenreWinners(ratingsFull: DataFrame, limit: Int = 100): DataFrame = {
    val top = ratingsFull
      .groupBy("filmId", "film", "genders")
      .agg(count(lit(1)).as("num_notas"))
      .orderBy(desc("num_notas"), asc("filmId"))
      .limit(limit)
    val w = Window.partitionBy("genre")
      .orderBy(desc("num_notas"), asc("filmId"))
    top
      .withColumn("genre", explode(col("genders")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  /** A3 — re-aggregation of an aggregation: how many genres each winning
    * film wins, `groupBy(filmId, film, num_notas).agg(count(*) as cant)`
    * over [[perGenreWinners]]'s output, ordered by wins then popularity.
    * Reference: `Explorativa2.ipynb:242-245` (cell 9).
    */
  def genresWon(ratingsFull: DataFrame, limit: Int = 100): DataFrame =
    perGenreWinners(ratingsFull, limit)
      .groupBy("filmId", "film", "num_notas")
      .agg(count(lit(1)).as("cant"))
      .orderBy(desc("cant"), desc("num_notas"), asc("filmId"))

  /** Genre frequencies — explode + filter-not-null + count.
    * Reference: `Explorativa1_pyspark.ipynb:139-143` (cell 4, A1).
    */
  def genreCounts(movies: DataFrame): DataFrame =
    movies
      .select(explode(col("genders")).as("genre"))
      .where(col("genre").isNotNull)
      .groupBy("genre")
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc("genre"))
}
