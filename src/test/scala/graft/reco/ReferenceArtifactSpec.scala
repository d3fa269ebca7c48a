package graft.reco

import graft.SparkSuite
import org.apache.spark.ml.recommendation.ALSModel

/** S16/M6 against the ARTIFACT OF RECORD: load the reference's real
  * trained ALS model (`/root/reference/Modelo/Modelo_als/als1`, the
  * exact `app4/recommender.py:26` path), build the driver-side fold-in
  * model from it, and pin a top-5 recommendation for a fixed
  * seed-ratings request (`app4/recommender.py:39-53` semantics).
  *
  * The pinned ids/scores were computed INDEPENDENTLY (numpy over the
  * raw itemFactors parquet, ridge solve + argsort — the reference's
  * own algorithm with the id-aligned-ratings correction documented in
  * [[FoldInRecommender]]), so this is a cross-implementation
  * differential, not a self-check.
  */
class ReferenceArtifactSpec extends SparkSuite {

  private val ModelPath = "/root/reference/Modelo/Modelo_als/als1"
  private val MoviesPath =
    "/root/reference/datasets/Transformados/movies_mod.parquet"

  private lazy val artifactAvailable =
    new java.io.File(s"$ModelPath/metadata").isDirectory

  // ALSModel.load resolves the ACTIVE session (ReadWrite.scala) —
  // touch the suite's lazy session first or load() tries to build its
  // own masterless one
  private def loadModel(): ALSModel = {
    spark.sparkContext // force suite session init
    ALSModel.load(ModelPath)
  }

  test("ALSModel.load reads the reference artifact (rank 20, 3682 items)") {
    assume(artifactAvailable, "reference artifact not mounted")
    val m = loadModel()
    assert(m.rank == 20)
    assert(m.itemFactors.count() == 3682L)
    assert(m.userFactors.count() == 6040L)
    // the reference trained with custom user/item columns
    assert(m.getOrDefault(m.userCol) == "userId")
    assert(m.getOrDefault(m.itemCol) == "filmId")
  }

  test("fold-in over the real factors pins the reference top-5") {
    assume(artifactAvailable, "reference artifact not mounted")
    val m = loadModel()
    val movies = spark.read.parquet(MoviesPath)
      .selectExpr("filmId", "film")
    val model = FoldInRecommender.fromModel(m, movies)
    assert(model.rank == 20)
    val seed = Seq(1 -> 5.0, 1193 -> 4.0, 3408 -> 1.0)
    val recs = model.recommend(seed, topN = 5, reg = 0.1)
    assert(recs.map(_.filmId) == Seq(1743, 2494, 1196, 260, 759),
      s"got ${recs.map(_.filmId)}")
    val wantScores =
      Seq(5.531615786361069, 5.336560352291763, 5.274754554885125,
        5.209346209809917, 5.204249040054182)
    recs.map(_.score).zip(wantScores).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9, s"score $got vs $want")
    }
    // titles resolve from the reference catalog
    assert(recs.forall(_.title.nonEmpty))
    // rated seeds are masked out of the ranking
    assert(recs.map(_.filmId).toSet.intersect(seed.map(_._1).toSet).isEmpty)
  }
}
