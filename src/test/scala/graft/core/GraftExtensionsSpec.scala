package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions installs cosine_sim for pure-SQL sessions") {
    // extensions apply at session CREATION: detach any shared-JVM
    // default session so the builder actually constructs a new one
    // (same SparkContext), and restore it afterwards
    val priorDefault = SparkSession.getDefaultSession
    val priorActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = spark
        .sql("select round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6)")
        .head().getDouble(0)
      assert(v == 1.0)
    } finally {
      priorDefault.foreach(SparkSession.setDefaultSession)
      priorActive.foreach(SparkSession.setActiveSession)
    }
  }
}
