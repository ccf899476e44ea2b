package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject cosine_sim into a fresh session's SQL namespace") {
    // touch the shared context first so we piggyback on the same JVM context
    val base = graft.SparkSpec.session
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    // getOrCreate returns the default session (ignoring extensions) unless
    // both active and default are cleared
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = extended
        .sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect().head.getDouble(0)
      assert(r === 1.0)
      val r2 = extended
        .sql("SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
        .collect().head.getDouble(0)
      assert(r2 === 0.0)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
    // base session must NOT see the function unless registered explicitly
    val err = intercept[Exception] {
      base.sql("SELECT cosine_sim_not_registered(array(1.0d), array(1.0d))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("unresolved") ||
      err.getMessage.toLowerCase.contains("cannot be resolved") ||
      err.getMessage.toLowerCase.contains("routine"))
  }
}
