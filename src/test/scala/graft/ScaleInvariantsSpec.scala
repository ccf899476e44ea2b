package graft

/** The engine-side invariant oracles must hold at every scale; this pins
  * them at sf0.001 so a regression shows up in the suite, not first at the
  * 100× probe.
  */
class ScaleInvariantsSpec extends SparkSpec {

  private def assertAll(rs: Seq[ScaleInvariants.Result]): Unit = {
    assert(rs.nonEmpty)
    rs.foreach(r => assert(r.pass, s"${r.check}: ${r.detail}"))
  }

  test("survivor clustering certificate holds") {
    assertAll(ScaleInvariants.survivorInvariants(spark, sf0001))
  }

  test("pagerank contraction + mass conservation hold") {
    assertAll(ScaleInvariants.pagerankInvariants(spark, sf0001))
  }

  test("fuzzy join planted recall + independent recheck hold") {
    assertAll(ScaleInvariants.fuzzyInvariants(spark, sf0001))
  }
}
