package graft

import org.apache.spark.sql.functions._

/** The bench harness's two self-measurement contracts: (1) every block
  * a query pins is released before the next query is timed (the r9
  * driver record's q91 15.29s-in-process / 0.98s-isolated spread was
  * accumulated localCheckpoint blocks evicting onto the late tail);
  * (2) the compact trailer degrades through its unit ladder instead of
  * printing an over-budget line the driver's 2000-char tail truncates.
  */
class BenchHygieneSpec extends SparkSpec {

  test("releaseCaches drops localCheckpoint blocks and cached tables between queries") {
    // simulate a query that pins frames the way resolve/PageRank do
    val pinned = spark.range(1000).toDF("id").localCheckpoint(true)
    assert(pinned.count() == 1000)
    val cached = spark.range(100).toDF("id").cache()
    assert(cached.count() == 100)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "localCheckpoint/cache should have pinned blocks")
    GraftSession.releaseCaches(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseCaches must leave ZERO persistent RDDs — residue lands " +
        "on whichever bench queries run late")
    // a released localCheckpoint frame is spent by design (its lineage
    // was truncated to the checkpoint) — bench queries never reuse
    // frames across queries, so only NEW plans must still work:
    assert(spark.range(10).count() == 10)
  }

  test("compact trailer degrades centisec → decisec → sec → map-free, never over budget") {
    def results(n: Int, sec: Double): Seq[(String, Double)] =
      (1 to n).map(i => (f"q$i%03d_name" -> sec))
    def unitOf(t: String): String =
      "\"unit\":\"([a-z]+)\"".r.findFirstMatchIn(t).get.group(1)
    val ranks = Seq("centisec", "decisec", "sec", "omitted")
    // small registry: full centisecond precision preserved
    val small = Bench.compactTrailer(results(50, 1.234), Map.empty, 61.7, "", "sf0.1")
    assert(unitOf(small) == "centisec" && small.contains("\"001\":123"))
    assert(small.length <= Bench.TrailerBudget)
    // sweep the registry size: EVERY emitted line fits the budget, the
    // chosen unit only ever coarsens as the registry grows, and the
    // ladder actually visits its middle rungs and the map-free floor
    // (the r9 ADVICE finding: the old code printed an over-budget
    // decisec line once the registry outgrew two rungs)
    val sweep = (1 to 300).map(_ * 10).map { n =>
      val t = Bench.compactTrailer(results(n, 4.04), Map.empty, n * 4.04, "", "sf0.1")
      assert(t.length <= Bench.TrailerBudget,
        s"n=$n: ${t.length} chars exceeds the tail budget")
      ranks.indexOf(unitOf(t))
    }
    assert(sweep == sweep.sorted, "unit must coarsen monotonically with registry size")
    assert(sweep.contains(ranks.indexOf("decisec")), "sweep never hit decisec")
    assert(sweep.contains(ranks.indexOf("sec")), "sweep never hit whole seconds")
    assert(sweep.last == ranks.indexOf("omitted"), "the largest registries must drop the map")
    // map-free floor: totals + failed query NUMBERS survive, map is {}
    val huge = Bench.compactTrailer(results(3000, 111.2),
      Map("q0007_x" -> "boom"), 333600.0, "", "sf0.1")
    assert(huge.contains("\"unit\":\"omitted\"") && huge.contains("\"queries\":{}"))
    assert(huge.contains("\"errors\":[\"0007\"]"))
    assert(huge.length <= Bench.TrailerBudget)
    // failed queries mark -1 in the per-query map forms
    val withFail = Bench.compactTrailer(
      results(5, 0.5) :+ ("q006_bad" -> -1.0), Map("q006_bad" -> "err"),
      2.5, "", "sf0.1")
    assert(withFail.contains("\"006\":-1") && withFail.contains("\"errors\":[\"006\"]"))
  }
}
