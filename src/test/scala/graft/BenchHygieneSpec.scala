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

  private val ctrl = Some((1.93, 1.88, 2.01, 1.90))

  test("compact trailer degrades maps → value arrays → min array → map-free, never over budget") {
    // offsets: query i starts at 4·sec·(i−1) seconds (warmup + 3
    // repeats back to back) — the realistic timeline shape
    def results(n: Int, sec: Double): Seq[(String, Double, Double, Double)] =
      (1 to n).map(i => (f"q$i%03d_name", sec, sec * 0.9, 4 * sec * (i - 1)))
    def unitOf(t: String): String =
      "\"unit\":\"([a-z-]+)\"".r.findFirstMatchIn(t).get.group(1)
    val ranks = Seq("centisec", "decisec", "sec", "ds-arrays",
      "ds-minarray", "ds-minarray-bare", "omitted")
    // small registry: full centisecond precision preserved, med + min maps
    val small = Bench.compactTrailer(results(50, 1.234), Map.empty, 61.7, "", "sf0.1", ctrl)
    assert(unitOf(small) == "centisec" && small.contains("\"001\":123"))
    assert(small.contains("\"qmins\":") && small.contains("\"001\":111"),
      "min map missing from the map form: " + small.take(300))
    assert(small.length <= Bench.TrailerBudget)
    // sweep the registry size: EVERY emitted line fits the budget, the
    // chosen unit only ever coarsens as the registry grows, and the
    // ladder actually visits the rungs the current registry needs.
    // The ARRAY rungs are the r10 fix: at 249 queries the decisec MAP
    // overflowed and the archived record lost all per-query data —
    // the value-array form keeps med+min per query to ~400 queries.
    val sweep = (1 to 300).map(_ * 10).map { n =>
      val t = Bench.compactTrailer(results(n, 4.04), Map.empty, n * 4.04, "", "sf0.1", ctrl)
      assert(t.length <= Bench.TrailerBudget,
        s"n=$n: ${t.length} chars exceeds the tail budget")
      ranks.indexOf(unitOf(t))
    }
    assert(sweep == sweep.sorted, "unit must coarsen monotonically with registry size")
    assert(sweep.contains(ranks.indexOf("decisec")), "sweep never hit decisec")
    assert(sweep.contains(ranks.indexOf("ds-arrays")), "sweep never hit the array form")
    assert(sweep.last >= ranks.indexOf("ds-minarray"),
      "the largest registries must at least drop to the min array")
    // the CURRENT registry size and value shape (287 queries, r11's
    // 0.78 s/query median) must keep med+min+offsets — the real-record
    // guarantee, measured against realistic digit widths, not the
    // sweep's uniform-4s worst case
    val current = Bench.compactTrailer(results(290, 0.85), Map.empty, 247.0, "", "sf0.1", ctrl)
    assert(ranks.indexOf(unitOf(current)) <= ranks.indexOf("ds-arrays"),
      s"290 queries lost per-query data: ${unitOf(current)}")
    assert(current.contains("\"qmin\":[") || current.contains("\"qmins\":"),
      "290-query trailer lost the adjudication floor")
    assert(current.contains("\"qoffm\":\""),
      "290-query trailer lost the start offsets")
    // a heavier box (every value 3 ds digits) may drop the median but
    // NEVER the min or the offsets at this registry size
    val heavy = Bench.compactTrailer(results(290, 4.04), Map.empty, 1172.0, "", "sf0.1", ctrl)
    assert(heavy.contains("\"qmin\":[") && heavy.contains("\"qoffm\":\""),
      s"heavy-valued 290-query trailer lost min or offsets: ${unitOf(heavy)}")
    // map-free floor: totals + failed query NUMBERS survive, map is {}
    val huge = Bench.compactTrailer(results(3000, 111.2),
      Map("q0007_x" -> "boom"), 333600.0, "", "sf0.1", ctrl)
    assert(huge.contains("\"unit\":\"omitted\"") && huge.contains("\"queries\":{}"))
    assert(huge.contains("\"errors\":[\"0007\"]"))
    assert(huge.length <= Bench.TrailerBudget)
    // failed queries mark -1 in the per-query map forms
    val withFail = Bench.compactTrailer(
      results(5, 0.5) :+ (("q006_bad", -1.0, -1.0, 10.0)), Map("q006_bad" -> "err"),
      2.5, "", "sf0.1", ctrl)
    assert(withFail.contains("\"006\":-1") && withFail.contains("\"errors\":[\"006\"]"))
  }

  test("every trailer form carries qoffm: one base-36 minute char per query, registry order") {
    def results(n: Int, sec: Double): Seq[(String, Double, Double, Double)] =
      (1 to n).map(i => (f"q$i%03d_name", sec, sec * 0.9, 4 * sec * (i - 1)))
    def qoffmOf(t: String): String =
      "\"qoffm\":\"([0-9a-z]*)\"".r.findFirstMatchIn(t)
        .getOrElse(fail(s"trailer lost qoffm: ${t.take(200)}")).group(1)
    // every per-query ladder rung, small through large: exactly one
    // char per query, never over budget
    Seq((5, 1.0), (250, 4.04), (300, 4.04)).foreach {
      case (n, sec) =>
        val t = Bench.compactTrailer(results(n, sec), Map.empty, n * sec,
          "", "sf0.1", ctrl)
        assert(qoffmOf(t).length == n, s"n=$n: qoffm length ${qoffmOf(t).length}")
        assert(t.length <= Bench.TrailerBudget, s"n=$n over budget with qoffm")
    }
    // the map-free floor drops qoffm with the rest of the per-query
    // data (n offset chars overflow whenever the min array does)
    val huge = Bench.compactTrailer(results(3000, 111.2), Map.empty,
      333600.0, "", "sf0.1", ctrl)
    assert(huge.contains("\"unit\":\"omitted\"") && !huge.contains("qoffm"))
    assert(huge.length <= Bench.TrailerBudget)
    // the encoding itself: minutes floor, base-36, 'z' cap, '0' defense
    assert(Bench.offsetChar(0.0) == '0' && Bench.offsetChar(59.9) == '0')
    assert(Bench.offsetChar(60.0) == '1' && Bench.offsetChar(605.0) == 'a')
    assert(Bench.offsetChar(35 * 60.0) == 'z' && Bench.offsetChar(1e9) == 'z')
    assert(Bench.offsetChar(-3.0) == '0' && Bench.offsetChar(Double.NaN) == '0')
    // a 287-query run at the r11 timeline (~0.85 s/query median → ~16
    // min wall) clusters by minute exactly as the adjudication needs:
    // queries sharing a minute share a char
    val t287 = Bench.compactTrailer(results(287, 0.85), Map.empty, 244.0,
      "", "sf0.1", ctrl)
    val q287 = qoffmOf(t287)
    assert(q287.length == 287 && q287.head == '0' && q287.last > '9',
      s"287-query timeline didn't span minutes: head=${q287.head} last=${q287.last}")
    // and the current-registry form still keeps med+min value arrays
    assert(t287.contains("\"qmed\":[") && t287.contains("\"qmin\":["),
      "qoffm displaced the med/min arrays at the current registry size")
  }

  test("every trailer form carries qre: post-control re-readings, deciseconds, capped") {
    def results(n: Int): Seq[(String, Double, Double, Double)] =
      (1 to n).map(i => (f"q$i%03d_name", 4.0, 3.6, 16.0 * (i - 1)))
    // no spiky queries → the empty map is still present (the record
    // must distinguish "nothing spiked" from "pre-r13 record")
    Seq(5, 250, 3000).foreach { n =>
      val t = Bench.compactTrailer(results(n), Map.empty, n * 4.0, "", "sf0.1", ctrl)
      assert(t.contains("\"qre\":{}"),
        s"n=$n trailer lost the empty rerun map: ${t.take(200)}")
    }
    // re-readings render as {query number → deciseconds}, -1 = failed
    val re = Seq("q099_chunk" -> 2.13, "q167_pipeline" -> 1.48,
      "q042_chart" -> -1.0)
    val t = Bench.compactTrailer(results(250), Map.empty, 1000.0, "",
      "sf0.1", ctrl, re)
    assert(t.contains("\"qre\":{\"099\":21,\"167\":15,\"042\":-1}"),
      s"rerun map misrendered: $t")
    assert(t.length <= Bench.TrailerBudget)
    // the cap: a pathological run cannot blow the tail budget
    val many = (1 to 40).map(i => (f"q$i%03d_name", 9.9))
    val capped = Bench.compactTrailer(results(250), Map.empty, 1000.0, "",
      "sf0.1", ctrl, many)
    assert("\"\\d+\":99".r.findAllIn(capped).size == Bench.MaxReruns,
      s"rerun map not capped at ${Bench.MaxReruns}: $capped")
    assert(capped.length <= Bench.TrailerBudget)
  }

  test("every trailer form carries the q27 control bracket in centiseconds") {
    def results(n: Int): Seq[(String, Double, Double, Double)] =
      (1 to n).map(i => (f"q$i%03d_name", 4.0, 3.6, 16.0 * (i - 1)))
    // present at every ladder rung, small and huge registries alike
    Seq(5, 250, 3000).foreach { n =>
      val t = Bench.compactTrailer(results(n), Map.empty, n * 4.0, "", "sf0.1", ctrl)
      assert(t.contains("\"ctrl_cs\":[193,188,201,190]"),
        s"n=$n trailer lost the control bracket: ${t.take(200)}")
    }
    // a run without the control query still emits a parseable marker
    val noCtrl = Bench.compactTrailer(results(5), Map.empty, 20.0, "", "sf0.1", None)
    assert(noCtrl.contains("\"ctrl_cs\":[-1,-1,-1,-1]"))
  }
}
