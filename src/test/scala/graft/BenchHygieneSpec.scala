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
      "ds-mindelta", "ds-minarray", "ds-minarray-bare", "omitted")
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
    // the r14 rung: where ds-arrays overflows, the med survives as the
    // base-36 gap string before dropping entirely — find a size the
    // sweep routes through ds-mindelta and decode a known gap. With a
    // 10-entry heartbeat column (the realistic record shape).
    val hb = Seq.fill(10)(1.93)
    val atDelta = (1 to 300).map(_ * 10).flatMap { n =>
      val r = (1 to n).map(i => (f"q$i%03d_name", 4.21, 4.04, 16.0 * (i - 1)))
      val t = Bench.compactTrailer(r, Map.empty, n * 4.21, "", "sf0.1",
        ctrl, Seq.empty, hb)
      assert(t.length <= Bench.TrailerBudget, s"n=$n over budget with ctrl_hb")
      if (unitOf(t) == "ds-mindelta") Some((n, t)) else None
    }
    assert(atDelta.nonEmpty, "no registry size routed through ds-mindelta")
    val (_, tDelta) = atDelta.head
    // med 4.21 → 42 ds, min 4.04 → 40 ds, gap 2 ds → every char '2'
    val qmedd = "\"qmedd\":\"([0-9a-z]*)\"".r.findFirstMatchIn(tDelta)
      .getOrElse(fail("ds-mindelta lost qmedd")).group(1)
    assert(qmedd.nonEmpty && qmedd.forall(_ == '2'),
      s"gap chars wrong: ${qmedd.take(20)}")
    assert(tDelta.contains("\"qmin\":[40,") && tDelta.contains("\"qoffm\":\""),
      "ds-mindelta lost the min array or offsets")
    // gap saturation + failed-entry defense at the same rung: a ≥3.5 s
    // gap renders 'z', a failed query renders '0' with -1 in the min
    // array — splice both shapes into the head of the ds-mindelta run
    val (nDelta, _) = atDelta.head
    val spliced =
      Seq(("q000_a", 9.99, 0.5, 0.0), ("q000_b", -1.0, -1.0, 4.0)) ++
        (1 to nDelta).map(i => (f"q$i%03d_name", 4.21, 4.04, 16.0 * (i - 1)))
    val tSpiky = Bench.compactTrailer(spliced, Map("q000_b" -> "err"),
      nDelta * 4.21, "", "sf0.1", ctrl, Seq.empty, hb)
    assert(unitOf(tSpiky) == "ds-mindelta", s"splice moved rung: ${unitOf(tSpiky)}")
    assert(tSpiky.contains("\"qmedd\":\"z02"), // 95 ds gap → 'z'; fail → '0'
      s"saturation/defense chars wrong: ${tSpiky.take(200)}")
    assert(tSpiky.contains("\"qmin\":[5,-1,40,"),
      "min array lost the -1 failed marker")
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

  test("every trailer form carries ctrl_hb: mid-run heartbeat centiseconds (r14)") {
    def results(n: Int): Seq[(String, Double, Double, Double)] =
      (1 to n).map(i => (f"q$i%03d_name", 4.0, 3.6, 16.0 * (i - 1)))
    // absent heartbeats → the empty array is still present (a record
    // must distinguish "no heartbeats" from "pre-r14 record")
    Seq(5, 250, 3000).foreach { n =>
      val t = Bench.compactTrailer(results(n), Map.empty, n * 4.0, "", "sf0.1", ctrl)
      assert(t.contains("\"ctrl_hb\":[]"),
        s"n=$n trailer lost the empty heartbeat array: ${t.take(200)}")
    }
    // readings render as centiseconds, -1 = a heartbeat failed; the
    // realistic shape is ~10 entries of a ~2 s control
    val hb = Seq(1.93, 2.01, 16.42, -1.0, 1.88)
    val t = Bench.compactTrailer(results(250), Map.empty, 1000.0, "",
      "sf0.1", ctrl, Seq.empty, hb)
    assert(t.contains("\"ctrl_hb\":[193,201,1642,-1,188]"),
      s"heartbeat array misrendered: ${t.take(300)}")
    assert(t.length <= Bench.TrailerBudget)
  }

  test("committed band file: parses, covers the adjudicated set, names resolve (r14)") {
    val bands = Bench.loadBands()
    // the r13 verdict's minimum coverage list, task 1
    val adjudicated = Seq("q21_set_ops", "q28_minhash_lsh", "q68_semdedup",
      "q77_embedding_dedup_oracle", "q99_chunk_dup_by_source",
      "q124_copurchase_rank", "q134_quality_canonical",
      "q135_simhash_calibration", "q143_corpus_pipeline_v4",
      "q167_corpus_pipeline_v5", "q168_prefix_filter_join",
      "q209_index_snippet", "q212_multimodal_resize", "q214_graph_distances",
      "q215_hub_proximity", "q219_retrieval_ndcg", "q220_retrieval_mrr",
      "q283_bradley_terry")
    adjudicated.foreach { q =>
      assert(bands.contains(q), s"band file missing adjudicated query $q")
    }
    bands.foreach { case (name, (floor, ceil)) =>
      assert(SparkEntry.queries.contains(name),
        s"band file names unregistered query $name — a rename drifted")
      assert(floor > 0 && floor <= ceil, s"$name band [$floor,$ceil] malformed")
    }
  }

  test("rerun triggers: med/min spike OR band-ceiling departure, severity-ordered, capped (r14)") {
    val bands = Map(
      "q219_x" -> (0.59, 1.3), "q021_y" -> (0.29, 0.32), "q777_z" -> (1.0, 2.0))
    // the BENCH_r13 shape the spike trigger provably misses: med≈min,
    // both far above the band ceiling → band trigger fires
    val sustained = Seq(
      ("q219_x", 16.95, 16.86, 700.0),  // 6.5× its 2×ceiling — worst
      ("q021_y", 8.23, 7.71, 800.0),    // 12.0× its 2×ceiling — worse still
      ("q100_n", 0.50, 0.45, 10.0),     // no band, no spike → quiet
      ("q101_s", 9.00, 1.00, 20.0),     // med/min 9 = 3× the spike bar
      ("q777_z", 3.90, 3.90, 30.0))     // 0.975× its 2×ceiling → quiet
    val picked = Bench.rerunCandidates(sustained, bands)
    assert(picked == Seq("q021_y", "q219_x", "q101_s"),
      s"trigger selection/order wrong: $picked")
    // a failed query never re-runs; an in-band query never re-runs
    assert(Bench.rerunCandidates(
      Seq(("q219_x", -1.0, -1.0, 0.0), ("q777_z", 1.9, 1.8, 5.0)), bands).isEmpty)
    // the shared cap: 20 departures still emit MaxReruns entries
    val many = (1 to 20).map(i => (f"q$i%03d_m", 10.0 + i, 10.0 + i, i * 5.0))
    val capBands = many.map { case (n, _, _, _) => n -> (0.5, 1.0) }.toMap
    assert(Bench.rerunCandidates(many, capBands).size == Bench.MaxReruns)
    // no bands at all → pure spike behavior (the pre-r14 contract)
    assert(Bench.rerunCandidates(sustained, Map.empty) == Seq("q101_s"))
  }
}
