package graft

import graft.queries.StatQueries

/** The chi-square core behind q194/q207: hand-computed tables and the
  * degenerate-dimension guard (the oracle only exercises the healthy
  * r×c path). */
class StatSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, String)]) =
    StatQueries.chiSquareReport(rows.toDF("a", "b"),
      "a", "b", "n", "na", "nb").head()

  test("perfectly dependent 2x2 table: chi2 = N, Cramér's V = 1") {
    // [[10,0],[0,10]]: e = 5 everywhere, each cell contributes
    // (±5)²/5 = 5 → chi2 = 20 = N; V = sqrt(20/(20·1)) = 1
    val r = report(
      Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("chi2_u6") === 20000000L)
    assert(r.getAs[Long]("cramers_v_ppm") === 1000000L)
  }

  test("perfectly independent table: chi2 = 0, V = 0") {
    // every (a, b) combination equally frequent → o == e exactly
    val r = report(for {
      a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 3
    } yield (a, b))
    assert(r.getAs[Long]("chi2_u6") === 0L)
    assert(r.getAs[Long]("cramers_v_ppm") === 0L)
  }

  test("one-category dimension: V is NULL, not NaN-cast garbage") {
    // nb = 1 → dof 0, V's denominator 0: the review-added guard must
    // report NULL on the engine side exactly as the oracle's CASE does
    val r = report(Seq(("x", "p"), ("y", "p"), ("x", "p")))
    assert(r.getAs[Long]("dof") === 0L)
    assert(r.getAs[Long]("chi2_u6") === 0L)
    assert(r.isNullAt(r.fieldIndex("cramers_v_ppm")))
  }

  private def mw(rows: Seq[(String, Long)]) =
    StatQueries.mannWhitneyReport(rows.toDF("source", "x"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("Mann-Whitney hand case: disjoint tie-free groups") {
    // A = {1,2,3}, B = {4,5,6}: R_A = 6 (doubled 12), U_A = 0,
    // mu = 4.5, sigma = sqrt(9/12*7) = 2.29129 -> z = -1.96396
    val r = mw(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L,
      "b" -> 4L, "b" -> 5L, "b" -> 6L))
    assert(r("a").getAs[Long]("r2sum") === 12L)
    assert(r("a").getAs[Long]("z_milli") === -1964L)
    // symmetry of one-vs-rest on two groups: z_B = -z_A
    assert(r("b").getAs[Long]("z_milli") === 1964L)
  }

  test("Mann-Whitney: ties take average ranks and shrink sigma") {
    // A = {1,2}, B = {2,3}: ranks 1, 2.5, 2.5, 4 (doubled 2,5,5,8)
    // R_A = 3.5 -> U_A = 3.5 - 3 = 0.5; mu = 2; tie3 = 2^3-2 = 6
    // sigma = sqrt(4/12*(5 - 6/12)) = sqrt(1.5) = 1.22474
    // z = -1.5/1.22474 = -1.22474 -> -1225
    val r = mw(Seq("a" -> 1L, "a" -> 2L, "b" -> 2L, "b" -> 3L))
    assert(r("a").getAs[Long]("r2sum") === 7L)
    assert(r("a").getAs[Long]("z_milli") === -1225L)
  }

  test("Kaplan-Meier hand case: events, late conversion, never-converter") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    // all four users sign up Monday 2024-01-01 00:00 UTC (cohort 1):
    // u1 converts day 0, u2 day 1, u3 day 5 (past the 3-day horizon ->
    // censored at 3), u4 never (censored at window end = u3's purchase)
    val base = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC, micros
    val day = 86400L * 1000000L
    val rows = Seq(
      (1L, "signup", base), (2L, "signup", base),
      (3L, "signup", base), (4L, "signup", base),
      (1L, "purchase", base + day / 2),
      (2L, "purchase", base + day + day / 5),
      (3L, "purchase", base + 5 * day))
    val ev = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"),
        (col("us") * 1000L).as("ts_ns"))
    val got = StatQueries.kaplanMeierReport(ev, horizonDays = 3)
      .collect()
      .map(r => (r.getAs[Long]("dur"),
        (r.getAs[Long]("d"), r.getAs[Long]("c"),
          r.getAs[Long]("n_at_risk"), r.getAs[Long]("s_ppm"))))
      .toMap
    // n0=4: day0 s=(4-1)/4; day1 s=750000*(3-1)/3; day3 censor-only
    assert(got(0L) === ((1L, 0L, 4L, 750000L)))
    assert(got(1L) === ((1L, 0L, 3L, 500000L)))
    assert(got(3L) === ((0L, 2L, 2L, 500000L)), "censor-only day moved s")
    assert(got.size === 3)
  }

  test("Nelson-Aalen hand case: same frame as KM, additive hazard") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val base = 1704067200L * 1000000L
    val day = 86400L * 1000000L
    val rows = Seq(
      (1L, "signup", base), (2L, "signup", base),
      (3L, "signup", base), (4L, "signup", base),
      (1L, "purchase", base + day / 2),
      (2L, "purchase", base + day + day / 5),
      (3L, "purchase", base + 5 * day))
    val ev = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"),
        (col("us") * 1000L).as("ts_ns"))
    val got = StatQueries.nelsonAalenReport(ev, horizonDays = 3)
      .collect()
      .map(r => (r.getAs[Long]("dur"),
        (r.getAs[Long]("d"), r.getAs[Long]("n_at_risk"),
          r.getAs[Long]("h_u6"))))
      .toMap
    // n0=4: day0 H=1/4; day1 H=250000+1/3=583333; day3 censor-only +0
    assert(got(0L) === ((1L, 4L, 250000L)))
    assert(got(1L) === ((1L, 3L, 583333L)))
    assert(got(3L) === ((0L, 2L, 583333L)), "censor-only day moved H")
    assert(got.size === 3)
    // the KM/NA duality on the same frame: -ln(S) ≥ H always (the
    // product bound ln(1/(1-x)) ≥ x per step), tight for small d/n
    val km = StatQueries.kaplanMeierReport(ev, horizonDays = 3)
      .collect().map(r => r.getAs[Long]("dur") -> r.getAs[Long]("s_ppm")).toMap
    for ((dur, (_, _, h)) <- got)
      assert(-math.log(km(dur) / 1e6) * 1e6 >= h - 1,
        s"day $dur: -ln(KM) < NA")
  }

  test("log-rank hand cases: identical curves z=0; total separation") {
    def report(rows: Seq[(Long, Long, Long)]) =
      StatQueries.logRankReport(rows.toDF("grp", "ev", "dur")).head()
    // mirrored groups: every day's O1 equals its expectation exactly
    val same = report(Seq(
      (0L, 1L, 0L), (0L, 1L, 1L), (0L, 0L, 2L),
      (1L, 1L, 0L), (1L, 1L, 1L), (1L, 0L, 2L)))
    assert(same.getAs[Long]("ome_u6") === 0L)
    assert(same.getAs[Long]("z_milli") === 0L)
    // grp1 converts day 0, grp0 never: O-E = 1, V = 2*(1/2)(1/2)(2/3)
    val sep = report(Seq(
      (1L, 1L, 0L), (1L, 1L, 0L), (0L, 0L, 2L), (0L, 0L, 2L)))
    assert(sep.getAs[Long]("n_events") === 2L)
    assert(sep.getAs[Long]("ome_u6") === 1000000L)
    assert(sep.getAs[Long]("var_u6") === 333333L)
    assert(sep.getAs[Long]("z_milli") === 1732L)
  }

  test("Gehan-Breslow hand cases: mirrored curves z=0; weights shrink late days") {
    import spark.implicits._
    def report(rows: Seq[(Long, Long, Long)], gehan: Boolean) =
      StatQueries.logRankReport(rows.toDF("grp", "ev", "dur"),
        gehan = gehan).head()
    // mirrored groups: every weighted O1 − E is exactly 0 too
    val same = report(Seq(
      (0L, 1L, 0L), (0L, 1L, 1L), (0L, 0L, 2L),
      (1L, 1L, 0L), (1L, 1L, 1L), (1L, 0L, 2L)), gehan = true)
    assert(same.getAs[Long]("ome_u6") === 0L)
    assert(same.getAs[Long]("z_milli") === 0L)
    // total-separation frame from the log-rank case: one event day at
    // dur 0 with the FULL risk set, so w = n/N = 1 there and the
    // weighted statistic equals the unweighted one exactly
    val sep = report(Seq(
      (1L, 1L, 0L), (1L, 1L, 0L), (0L, 0L, 2L), (0L, 0L, 2L)),
      gehan = true)
    assert(sep.getAs[Long]("ome_u6") === 1000000L)
    assert(sep.getAs[Long]("var_u6") === 333333L)
    // the weight's signature: two identical O−E = +1/2 days, one at
    // the full risk set (w = 6/6) and one after a third of it is gone
    // (w = 4/6) — unweighted both count 1/2, Gehan shrinks the late
    // one to 1/3
    val late = Seq(
      (1L, 1L, 0L), (0L, 0L, 0L),              // day 0: n=6,n1=3,d=1
      (1L, 1L, 2L), (0L, 0L, 2L),              // day 2: n=4,n1=2,d=1
      (1L, 0L, 3L), (0L, 0L, 3L))
    val lr = report(late, gehan = false)
    val gb = report(late, gehan = true)
    assert(lr.getAs[Long]("ome_u6") === 1000000L)
    assert(gb.getAs[Long]("ome_u6") === 833333L)
  }

  test("Welch hand case: unequal variances and Satterthwaite df") {
    // A = (1,2,3): m=2, v=1. B = (10,12,14,16): m=13, v=20/3.
    // se2 = 1/3 + 5/3 = 2 -> t = -11/sqrt(2) = -7.77817
    // df = 4 / ((1/3)^2/2 + (5/3)^2/3) = 4.07547
    val r = StatQueries.welchReport(
      Seq("a" -> 1L, "a" -> 2L, "a" -> 3L,
        "b" -> 10L, "b" -> 12L, "b" -> 14L, "b" -> 16L)
        .toDF("source", "x"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("n1") === 3L && r("a").getAs[Long]("n2") === 4L)
    assert(r("a").getAs[Long]("t_milli") === -7778L)
    assert(r("a").getAs[Long]("df_milli") === 4075L)
    // the complementary test flips the sign
    assert(r("b").getAs[Long]("t_milli") === 7778L)
  }

  test("OLS hand cases: perfect line and a known partial fit") {
    import spark.implicits._
    // y = 2x + 1 exactly: slope 2, fit at x0=0 is 1, R² = 1
    val perfect = StatQueries.olsReport(
      Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L))
        .toDF("event_type", "x", "y")).collect().head
    assert(perfect.getAs[Long]("slope_ppm") === 2000000L)
    assert(perfect.getAs[Long]("fit0_ppm") === 1000000L)
    assert(perfect.getAs[Long]("r2_ppm") === 1000000L)
    // (0,0),(1,2),(2,1): slope 1/2, fit0 1/2, R² = 9/36 = 1/4
    val partial = StatQueries.olsReport(
      Seq(("b", 0L, 0L), ("b", 1L, 2L), ("b", 2L, 1L))
        .toDF("event_type", "x", "y")).collect().head
    assert(partial.getAs[Long]("slope_ppm") === 500000L)
    assert(partial.getAs[Long]("fit0_ppm") === 500000L)
    assert(partial.getAs[Long]("r2_ppm") === 250000L)
    // translation invariance of slope/R²: shifting x by 20000 (epoch
    // days) must not move them; fit0 still reads the value at min x
    val shifted = StatQueries.olsReport(
      Seq(("c", 20000L, 0L), ("c", 20001L, 2L), ("c", 20002L, 1L))
        .toDF("event_type", "x", "y")).collect().head
    assert(shifted.getAs[Long]("slope_ppm") === 500000L)
    assert(shifted.getAs[Long]("fit0_ppm") === 500000L)
    assert(shifted.getAs[Long]("r2_ppm") === 250000L)
  }

  test("q282: the Hill ladder orders D0 >= D1 >= D2 on real data") {
    val r = graft.queries.DistributionQueries.hillDiversity
      .fn(spark, sf).collect().head
    val (d0, d1, d2) = (r.getAs[Long]("d0") * 1000L,
      r.getAs[Long]("d1_milli"), r.getAs[Long]("d2_milli"))
    // the Hill inequality chain (Jensen), with 1-milli rounding slack
    assert(d0 + 1 >= d1 && d1 + 1 >= d2, s"Hill order broke: $d0 $d1 $d2")
    assert(d2 >= 1000L, "effective source count below 1 — impossible")
  }

  test("q283: Bradley-Terry strengths normalize and respect dominance") {
    val rows = graft.queries.StatQueries.bradleyTerry.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("wins"),
        r.getAs[Long]("strength_ppm")))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    // normalized to 1e6 each iteration; floors lose < n_players ppm,
    // the greatest(...,1) floor can add back at most n_players
    assert(math.abs(total - 1000000L) <= rows.length.toLong,
      s"strengths sum $total departs 1e6")
    // the most-winning player must not rank at the very bottom
    val byWins = rows.maxBy(_._2)
    val minStrength = rows.map(_._3).min
    assert(byWins._3 > minStrength || rows.map(_._3).distinct.length == 1,
      s"top winner ${byWins._1} carries the minimum strength")
  }

  test("q261: stationary vector conserves mass and is a near-fixed point") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.SequenceQueries.markovStationary
      .fn(spark, sf).collect()
    val v = rows.map(r => r.getString(0) -> r.getAs[Long]("stationary_ppm")).toMap
    assert(v.nonEmpty && v.values.forall(_ >= 0L))
    // each of the 12 floor-divided iterations loses < |types| ppm of mass
    val mass = v.values.sum
    assert(mass <= 1000000L && mass >= 1000000L - 13L * v.size,
      s"mass $mass departed the floor-loss envelope")
    // applying P once more must move the converged vector only epsilon:
    // rebuild P exactly as the query does and take one more step
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
    val p = cells.join(cells.groupBy("src").agg(sum("n").as("tot")), Seq("src"))
      .select(col("src"), col("dst"), expr("1000000L * n div tot").as("p_ppm"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_ppm"))
      .toMap
    val next = v.keys.map { j =>
      j -> v.toSeq.map { case (i, vi) => vi * p.getOrElse((i, j), 0L) }.sum / 1000000L
    }.toMap
    for ((t, x) <- next)
      assert(math.abs(x - v(t)) <= 10000L,
        s"$t moved ${math.abs(x - v(t))} ppm on iteration 13 — not converged")
  }
}
