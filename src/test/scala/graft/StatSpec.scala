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
}
