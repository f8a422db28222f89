package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, RangeJoin, Scd}
import graft.queries.Registry
import graft.sources.Tables

/** Semantics and scale-shape checks for the wave-3 warehouse layer
  * (q168-q172): prefix-filter join equivalence + candidate reduction,
  * SCD2 interval invariants, binned range join vs brute force, RRF
  * fusion arithmetic.
  */
class WarehouseOpsSpec extends SparkSpec {

  test("prefix-filter join returns EXACTLY jaccardPairs' answers; candidates shrink") {
    val sh = Dedup.shingleProjection(
      Tables.load(spark, sf, "documents"), "text", "doc_id")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))
    val base = Dedup.jaccardPairs(sh, threshold = 0.5, maxDf = 1000)
      .collect().map(key).toSet
    val pref = Dedup.prefixFilterJaccardPairs(sh, threshold = 0.5, maxDf = 1000)
      .collect().map(key).toSet
    assert(base.nonEmpty, "corpus must contain near-dup pairs")
    assert(pref === base)
    // candidate reduction: distinct colliding pairs from full sets vs
    // the OPERATOR'S OWN prefix generator (no rebuilt copy to drift)
    val full = sh.select(col("doc_id"), explode(col("shs")).as("h"))
    val fullCands = full.as("a")
      .join(full.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val prefCands = Dedup.prefixCandidatePairs(sh, threshold = 0.5).count()
    assert(prefCands < fullCands,
      s"prefix candidates ($prefCands) must undercut full-set candidates ($fullCands)")
    info(s"candidate pairs: full-set $fullCands -> prefix $prefCands " +
      f"(${fullCands.toDouble / prefCands}%.1fx fewer)")
  }

  test("prefix-filter equivalence holds across thresholds (property, random multisets)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // random small corpora of hash-sets; brute-force all-pairs Jaccard
    // vs the operator at t in {0.3, 0.5, 0.8}
    val corpusGen = Gen.listOfN(14,
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 60L)).map(_.distinct.sorted))
    val prop = Prop.forAll(corpusGen) { sets =>
      val docs = sets.zipWithIndex.map { case (s, i) => (i.toLong, s.toArray) }
      val df = docs.toDF("doc_id", "shs")
      Seq(0.3, 0.5, 0.8).forall { t =>
        val expect = (for {
          (ia, a) <- docs; (ib, b) <- docs if ia < ib
          inter = a.toSet.intersect(b.toSet).size
          uni = a.toSet.union(b.toSet).size
          if uni > 0 && inter.toDouble / uni >= t
        } yield (ia, ib, inter.toLong, uni.toLong)).toSet
        val got = Dedup.prefixFilterJaccardPairs(df, threshold = t)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        got == expect
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)

    // IEEE-boundary regression (code-review finding): A=[1..10],
    // B=[3..10] at t=0.8 has exact Jaccard 8/10 == 0.8 — accepted by
    // the double >= filter, but floor(10 * (1.0-0.8)) = floor(1.999…96)
    // made the original prefix one short and the pair was silently
    // lost; the integer-ceiling + slack bound must find it
    val boundary = Seq(
      (0L, (1L to 10L).toArray),
      (1L, (3L to 10L).toArray)).toDF("doc_id", "shs")
    val got = Dedup.prefixFilterJaccardPairs(boundary, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 1L, 8L)), s"boundary pair lost: ${got.toSeq}")
  }

  test("SCD2 history: runs collapse, intervals tile, one current row per key") {
    import spark.implicits._
    val ev = Seq(
      // key 1: a->a->b->a (no-op second event collapses)
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "b", 30L, 102L),
      (1L, "a", 40L, 103L),
      // key 2: single state, many events
      (2L, "x", 5L, 200L), (2L, "x", 6L, 201L),
      // key 3: same-timestamp tie broken by event id
      (3L, "p", 7L, 301L), (3L, "q", 7L, 300L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val h = Scd.buildHistory(ev, "user_id", "event_type", "ts_us", "event_id")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("version"), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current")))
    val k1 = h.filter(_._1 == 1L).sortBy(_._3)
    assert(k1.map(x => (x._2, x._4, x._5)).toSeq ===
      Seq(("a", 10L, Some(30L)), ("b", 30L, Some(40L)), ("a", 40L, None)))
    assert(k1.map(_._3).toSeq === Seq(1L, 2L, 3L))
    val k2 = h.filter(_._1 == 2L)
    assert(k2.length === 1 && k2.head._2 === "x" && k2.head._6)
    // tie: event 300 ("q") precedes 301 ("p") at the same timestamp
    val k3 = h.filter(_._1 == 3L).sortBy(_._3)
    assert(k3.map(_._2).toSeq === Seq("q", "p"))
    // global invariants: exactly one current row per key; intervals
    // tile (valid_to == next valid_from)
    h.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.count(_._6) === 1)
      val s = rows.sortBy(_._3)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4))
        case _ =>
      }
    }
  }

  test("binned range join equals brute-force BETWEEN join (property, incl. negatives)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val ptsGen = Gen.listOfN(25, Gen.chooseNum(-50L, 50L))
    val ivGen = Gen.listOfN(8, for {
      lo <- Gen.chooseNum(-50L, 45L); len <- Gen.chooseNum(1L, 30L)
    } yield (lo, lo + len))
    val prop = Prop.forAll(ptsGen, ivGen, Gen.chooseNum(1L, 17L)) {
      (pts, ivs, w) =>
        val points = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("pt_id", "pt")
        val intervals = ivs.zipWithIndex.map { case ((lo, hi), i) =>
          (i.toLong, lo, hi) }.toDF("iv_id", "lo", "hi")
        val got = RangeJoin.binnedPointJoin(points, "pt", intervals,
            "lo", "hi", binWidth = w)
          .select("pt_id", "iv_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val expect = for {
          (pid, p) <- pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          ((lo, hi), iid) <- ivs.zipWithIndex
          if p >= lo && p < hi
        } yield (pid, iid.toLong)
        got.sorted.toSeq == expect.sorted && got.length == got.distinct.length
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)

    // epoch-nanos regime: beyond double's 2^53 integer range, where a
    // double-division bin id would round and drop border matches
    val base = 1L << 60
    val bigPts = (0L until 8L).map(i => (i, base + i * 1000L)).toDF("pt_id", "pt")
    val bigIvs = Seq((0L, base + 1000L, base + 3001L)).toDF("iv_id", "lo", "hi")
    val bigGot = RangeJoin.binnedPointJoin(bigPts, "pt", bigIvs, "lo", "hi",
        binWidth = 1000L)
      .select("pt_id").collect().map(_.getLong(0)).sorted
    assert(bigGot.toSeq === Seq(1L, 2L, 3L), s"got ${bigGot.toSeq}")
  }

  test("RRF fusion: scores recompute from the rank columns; both-list docs sum") {
    val rows = Registry.byName("q171_rrf_hybrid").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    def contrib(rn: Long) = if (rn == 0L) 0L else 1000000000L / (60L + rn)
    rows.foreach { r =>
      val (rrf, lex, sem) = (r.getAs[Long]("rrf"),
        r.getAs[Long]("lex_rn"), r.getAs[Long]("sem_rn"))
      assert(rrf === contrib(lex) + contrib(sem))
      assert(lex >= 0L && lex <= 10L && sem >= 0L && sem <= 10L)
      assert(lex > 0L || sem > 0L)
    }
    // per query: at most 10 fused rows, no doc repeated, and a doc
    // ranked 1 in BOTH lists must be present (it dominates the fusion)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.length <= 10)
      val ids = g.map(_.getAs[Long]("doc_id"))
      assert(ids.distinct.length === ids.length)
    }
  }

  test("mmrSelect equals the brute-force greedy (property, negative sims included)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    import graft.operators.Similarity
    // one query, n candidates with random rel and random SYMMETRIC
    // sims in [-1, 1]; reference = direct greedy with true running max
    val caseGen = for {
      n <- Gen.chooseNum(2, 8)
      rels <- Gen.listOfN(n, Gen.chooseNum(-100, 100))
      simsU <- Gen.listOfN(n * n, Gen.chooseNum(-100, 100))
    } yield (n, rels.map(_ / 100.0), simsU.map(_ / 100.0))
    val prop = Prop.forAll(caseGen) { case (n, rels, simsU) =>
      val ids = (0 until n).map(_.toLong)
      val sim = Map.newBuilder[(Long, Long), Double]
      for (i <- 0 until n; j <- 0 until n if i != j)
        sim += ((i.toLong, j.toLong) ->
          (if (i < j) simsU(i * n + j) else simsU(j * n + i)))
      val simMap = sim.result()
      val k = math.min(4, n)
      // brute force
      var selected = Vector.empty[Long]
      var rem = ids.toSet
      val ref = (1 to k).map { r =>
        val best = rem.toSeq.map { d =>
          val m = if (selected.isEmpty) 0.0
            else selected.map(s => simMap((d, s))).max
          (0.5 * rels(d.toInt) - 0.5 * m, d)
        }.minBy { case (s, d) => (-s, d) }._2
        selected :+= best; rem -= best
        (best, r.toLong)
      }.toSet
      val cands = ids.map(i => (7L, i, rels(i.toInt))).toDF("query_id", "doc_id", "rel")
      val simsDf = simMap.toSeq.map { case ((a, b), s) => (7L, a, b, s) }
        .toDF("query_id", "a", "b", "sim")
      val got = Similarity.mmrSelect(cands, simsDf, k)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      got == ref
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("HLL rollup: union-of-daily equals direct sketch; <=5% error vs exact twin") {
    val ev = Tables.load(spark, sf, "events").select(col("event_type"),
      to_date(timestamp_millis(expr("ts_ns div 1000000"))).as("d"),
      col("user_id"))
    // union of per-day sketches vs one direct sketch over the period:
    // register-max union makes these EQUAL, not just close — the
    // property that lets a cube pre-aggregate at fine grain only
    val viaUnion = ev.groupBy("event_type", "d")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaUnion === direct, "sketch union must reproduce the direct sketch")
    val exact = Registry.byName("q176_distinct_rollup").fn(spark, sf)
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("total_users"))
      .toMap
    assert(exact.keySet === viaUnion.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(viaUnion(k).toDouble - ex) / ex
      assert(err <= 0.05, s"$k: estimate ${viaUnion(k)} vs exact $ex (err $err)")
    }
  }

  test("phrase search equals brute-force sliding-window counts (incl. repeated-word phrase)") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val phrases = Seq("table scan", "sort merge", "spark join",
      "batch batch batch").map(p => p -> p.split(" ").toSeq)
    val expect = phrases.map { case (lab, ws) =>
      val hits = docs.map { case (_, toks) =>
        toks.sliding(ws.size).count(_ == ws)
      }
      lab -> ((hits.count(_ > 0).toLong, hits.sum.toLong))
    }.filter(_._2._1 > 0).toMap
    val got = Registry.byName("q178_phrase_search").fn(spark, sf)
      .collect()
      .map(r => r.getAs[String]("phrase") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"))))
      .toMap
    assert(got === expect)
    assert(expect.nonEmpty, "corpus should contain at least one phrase hit")
  }

  test("quantile normalization: ppm in range, monotone in score, zero at the minimum") {
    val rows = Registry.byName("q172_quantile_norm").fn(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("pct_ppm")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.forall(x => x._3 >= 0L && x._3 < 1000000L))
      // minimum-length docs sit at percentile 0
      val minTok = g.map(_._2).min
      assert(g.filter(_._2 == minTok).forall(_._3 == 0L))
      // same length -> same ppm; longer -> strictly larger cnt_lt basis
      val byTok = g.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
      assert(byTok.values.forall(_.length == 1))
      val sorted = byTok.toSeq.sortBy(_._1).map(_._2.head)
      assert(sorted === sorted.sorted)
    }
  }
}
