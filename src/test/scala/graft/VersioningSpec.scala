package graft

import org.apache.spark.sql.functions._

import graft.operators.{Centrality, CoOccurrence, Sampling, SnapshotDiff}

/** Round-8 wave-2 operators: snapshot diff, weighted
  * without-replacement sampling, integer PageRank. */
class VersioningSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val m = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff report carries the dimension from whichever side has it") {
    val oldSnap = Seq((1L, "a", "s1"), (2L, "b", "s2"))
      .toDF("doc_id", "text", "source")
    val newSnap = Seq((2L, "b", "s2"), (5L, "e", "s1"))
      .toDF("doc_id", "text", "source")
    val m = SnapshotDiff.diffReport(oldSnap, newSnap, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // removed doc 1 reports under its OLD source; added doc 5 under new
    assert(m === Map(("s1", "removed") -> 1L, ("s2", "unchanged") -> 1L,
      ("s1", "added") -> 1L))
  }

  test("weightedPerGroup returns exactly k rows per group, heaviest ranked first") {
    val rows = (1L to 20L).map(i => ("g", i, 1L)) :+ (("g", 99L, 1000000000000000L))
    val df = rows.toDF("src", "id", "w")
    val out = Sampling.weightedPerGroup(df, Seq("src"), col("id"), col("w"), k = 5)
      .collect()
    assert(out.length === 5)
    // skey = floor(h·2^20 / w): the 10^15-weight row keys below 5
    // (h < 2^32 ⇒ h·2^20/10^15 < 4.6) and must win rank 1 — every
    // weight-1 row keys at h·2^20 ≥ 2^20
    val first = out.find(_.getAs[Long]("rn") == 1L).get
    assert(first.getAs[Long]("id") === 99L)
    assert(first.getAs[Long]("skey") < 5L)
  }

  test("weightedPerGroup is layout-independent (same sample after repartition)") {
    val df = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val a = Sampling.weightedPerGroup(df, Seq("source"), col("doc_id"),
      col("n_chars"), k = 5).orderBy("source", "rn")
      .collect().map(_.toString).toSeq
    val b = Sampling.weightedPerGroup(df.repartition(13), Seq("source"),
      col("doc_id"), col("n_chars"), k = 5).orderBy("source", "rn")
      .collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("integerPageRank matches the hand-computed fixed star graph exactly") {
    // symmetric star: hub h=0 <-> spokes 1..4; outdeg(h)=4, outdeg(s)=1
    val pairs = (1L to 4L).map(s => (0L, s))
    val edges = (pairs.map { case (h, s) => (h, s) } ++
      pairs.map { case (h, s) => (s, h) }).toDF("src", "dst")
    val pr = Centrality.integerPageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: h = 150000 + 4·(8500·10^6 div 10^4) = 3,550,000
    //        s = 150000 + (8500·10^6 div 4·10^4)  =   362,500
    // iter2: h = 150000 + 4·(8500·362500 div 10^4) = 1,382,500
    //        s = 150000 + (8500·3550000 div 4·10^4) = 904,375
    // iter3: h = 150000 + 4·(8500·904375 div 10^4) = 3,224,872
    //        s = 150000 + (8500·1382500 div 4·10^4) = 443,781
    assert(pr(0L) === 3224872L)
    (1L to 4L).foreach(s => assert(pr(s) === 443781L))
  }

  test("coOccurrence pairs score exact ppm lift and respect minShared") {
    // baskets: {1,2} twice, {1,3} once → (1,2) shared=2 survives,
    // (1,3) shared=1 filtered at minShared=2
    val inter = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("bk", "item")
    val out = CoOccurrence.pairs(inter, "bk", "item", minShared = 2).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("item_a") === 1L && r.getAs[Long]("item_b") === 2L)
    assert(r.getAs[Long]("n_shared") === 2L)
    // lift = 3 baskets · 2 shared / (3·2) = 1.0 → 1,000,000 ppm
    assert(r.getAs[Long]("lift_ppm") === 1000000L)
  }

  test("coOccurrence hot-basket cap drops mega-baskets via broadcast anti-join") {
    // one 50-item basket (1225 pairs) + two 2-item baskets; cap at 10
    val hot = (1L to 50L).map(i => (99L, i))
    val small = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val inter = (hot ++ small).toDF("bk", "item")
    val capped = CoOccurrence.pairs(inter, "bk", "item",
      minShared = 2, maxBasket = 10)
    assert(capped.count() === 1) // only (1,2) from the two small baskets
    // totals count SURVIVING interactions: n_a = n_b = 2, nBaskets = 2
    val r = capped.collect().head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("lift_ppm") === 1000000L)
    // the cap's join shape, asserted upstream of pairs()'s pin
    val p = CoOccurrence.cappedInteractions(inter, "bk", "item", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), "hot-basket cap is not a left-anti join")
  }

  test("coOccurrence topNeighbors ranks shared desc, partner asc, k-bounded") {
    val pairsDf = Seq((1L, 2L, 5L, 10L, 10L, 0L), (1L, 3L, 5L, 10L, 10L, 0L),
      (1L, 4L, 9L, 10L, 10L, 0L), (2L, 3L, 1L, 10L, 10L, 0L))
      .toDF("item_a", "item_b", "n_shared", "n_a", "n_b", "lift_ppm")
    val top = CoOccurrence.topNeighbors(pairsDf, k = 2)
      .filter(col("item") === 1L).orderBy("rn").collect()
    assert(top.map(r => (r.getAs[Long]("partner"), r.getAs[Long]("rn"))).toSeq
      === Seq((4L, 1L), (2L, 2L))) // 9-shared first; tie 5/5 → partner 2
  }

  test("integerPageRank is layout-independent (exact integer sums)") {
    val pairsDf = graft.sources.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
      .join(graft.sources.Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_partkey") * 2 + 1).as("p"))
      .distinct()
    val edges = pairsDf.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(pairsDf.select(col("p").as("src"), col("c").as("dst")))
    val a = Centrality.integerPageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Centrality.integerPageRank(edges.repartition(7), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  /** Brute-force per-node triangle counts: every 3-subset of nodes
    * whose 3 edges all exist. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("triangleCounts matches brute force on fixed graphs incl. hubs and cliques") {
    // K5 (every node in C(4,2)=6 triangles), a star hub (0 triangles —
    // the degree² hazard the orientation bounds), a path, and a
    // two-triangle bowtie sharing node 100
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j),
      (1L to 10L).map(i => (0L, i)),
      Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      Seq((100L, 101L), (101L, 102L), (100L, 102L),
        (100L, 103L), (103L, 104L), (100L, 104L))
    ).map(_.toSeq)
    cases.foreach { es =>
      val got = Centrality.triangleCounts(es.toDF("item_a", "item_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteTriangles(es), s"graph $es")
    }
  }

  test("triangleCounts matches brute force on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 12 + trial
      val es = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val got = Centrality.triangleCounts(es.toDF("item_a", "item_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteTriangles(es), s"trial $trial, ${es.size} edges")
    }
  }
}
