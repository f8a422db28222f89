package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Linkage, Sampling}
import graft.queries.CurationQueries

class CurationSpec extends SparkSpec {

  test("blockedLink: matches within blocks under threshold, df-caps hot blocks") {
    import spark.implicits._
    val left = Seq(
      (1L, "Customer#000000001", "000000001"),
      (2L, "Customer#000000002", "000000002"),
      (3L, "Customer#000000099", "000000099"), // no right-side block
      (4L, "Totally#Different1", "000000001")  // same block, too far
    ).toDF("id", "txt", "blk")
    val right = Seq(
      (11L, "Supplier#000000001", "000000001"),
      (12L, "Supplier#000000002", "000000002")
    ).toDF("id", "txt", "blk")
    val got = Linkage.blockedLink(left, right, maxEd = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === Set((1L, 11L), (2L, 12L)))
    assert(got((1L, 11L)) === 5L) // Customer# vs Supplier#
    // "Totally#Different1" vs "Supplier#000000001" exceeds maxEd
    assert(!got.keySet.exists(_._1 == 4L))
  }

  test("blockedLink: df-cap drops a hot block on either side") {
    import spark.implicits._
    val left = (1L to 10L).map(i => (i, s"name$i", "HOT"))
      .toDF("id", "txt", "blk")
    val right = Seq((100L, "name1", "HOT")).toDF("id", "txt", "blk")
    assert(Linkage.blockedLink(left, right, maxEd = 6, maxDf = 5).isEmpty)
    assert(Linkage.blockedLink(left, right, maxEd = 6, maxDf = 0).count() > 0)
  }

  test("rate anomaly: flags an injected spike, needs 7 warm-up days") {
    import spark.implicits._
    // 10 flat days then a 10x spike on day 11; counts per day below
    val rows = for {
      d <- 1 to 11
      i <- 1 to (if (d == 11) 100 else 10)
    } yield (Date.valueOf(f"2024-01-$d%02d"), "click", i)
    val ev = rows.toDF("day", "event_type", "i")
      .select(col("day").cast("timestamp").as("ts"), col("event_type"))
    val d = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    val flagged = d.withColumn("s", sum(col("n")).over(tw))
      .withColumn("ss", sum(col("n") * col("n")).over(tw))
      .withColumn("k", count(lit(1)).over(tw))
      .filter(col("k") === 7 &&
        (lit(7) * col("n") - col("s")) * (lit(7) * col("n") - col("s")) >
          lit(4) * (lit(7) * col("ss") - col("s") * col("s")))
      .select("day").as[Date].collect().toSet
    assert(flagged === Set(Date.valueOf("2024-01-11")))
  }

  test("cluster split: every dup-cluster member lands in the same split") {
    val docs = sources.Tables.load(spark, sf, "documents")
    val labels = Dedup.resolve(Dedup.jaccardPairs(
      Dedup.shingleProjection(docs, "text", "doc_id"),
      threshold = 0.5, maxDf = 1000))
    val assigned = docs.select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("split", Sampling.splitColumn(col("canonical_id")))
    // zero clusters straddle a split boundary
    val straddling = assigned.groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1)
    assert(straddling.isEmpty)
    // and the assignment is total: one row per document
    assert(assigned.count() === docs.count())
  }

  test("quality canonical: longest member wins, ties to lowest id") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "canonical_id")
    val chars = Seq((1L, 10L), (2L, 50L), (3L, 50L)).toDF("doc_id", "n_chars")
    import graft.functions.expressions.{GraftExpressions => E}
    val got = labels.join(chars, Seq("doc_id"))
      .groupBy("canonical_id")
      .agg(E.topKByScore(col("n_chars").cast("double"), col("doc_id"), 1)
          .as("tk"),
        max(col("n_chars")).as("best_chars"),
        count(lit(1)).as("n_members"))
      .select(col("canonical_id"),
        element_at(col("tk"), 1).getField("id").as("best_id"),
        col("best_chars"), col("n_members"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 50L, 3L)))
  }

  test("event quota: keeps the first k by time, ties to lowest id, caps at k") {
    import spark.implicits._
    import graft.functions.expressions.{GraftExpressions => E}
    // user 1: five events one day (two tied at t=2); user 2: two events
    val ev = Seq(
      (1L, 10L, 5L), (1L, 2L, 9L), (1L, 2L, 4L), (1L, 7L, 1L), (1L, 30L, 2L),
      (2L, 5L, 6L), (2L, 6L, 7L)
    ).toDF("user_id", "us", "event_id")
    val kept = ev.groupBy("user_id")
      .agg(E.topKByScore((-col("us")).cast("double"), col("event_id"), 3)
        .as("tk"))
      .select(col("user_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("user_id"), (col("pos") + 1).as("rk"), col("p.id").as("eid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // user 1: t=2 twice (ids 4, 9 — id asc breaks the tie), then t=7
    assert(kept === Set((1L, 1, 4L), (1L, 2, 9L), (1L, 3, 1L),
      (2L, 1, 6L), (2L, 2, 7L)))
  }

  test("DeflateSize: repeated < prose < high-entropy; deterministic across runs") {
    import spark.implicits._
    import graft.functions.expressions.{GraftExpressions => E}
    val repeated = ("spam " * 200).trim
    val prose = (1 to 100).map(i => s"word$i token$i").mkString(" ")
    val entropy = {
      val rnd = new scala.util.Random(7)
      (1 to 1000).map(_ => rnd.nextPrintableChar()).mkString
    }
    def sizes() = Seq(("rep", repeated), ("pro", prose), ("ent", entropy))
      .toDF("k", "t")
      .select(col("k"), E.deflateSize(col("t")).as("z"),
        octet_length(col("t")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    val s1 = sizes()
    // ratios are strictly ordered: repetition compresses hardest
    def ratio(k: String) = s1(k)._1.toDouble / s1(k)._2
    assert(ratio("rep") < ratio("pro"), s1)
    assert(ratio("pro") < ratio("ent"), s1)
    // printable-ASCII entropy tops out near log2(95)/8 ≈ 0.82 + header
    assert(ratio("rep") < 0.35 && ratio("ent") > 0.8, s1)
    // bit-deterministic: a second evaluation returns identical sizes
    assert(sizes() === s1)
  }

  test("Croston hand case: NULL state until first demand, separate size/interval EWMAs") {
    import spark.implicits._
    // demands 0,3,0,0,6,0: first demand (day 2, interval 2) seeds
    // z=3000, p=2000; second (day 5, interval 3) moves them one α=1/4
    // step: z = 3000+⌊3000/4⌋ = 3750, p = 2000+⌊1000/4⌋ = 2250; the
    // pre-observation forecast is (1000·z) div p of the PRIOR state
    val daily = Seq(0L, 3L, 0L, 0L, 6L, 0L).zipWithIndex.map { case (x, i) =>
      ("a", Date.valueOf(f"2024-01-${i + 1}%02d"), x)
    }.toDF("event_type", "day", "x")
    val rows = CurationQueries.crostonReport(daily)
      .orderBy("day").collect()
    def zpf(i: Int) = (
      Option(rows(i).getAs[java.lang.Long]("size_milli")).map(_.toLong),
      Option(rows(i).getAs[java.lang.Long]("interval_milli")).map(_.toLong),
      Option(rows(i).getAs[java.lang.Long]("forecast_milli")).map(_.toLong))
    assert(zpf(0) === ((None, None, None)))
    assert(zpf(1) === ((Some(3000L), Some(2000L), None)))
    assert(zpf(2) === ((Some(3000L), Some(2000L), Some(1500L))))
    assert(zpf(3) === ((Some(3000L), Some(2000L), Some(1500L))))
    assert(zpf(4) === ((Some(3750L), Some(2250L), Some(1500L))))
    // 3750000 div 2250 = 1666 (floor)
    assert(zpf(5) === ((Some(3750L), Some(2250L), Some(1666L))))
    assert(rows.map(_.getAs[Long]("demand")).toSeq
      === Seq(0L, 3L, 0L, 0L, 6L, 0L))
  }

  test("curation queries run on sf0.001 and return sane shapes") {
    for (q <- CurationQueries.all) {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, q.name)
      df.collect() // must execute without error
    }
  }
}
