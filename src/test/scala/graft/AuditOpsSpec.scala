package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Semantics checks for the wave-2 audit layer that the SQL oracle
  * cannot express: the z-order plan's data-skipping benefit is
  * quantified against a single-column layout.
  */
class AuditOpsSpec extends SparkSpec {

  test("q159's closed-form block rank mass equals brute-force sorted sum (property)") {
    // the histogram formula c·(m·r0 + m(m−1)/2) per tie-block must
    // reproduce Σ i·x_(i) over the count-sorted multiset for ANY
    // multiset — checked against direct computation on random inputs
    // (pure JVM property; the Spark plan is verified by the oracle)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val countsGen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 50L))
    val prop = Prop.forAll(countsGen) { xs =>
      val sorted = xs.sorted
      val direct = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      // histogram route: group equal counts, closed-form per block
      val hist = xs.groupBy(identity).map { case (c, g) => (c, g.size.toLong) }
        .toSeq.sortBy(_._1)
      var before = 0L
      var mass = 0L
      hist.foreach { case (c, m) =>
        mass += c * (m * (before + 1) + m * (m - 1) / 2)
        before += m
      }
      mass == direct
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("sentence-mode chunking: one chunk per sentence, CRLF/blank-safe, strip removes templates everywhere") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Subscribe now! First unique thought. More unique text?"),
      (2L, "Subscribe now! Second unique thought."),
      (3L, "Subscribe now. Third unique thought."),
      (4L, ""),
      (5L, "No template here. Another original line.")
    ).toDF("doc_id", "text")
    val chunks = graft.operators.Dedup
      .chunked(docs, "text", "doc_id", chunkWords = 8, splitSentences = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 1 has exactly its three sentences, in order, trimmed
    assert(chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("Subscribe now", "First unique thought", "More unique text"))
    // empty text keeps the one-empty-chunk invariant
    assert(chunks.filter(_._1 == 4L).map(_._3).toSeq == Seq(""))
    // the template sentence (df=3 across docs 1-3) strips from ALL of
    // them; unique sentences survive; punctuation variants ("now!" vs
    // "now.") fold together because the delimiter IS the punctuation
    val stripped = graft.operators.Dedup
      .boilerplateStrip(docs, "text", "doc_id", minDf = 3, splitSentences = true)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(stripped(1L) == "First unique thought More unique text")
    assert(stripped(2L) == "Second unique thought")
    assert(stripped(3L) == "Third unique thought")
    assert(stripped(5L) == "No template here Another original line")
  }

  test("q165: length-sorted batching cuts pad waste vs hash-order batching") {
    val dir = "/root/testdata/sf0.01"
    val sortedPad = Registry.byName("q165_length_batching").fn(spark, dir)
      .agg(sum("padding")).collect()(0).getLong(0)
    // baseline: the same 32-doc batches in salted-hash order (what a
    // shuffled dataloader does without length bucketing)
    val d = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":b"))),
          1, 8), 16, 10).cast("long").as("h"))
    val hashPad = graft.operators.Ranks
      .globalRunningSum(d, Seq(col("h").asc, col("doc_id").asc), lit(1L), "rk")
      .withColumn("batch_id", expr("(rk - 1) div 32"))
      .groupBy("batch_id")
      .agg((count(lit(1)) * max(col("n_tok")) - sum(col("n_tok"))).as("padding"))
      .agg(sum("padding")).collect()(0).getLong(0)
    assert(sortedPad * 2 < hashPad,
      s"length bucketing should at least halve padding: sorted $sortedPad vs hash $hashPad")
  }

  test("q161: z-order files are tight in BOTH dims where a day-sort is tight in one") {
    // reconstruct the two pruning dims for every event, join the plan's
    // file assignment, and compare per-file min/max envelope widths
    // against the same file size under a plain day-then-user sort.
    // sf0.01: 10,000 events → ten 1000-row files (sf0.001's single file
    // has no envelope to measure)
    val dir = "/root/testdata/sf0.01"
    val plan = Registry.byName("q161_zorder_plan").fn(spark, dir)
    val dims = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_id"),
        conv(substring(md5(concat(col("user_id").cast("string"), lit(":z"))),
          1, 4), 16, 10).cast("long").as("ub"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").bitwiseAND(lit(65535L)).as("db"))
    val z = plan.join(dims, "event_id")
    def spans(df: org.apache.spark.sql.DataFrame, fileCol: String): (Double, Double) = {
      val r = df.groupBy(fileCol)
        .agg((max("ub") - min("ub")).as("uspan"), (max("db") - min("db")).as("dspan"))
        .agg(avg("uspan").as("u"), avg("dspan").as("d")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val (zu, zd) = spans(z, "file_id")
    // the baseline layout: sort by (day, user-bucket) and cut the same
    // 1000-row files — tight in day, unconstrained in user
    val sorted = graft.operators.Ranks.globalRunningSum(
      dims, Seq(col("db").asc, col("ub").asc, col("event_id").asc),
      lit(1L), "pos")
      .withColumn("file_id", expr("(pos - 1) div 1000"))
    val (su, sd) = spans(sorted, "file_id")
    // normalize each span by its dimension's own range (user: the fixed
    // 16-bit hash range; day: the data's max day) — the skipping claim
    // is per-dimension: what fraction of a dim's range must a file's
    // min/max admit for a predicate on that dim alone
    val fullU = 65535.0
    val fullD = dims.agg(max("db")).collect()(0).getLong(0).toDouble
    val (nzU, nzD) = (zu / fullU, zd / fullD)
    val (nsU, nsD) = (su / fullU, sd / fullD)
    // day-sort: day tight, user UNCONSTRAINED — a user-only predicate
    // scans every file
    assert(nsD <= nzD, s"day-sort day span $nsD should beat z-order's $nzD")
    assert(nsU > 0.9, s"day-sort user span $nsU should be ~unconstrained")
    // z-order: BOTH dims bounded — every single-dim predicate prunes.
    // (10 files over the curve: ideal square tiles would reach √(1/10)
    // ≈ 0.32 per dim; z-curve segment jaggedness lands mid-0.5s for the
    // wider dim — measured 0.54 / 0.33 on this corpus)
    assert(nzU < 0.66, s"z-order user span $nzU not bounded")
    assert(nzD < 0.66, s"z-order day span $nzD not bounded")
    // the balanced-envelope claim: z-order's WORST dimension is far
    // better than the sort layout's worst dimension
    assert(math.max(nzU, nzD) < 0.66 * math.max(nsU, nsD),
      s"z-order worst-dim ${math.max(nzU, nzD)} vs sort ${math.max(nsU, nsD)}")
  }
}
