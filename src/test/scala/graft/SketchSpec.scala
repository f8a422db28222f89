package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.queries.{PipelineQueries, Registry}
import graft.sources.Tables

/** The count-min guarantees q224 relies on: never-underestimate,
  * ε·N overestimate bound, and exact counter-wise mergeability
  * (sketch of the whole corpus == merge of half-corpus sketches,
  * estimate-for-estimate). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val tok = docs.select(explode(split(col("text"), " ")).as("term"))

  test("q224: estimates never undercount and respect the eps*N bound") {
    val rows = PipelineQueries.cmsHeavyHitters.fn(spark, sf).collect()
    assert(rows.length === 20)
    val n = tok.count()
    for (r <- rows) {
      val over = r.getAs[Long]("over_n")
      assert(over >= 0L, s"${r.getString(0)} undercounted")
      // eps = 0.0005; the 99% per-query bound, with slack for the
      // tiny sf0.001 corpus where eps*N < 1 forces over_n == 0 almost
      // surely — a violation here means the sketch is broken, not
      // unlucky
      assert(over <= math.max(1L, (0.0005 * 3 * n).toLong),
        s"${r.getString(0)} over=$over n=$n")
    }
  }

  test("q224 term set and true counts equal the exact twin q73") {
    val twin = Registry.byName("q73_vocab_top").fn(spark, sf)
      .as[(String, Long)].collect().toMap
    val got = PipelineQueries.cmsHeavyHitters.fn(spark, sf)
      .select("term", "true_n").as[(String, Long)].collect().toMap
    assert(got === twin)
  }

  test("merge of half-corpus sketches == whole-corpus sketch") {
    val h1 = tok.filter(crc32(col("term")) % 2 === 0)
    val h2 = tok.filter(crc32(col("term")) % 2 === 1)
    val whole = Sketches.stringCms(tok, "term", 0.001, 0.99, 7)
    val merged = Sketches.stringCms(h1, "term", 0.001, 0.99, 7)
      .mergeInPlace(Sketches.stringCms(h2, "term", 0.001, 0.99, 7))
    assert(merged.totalCount() === whole.totalCount())
    val probes = tok.distinct().limit(50).as[String].collect()
    for (p <- probes)
      assert(merged.estimateCount(p) === whole.estimateCount(p), p)
  }

  test("determinism: same seed + different partitioning, same estimates") {
    val a = Sketches.stringCms(tok, "term", 0.001, 0.99, 7)
    val b = Sketches.stringCms(tok.repartition(13), "term", 0.001, 0.99, 7)
    val probes = tok.distinct().limit(50).as[String].collect()
    for (p <- probes)
      assert(a.estimateCount(p) === b.estimateCount(p), p)
  }

  test("Misra-Gries: output equals the exact threshold relation") {
    val k = 199
    val exact = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(tok.agg(count(lit(1)).as("n")))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select("term", "cnt").as[(String, Long)].collect().toMap
    val got = Sketches.frequentTerms(tok, "term", k)
      .select("term", "cnt").as[(String, Long)].collect().toMap
    assert(got === exact)
    assert(got.nonEmpty, "threshold relation empty at this sf — vacuous")
  }

  test("Misra-Gries: layout-independent output despite order-dependent candidates") {
    val a = Sketches.frequentTerms(tok, "term", 99)
      .select("term", "cnt").as[(String, Long)].collect().toSet
    val b = Sketches.frequentTerms(tok.repartition(17), "term", 99)
      .select("term", "cnt").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("Misra-Gries: adversarial burying never drops a heavy hitter") {
    // one heavy term delivered FIRST, then buried under > k distinct
    // noise terms (the eviction-pressure worst case), single partition
    val heavy = Seq.fill(60)("hot")
    val noise = (1 to 400).map(i => s"noise_$i")
    val data = (heavy ++ noise).toDF("term").coalesce(1)
    val got = Sketches.frequentTerms(data, "term", k = 9)
      .select("term").as[String].collect()
    // threshold N/(k+1) = 460/10 = 46 < 60: hot MUST survive
    assert(got.toSeq === Seq("hot"))
  }

  // ---- KMV (q259/q260): the deterministic distinct sketch ----

  private def kmv(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] = {
    val E = graft.functions.expressions.GraftExpressions
    df.agg(E.kmvMins(col("h"), k).as("sk"))
      .select("sk").as[Seq[Long]].collect().head
  }

  test("KMV: layout-independent and duplicate-immune (a set of mins)") {
    val h = docs.select(explode(split(col("text"), " ")).as("term"))
      .select((conv(substring(md5(col("term")), 1, 12), 16, 10)
        .cast("long") + 1).as("h"))
    val a = kmv(h, 64)
    assert(a === kmv(h.repartition(17), 64),
      "merge of per-partition sketches depends on layout")
    assert(a === kmv(h.union(h), 64),
      "feeding every value twice changed the sketch")
    assert(a === a.sorted && a.distinct === a,
      "eval must emit ascending distinct mins")
  }

  test("KMV: estimate within the 1/sqrt(k) error envelope on known cardinality") {
    // 20k known-distinct hashed keys; k=256 => sigma ~ 6.25%, assert 4 sigma
    val n = 20000
    val h = spark.range(n.toLong).select(
      (conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
        .cast("long") + 1).as("h"))
    val sk = kmv(h, 256)
    assert(sk.length === 256)
    val est = 255L * 281474976710656L / sk.last
    assert(math.abs(est - n) <= n / 4,
      s"KMV estimate $est departs $n by > 4 sigma")
  }

  test("KMV: sketch equals the exact k smallest distinct hashes (the oracle contract)") {
    val h = docs.select(explode(split(col("text"), " ")).as("term"))
      .select((conv(substring(md5(col("term")), 1, 12), 16, 10)
        .cast("long") + 1).as("h"))
    val expected = h.distinct().orderBy("h").limit(100)
      .as[Long].collect().toSeq
    assert(kmv(h, 100) === expected)
  }

  test("SQL surface: graft_kmv_mins(h, k) equals the bridge form") {
    graft.functions.expressions.GraftExpressions.register(spark)
    val h = docs.select(explode(split(col("text"), " ")).as("term"))
      .select((conv(substring(md5(col("term")), 1, 12), 16, 10)
        .cast("long") + 1).as("h"))
    h.createOrReplaceTempView("kmv_sql_in")
    val viaSql = spark.sql("SELECT graft_kmv_mins(h, 64) AS sk FROM kmv_sql_in")
      .select("sk").as[Seq[Long]].collect().head
    assert(viaSql === kmv(h, 64))
  }

  test("q260: union-sketch Jaccard is exact when both sets fit inside k") {
    // groups smaller than k make the sketch the set itself: estimate == exact
    val rows = Registry.byName("q260_kmv_jaccard").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (est, exact) = (r.getAs[Long]("kmv_ppm"), r.getAs[Long]("exact_ppm"))
      // at any sf the estimate must stay inside the coarse KMV envelope;
      // the hash-oracle pins exactness, this pins sanity at other sfs
      assert(math.abs(est - exact) <= 250000L,
        s"${r.getString(0)}x${r.getString(1)}: est=$est exact=$exact")
    }
  }
}
