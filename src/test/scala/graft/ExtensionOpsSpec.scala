package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Operator-level contracts of the round-6 extension wave: the
  * edit-distance blocking trade, the token-aligned containment
  * contract, and the multi-table simhash recall direction. */
class ExtensionOpsSpec extends SparkSpec {

  private val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra tango"

  test("editDistancePairs: finds char-noise dups past the block prefix; misses prefix damage") {
    import spark.implicits._
    val docs = Seq(
      (1L, base),
      (2L, base.replace("oscar", "osqar")),     // 1 char edit past prefix
      (3L, "XX" + base.substring(2)),           // damage INSIDE the 24-char block
      (4L, "unrelated words entirely different content here okay")
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "text", "doc_id",
      prefixLen = 24, maxEd = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((1L, 2L)), s"got ${got.keySet}")
    assert(got((1L, 2L)) == 1L, s"edit distance ${got((1L, 2L))}")
    // the blocking contract: doc 3 is 2 edits from doc 1 but its damage
    // falls inside the prefix block, so it is (documentedly) missed
  }

  test("editDistancePairs: df-cap drops hot blocks; length-delta guard never changes results") {
    import spark.implicits._
    // 5 docs share one block prefix: df-cap 3 drops the whole block
    val hot = (0 until 5).map(i => (i.toLong, base + s" tail$i"))
    val docs = hot.toDF("doc_id", "text")
    val capped = Dedup.editDistancePairs(docs, "text", "doc_id",
      prefixLen = 24, maxEd = 16, maxDf = 3).count()
    assert(capped == 0, "df-cap did not drop the hot block")
    val uncapped = Dedup.editDistancePairs(docs, "text", "doc_id",
      prefixLen = 24, maxEd = 16).count()
    assert(uncapped == 10, s"expected all 10 in-block pairs, got $uncapped")
  }

  test("containmentPairs: token-aligned contract — verbatim slice found, mid-token overlap not") {
    import spark.implicits._
    val inner = "india juliet kilo lima mike november oscar papa quebec romeo"
    val docs = Seq(
      (1L, base),                       // contains `inner` token-aligned
      (2L, inner),                      // 10 tokens: at the guarantee floor
      (3L, "prefix " + inner + " suffix"),
      (4L, "short doc"),                // < 10 tokens: out of contract
      (5L, base.replace(" india", "xindia")) // mid-token: NOT token-aligned
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((2L, 1L)), s"verbatim containment missed: $got")
    assert(got.contains((2L, 3L)), s"padded containment missed: $got")
    assert(!got.exists(_._2 == 5L) || !got.contains((2L, 5L)),
      s"mid-token overlap wrongly matched: $got")
    assert(!got.exists(_._1 == 4L), "sub-floor doc leaked into results")
  }

  test("simhash rotated tables only ADD recall (multi-table is a superset generator)") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    def pairs(nTables: Int): Set[(Long, Long)] =
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8,
        nTables = nTables)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    val two = pairs(2)
    assert(one.subsetOf(two),
      s"table 2 lost pairs table 1 found: ${one.diff(two).take(5)}")
    // the verify stage is unchanged, so every emitted pair still holds
    // the Hamming bound regardless of which table surfaced it
  }

  test("normalizedExact: case/punct/whitespace variants fold; distinct content does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World! This is a test."),
      (2L, "hello world  this is a test"),        // punct gone, double space
      (3L, "HELLO WORLD\nTHIS IS A TEST"),        // case + newline
      (4L, "hello world this is a test"),         // already folded
      (5L, "a genuinely different document")
    ).toDF("doc_id", "text")
    val got = Dedup.normalizedExact(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("canonical_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_variants"))).toMap
    assert(got.keySet == Set(1L, 5L), s"groups: ${got.keySet}")
    assert(got(1L) == (4L, 4L), s"fold group: ${got(1L)}")
    assert(got(5L) == (1L, 1L))
    // plain exact dedup sees 5 distinct texts — n_variants > 1 is
    // exactly the duplication the fold wins over exact()
    assert(Dedup.exact(docs, "text", "doc_id").count() == 5)
  }

  test("normalizedExact: \\x0B and \\f strip as punctuation, not whitespace (RE2 parity)") {
    import spark.implicits._
    // Java's \s includes \x0B and \f; RE2/DuckDB's does not. The fold
    // uses explicit [ \t\n\r] classes on both engine sides, so these
    // two chars DELETE (joining their neighbors) rather than become a
    // separator — pin that so a later "simplify to \s" breaks loudly.
    val docs = Seq((1L, "ab"), (2L, "a\fb"), (3L, "ab"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = Dedup.normalizedExact(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("canonical_id") ->
        r.getAs[Long]("n_docs")).toMap
    assert(got == Map(1L -> 3L, 4L -> 1L), s"fold groups: $got")
  }

  test("sourceUnigramKl: uniform source sits at KL 0; drifted source is positive") {
    import spark.implicits._
    // two sources with the corpus-average mix ⇒ each source's
    // distribution EQUALS the corpus distribution ⇒ KL exactly 0
    val uniform = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"))
      .toDF("doc_id", "text", "source")
    val klU = graft.operators.LangModel.sourceUnigramKl(uniform)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("kl_nano")).toMap
    assert(klU.values.forall(_ == 0L), s"uniform corpus drifted: $klU")
    // one source heavy in a word the other never uses: both diverge
    // from the pooled corpus distribution strictly positively
    val skewed = Seq(
      (1L, "a a a a b", "s1"), (2L, "b b b b a", "s2"))
      .toDF("doc_id", "text", "source")
    val klS = graft.operators.LangModel.sourceUnigramKl(skewed)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("kl_nano")).toMap
    assert(klS.values.forall(_ > 0L), s"drifted sources read KL 0: $klS")
    // symmetric construction ⇒ symmetric divergence
    assert(klS("s1") == klS("s2"), s"asymmetric KL on symmetric mix: $klS")
  }

  test("q104 epoch plan invariants: planned ≤ budget, caps bind only where deficit > 0") {
    val plan = graft.queries.ExtensionQueries.epochPlan.fn(spark, sf)
      .collect()
    val avail = plan.map(_.getAs[Long]("avail_tokens")).sum
    val planned = plan.map(_.getAs[Long]("planned_tokens")).sum
    // targets allocate (integer-floored) shares of B = tot div 2
    assert(planned <= avail / 2 + plan.length,
      s"planned $planned exceeds the B=${avail / 2} budget")
    plan.foreach { r =>
      val epochs = r.getAs[Long]("epochs_ppm")
      val deficit = r.getAs[Long]("deficit_tokens")
      assert(epochs <= 4000000L, s"epoch cap breached: $r")
      assert(deficit >= 0L, s"negative deficit: $r")
      if (deficit > 0)
        assert(r.getAs[Long]("target_tokens") >
          4 * r.getAs[Long]("avail_tokens"), s"deficit without a bound cap: $r")
    }
  }
}
