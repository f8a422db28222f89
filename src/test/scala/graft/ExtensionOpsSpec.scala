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
}
