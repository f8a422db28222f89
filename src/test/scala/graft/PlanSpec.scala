package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Plan-quality assertions — the 100 TB posture, checked mechanically:
  * filters/projections must reach the parquet scan, dimension joins must
  * broadcast, aggregates must have a map-side partial phase, hot paths
  * must stay inside whole-stage codegen. A plan regression fails CI even
  * while results stay correct. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = Registry.byName(name).fn(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: predicates are pushed to the parquet scan") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // unused columns are pruned from the scan
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("l_partkey"),
      "scan reads pruned column l_partkey")
  }

  test("q07: dimension tables join via broadcast hash join") {
    val p = plan("q07_join_enrich")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q31: query vectors are broadcast against the corpus scan") {
    val p = plan("q31_knn_cosine")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q03: aggregation has a partial (map-side) phase before the shuffle") {
    val p = plan("q03_daily_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q30: similarity pair join broadcasts the small side and uses DotProductL") {
    val p = plan("q30_embedding_neardup")
    // broadcast nested-loop (range condition), never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.toLowerCase.contains("dotproductl"),
      "custom expression missing from plan")
  }

  test("RewriteDotProduct: declarative HOF dot product is rewritten to DotProductL") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    val df = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(V.quantize(col("embedding")).as("qv"))
      .select(V.dotQ(col("qv"), col("qv")).as("nsq"))     // declarative form
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.toLowerCase.contains("dotproductl"), p.take(1500))
    assert(!p.contains("aggregate(zip_with"), "HOF survived the rewrite")
    // and it computes the same values as the unrewritten interpreter path
    val direct = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(V.quantize(col("embedding")).as("qv"))
      .select(graft.functions.expressions.GraftExpressions
        .dotQFast(col("qv"), col("qv")).as("nsq"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      direct.collect().map(_.getLong(0)).toSeq)
  }

  test("RewriteDotProduct: adjacent-but-different lambdas are NOT rewritten") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    // a and b differ, so a wrong rewrite to DotProductL(a, b) changes values
    val base = graft.sources.Tables.load(spark, sf, "embeddings")
      .limit(5)
      .select(V.quantize(col("embedding")).as("a"))
      .withColumn("b", expr("transform(a, x -> x + 1L)"))

    // (x, y) -> x * x: sum of squares of a, NOT dot(a, b)
    val sq = base.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * x), 0L, (acc, x) -> acc + x)").as("v"))
    assert(!sq.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproductl"),
      "x*x lambda was wrongly rewritten to a dot product")
    // oracle: same sum of squares without zip_with (never rewriteable)
    val sqOracle = base.select(expr(
      "aggregate(transform(a, x -> x * x), 0L, (acc, x) -> acc + x)").as("v"))
    assert(sq.collect().map(_.getLong(0)).toSeq ==
      sqOracle.collect().map(_.getLong(0)).toSeq)

    // (acc, x) -> acc + acc: folds to 0, NOT the dot product
    val dbl = base.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + acc)").as("v"))
    assert(!dbl.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproductl"),
      "acc+acc lambda was wrongly rewritten to a dot product")
    assert(dbl.collect().forall(_.getLong(0) == 0L))

    // the canonical form still rewrites (guard against over-tightening)
    val ok = base.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)").as("v"))
    assert(ok.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproductl"),
      ok.queryExecution.optimizedPlan.toString.take(1500))
  }

  test("no registered query funnels data through a partition-less window") {
    val offenders = Registry.all.flatMap { q =>
      val df = q.fn(spark, sf)
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => q.name
      }
    }.distinct
    assert(offenders.isEmpty,
      s"single-partition global windows in: ${offenders.mkString(", ")}")
  }

  test("q02: window delta shuffles once on the partition key") {
    val p = plan("q02_running_delta")
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("q47: quality filter is a pruned scan-and-project, no shuffle") {
    val p = plan("q47_quality_filter")
    val read = p.split("ReadSchema")(1).split("\n")(0)
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("url"),
      s"scan reads pruned columns: $read")
    assert(!p.contains("Exchange"), "per-row quality filter should not shuffle")
  }

  test("q50: corpus stats broadcast into the per-doc BM25 projection") {
    val p = plan("q50_bm25")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    val read = p.split("ReadSchema")(1).split("\n")(0)
    assert(!read.contains("lang"), s"scan reads pruned columns: $read")
  }

  test("q48: repetition metrics shuffle nothing and keep the scan pruned") {
    val p = plan("q48_repetition")
    assert(!p.contains("Exchange"),
      "per-doc repetition metrics should not shuffle")
    assert(p.toLowerCase.contains("maxmultiplicity"),
      "native MaxMultiplicity missing from the plan")
  }

  test("q39: IVF probes the persisted index; ranks via partial aggregation, no windows") {
    val p = plan("q39_ann_ivf")
    // the index build (k-means assign) moved OFFLINE to AnnIndex.build:
    // the query plan must not re-train — no max_by assignment phase,
    // just a scan of the persisted inverted file
    assert(!p.contains("partial_max_by"),
      "q39 re-runs the k-means assignment at query time")
    assert(p.toLowerCase.contains("ivf"),
      "probe does not scan the persisted inverted file")
    // probe selection + final re-rank: bounded top-k aggregate
    // (ObjectHashAggregate, partial mode ships ≤k pairs per group)
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_topkbyscore"),
      "TopKByScore aggregate lost its partial phase")
    assert(!p.contains("Window"),
      "a row_number window survived in the IVF path")
  }

  test("q78: edit-dedup blocks via a df-capped anti-join, never a cross product") {
    val p = plan("q78_edit_dedup")
    assert(!p.contains("CartesianProduct"), "blocked join degenerated")
    assert(p.contains("LeftAnti"), "hot-block df-cap anti-join missing")
  }

  test("q80: token truncation is a pure projection — no shuffle") {
    val p = plan("q80_token_truncate")
    assert(!p.contains("Exchange"), "projection-only query shuffled")
  }

  test("q81: funnel aggregates partially; no window over raw events") {
    val p = plan("q81_funnel")
    assert(p.contains("partial_min"), p.take(2000))
    assert(!p.contains("Window"), "funnel ranks with a window")
  }

  test("q82: collocation counts aggregate partially; totals ride a broadcast") {
    val p = plan("q82_collocations")
    assert("partial_count".r.findAllIn(p).size >= 2,
      "count-then-rejoin lost its map-side phases")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "one-row totals frame not broadcast")
    assert(!p.contains("Window"), "collocations rank with a window")
  }

  test("q83: containment candidates come from the fingerprint join, no cross product") {
    val p = plan("q83_containment")
    assert(!p.contains("CartesianProduct"),
      "containment degenerated to all-pairs")
  }

  test("q29: simhash band buckets carry the hot-bucket df-cap anti-join") {
    val p = plan("q29_simhash")
    assert(p.contains("LeftAnti"), "df-cap anti-join missing from q29")
  }

  test("q31: brute-force knn re-ranks via the bounded top-k aggregate") {
    val p = plan("q31_knn_cosine")
    assert(p.contains("partial_topkbyscore"), p.take(2000))
    assert(!p.contains("Window"),
      "q31 still ranks with a window over all scored rows")
  }

  test("q56: benchmark gram set broadcasts; corpus side is never shuffled pre-join") {
    val p = plan("q56_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // final per-doc count keeps its map-side partial phase
    assert("partial_count".r.findAllIn(p).nonEmpty, p.take(2000))
  }

  test("q58: mixture weights broadcast and the text column never leaves the scan") {
    val p = plan("q58_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val read = p.split("ReadSchema")(1).split("\n")(0)
    assert(!read.contains("text"), s"scan reads pruned column text: $read")
  }

  test("q62: the composed corpus pipeline broadcasts its dims and never windows") {
    // the query's plan ends at the prefix-sum RDD boundary; assert the
    // declarative prefix that IS the composition
    val p = graft.queries.PipelineQueries.corpusMixed(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // benchmark grams + mixture weights both broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    // dedup keep-first runs as min_by aggregation with a partial phase,
    // not a per-fingerprint ranking window
    assert(p.contains("partial_min_by"), p.take(3000))
    assert(!p.contains("Window"), "a ranking window crept into the pipeline")
  }

  test("q60: per-domain quota ranks via the bounded top-k aggregate, not a window") {
    val p = plan("q60_domain_quota")
    assert(p.contains("partial_topkbyscore"), p.take(2000))
    assert(!p.contains("Window"),
      "q60 still ranks with a window over every group row")
  }

  test("q90: LM quality selection ranks via the bounded heap with map-side partials") {
    val p = plan("q90_lm_quality_select")
    assert(p.contains("partial_topkbyscore"), p.take(2000))
    assert(!p.contains("Window"),
      "q90 ranks with a window over every scored row")
    assert(!p.contains("CartesianProduct"))
  }

  test("q64: sign-LSH twin's candidate join is an equi-join, never a cross product") {
    val p = plan("q64_signlsh_oracle")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to all-pairs")
  }

  test("q65: tf-idf postings aggregate map-side and prune the scan") {
    val p = plan("q65_tfidf")
    assert(p.contains("partial_count"), "tf counts lack a partial phase")
    assert(!p.contains("Window"), "posting stats rank via a window")
    val read = p.split("ReadSchema")(1).split("\n")(0)
    assert(!read.contains("lang") && !read.contains("source"),
      s"scan reads pruned columns: $read")
  }

  test("q66: bigram LM trains via partial aggregation, no windows") {
    val p = plan("q66_bigram_lm")
    assert(p.contains("partial_count"), "bigram counts lack a partial phase")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "model join degenerated")
  }

  test("q69: PQ scoring broadcasts the query tables and ranks via the bounded heap") {
    val p = plan("q69_ann_pq")
    assert(p.contains("partial_topkbyscore"), "PQ re-rank lacks map-side top-k")
    assert(p.contains("BroadcastNestedLoopJoin"), "query side not broadcast")
    assert(!p.contains("Window"), p.take(2000))
  }

  test("q70: reservoir sample ranks via the bounded heap, scan pruned to id+group") {
    val p = plan("q70_group_sample")
    assert(p.contains("partial_topkbyscore"), "sample lacks map-side top-k")
    assert(!p.contains("Window"), "q70 ranks with a window")
    val read = p.split("ReadSchema")(1).split("\n")(0)
    assert(!read.contains("text"), s"scan reads pruned column text: $read")
  }

  test("q71: sequence packing never plans a partition-less window") {
    val p = plan("q71_seq_pack")
    assert(!p.contains("Window"),
      "q71 fell back to a single-task global window for the prefix sum")
  }

  test("q74: the composed v2 prefix never degenerates to a cross product") {
    // the packSequences tail hides the tree behind its RDD boundary —
    // audit the declarative prefix, like q62's corpusMixed test
    val p = graft.queries.PipelineQueries.corpusV2Train(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), "v2 pipeline planned a cartesian join")
    // the LM's 1-row vocab frame broadcasts into the model projection
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "vocab/stats frame not broadcast")
  }

  test("q87: percentile bounds broadcast; the one window is histogram-sized") {
    val p = plan("q87_length_trim")
    // the corpus-sized side meets the 2-row bounds frame via broadcast,
    // never a shuffled cartesian
    assert(!p.contains("CartesianProduct"), "bounds join planned a cartesian")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "percentile bounds not broadcast")
    // the cumulative count rides a histogram-sized broadcast self-join,
    // not a window: NO window may appear (a corpus-wide rank would
    // single-partition at scale)
    assert(!p.contains("Window"),
      "q87 planned a window — the cumsum must stay histogram-join-shaped")
    // the length histogram aggregates map-side before its shuffle
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "histogram lacks a partial phase")
  }

  test("q88: top-k vocab broadcasts into the coverage join; per-doc agg is partial") {
    val p = plan("q88_oov_rate")
    assert(p.contains("BroadcastHashJoin"), "vocab membership join not broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab top-k fell back to a global sort")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-doc OOV aggregation lacks a map-side phase")
    assert(!p.contains("CartesianProduct"))
  }

  test("q67: chunk-dedup winners elect via aggregation, not a per-chunk window") {
    val p = plan("q67_chunk_dedup")
    assert(p.contains("partial_min"), "winner election lacks map-side combine")
    assert(!p.contains("Window"),
      "q67 elects winners with a window over every chunk occurrence")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "winner re-join degenerated to all-pairs")
  }

  test("q67/q91: chunk shuffles key on the 16-byte digest, never the chunk text") {
    // the one place the engine used to ship corpus text through an
    // exchange twice: winner election / df-count keyed on the raw
    // chunk string. Both now key on ck = unhex(md5(chunk)); the text
    // crosses exactly one exchange (the doc_id-keyed rollup join).
    for (q <- Seq("q67_chunk_dedup", "q91_boilerplate")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning(chunk#"),
        s"$q still shuffles on the raw chunk text")
      assert(p.contains("hashpartitioning(ck#"),
        s"$q winner election is not keyed on the md5 digest")
    }
  }

  test("q115/q116: span election shuffles key on the md5 digest, aggregate — never window or text") {
    for (q <- Seq("q115_dup_span_strip", "q116_span_rate_by_source")) {
      val p = plan(q)
      assert(p.contains("hashpartitioning(gk#"),
        s"$q span winner election is not keyed on the md5 digest")
      assert(p.contains("partial_min"),
        s"$q winner election lacks map-side combine")
      assert(!p.contains("Window"),
        s"$q elects winners with a window over every gram occurrence")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to all-pairs")
    }
  }

  test("q117/q118: bloom gate filters the gram stream before the exact semi-join") {
    for (q <- Seq("q117_bloom_decontaminate", "q118_contamination_audit")) {
      val p = plan(q)
      assert(p.contains("might_contain"),
        s"$q bloom pre-gate missing — every batch gram would shuffle to the join")
      assert(p.contains("LeftSemi"), s"$q exact confirmation semi-join missing")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("q96: budget fill pre-prunes via the bounded heap; the window is source-partitioned") {
    val p = plan("q96_token_budget_sample")
    // the heap prepass bounds the window's input at `budget` rows per
    // source — the corpus never reaches the sort
    assert(p.contains("partial_topkbyscore"), "heap prepass missing")
    // the one window is PARTITIONED (parallel across sources), never a
    // global single-task rank
    assert(p.contains("windowspecdefinition(source"),
      "cumulative window lost its source partitioning")
  }

  test("q97/q98: cohort retention and lexical diversity stay windowless with partials") {
    for (q <- Seq("q97_retention_cohorts", "q98_lexical_diversity")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q planned a window")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q aggregation lacks a map-side phase")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q99: per-source chunk-dup rollup inherits the digest-keyed shuffles") {
    val p = plan("q99_chunk_dup_by_source")
    assert(!p.contains("hashpartitioning(chunk#"),
      "q99 re-introduced a raw-chunk-text shuffle")
    assert(p.contains("hashpartitioning(ck#"), "digest election key missing")
    assert(!p.contains("Window"))
  }

  test("q54: winnow hot-fingerprint cap is a broadcast anti-join, not an array scan") {
    val p = plan("q54_winnow_oracle")
    // dropHotKeys: hot set broadcasts, sketch rows hash-probe it via
    // LeftAnti — O(1) per row where the old collect_list/array_contains
    // variant linear-scanned the hot array per sketch row
    assert(p.contains("LeftAnti"), "hot-fp cap lost its anti-join shape")
    assert(p.contains("BroadcastHashJoin"), "hot-fp anti-join is not broadcast")
    assert(!p.toLowerCase.contains("array_contains"),
      "q54 still caps hot fingerprints via the array_contains scan")
  }

  test("q101: effective-token rollup joins resolved clusters without a cross product") {
    val p = plan("q101_effective_tokens")
    // canonical map arrives via an equi-join on doc_id; the per-source
    // rollup is one combiner-friendly aggregation — never a window or
    // an all-pairs shape
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q101 cluster join degenerated to all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-source rollup lacks a map-side phase")
    assert(!p.contains("Window"), "q101 planned a window")
  }

  test("q102: temperature mix broadcasts the rates dim; the corpus is never shuffled") {
    val p = plan("q102_temperature_mix")
    // sources-sized rates dim broadcasts onto the one corpus scan; a
    // SortMergeJoin here would shuffle the whole corpus for a 20-row dim
    assert(p.contains("BroadcastHashJoin"), "rates dim join is not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "corpus shuffled to meet the sources-sized rates dim")
    assert(!p.contains("Window"), "q102 planned a window")
  }

  test("q103: normalization-fold dedup is one digest-keyed aggregation — no join, no text shuffle") {
    val p = plan("q103_norm_dedup")
    // the fold rides the scan; every exchange carries digests
    // (norm_hash + the distinct-variant md5), never the text
    assert(!p.contains("hashpartitioning(text#"),
      "q103 shuffles raw document text")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "digest election lacks a map-side phase")
    assert(!p.contains("Join"), "q103 grew a join — it is one aggregation")
    assert(!p.contains("Window"), "q103 planned a window")
  }

  test("q104: epoch plan scans the corpus once; totals ride a 1-row broadcast") {
    val p = plan("q104_epoch_plan")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "sources dim shuffled or degenerated")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "token rollup lacks a map-side phase")
    assert(!p.contains("Window"), "q104 planned a window")
    // explode-free token counting: size(split(..)) is a per-row
    // projection, so no Generate node feeds the rollup
    assert(!p.contains("Generate"), "q104 exploded tokens to count them")
  }

  test("q105: KL terms join on the vocab key; source totals broadcast; text never shuffles") {
    val p = plan("q105_source_kl")
    assert(p.contains("BroadcastHashJoin"),
      "sources-sized totals dim is not broadcast")
    assert(!p.contains("hashpartitioning(text#"),
      "q105 shuffles raw document text")
    assert(!p.contains("Window"), "q105 planned a window")
    assert(!p.contains("CartesianProduct"), "q105 degenerated to all-pairs")
  }

  test("q106: cross-source matrix never degenerates to all-pairs; text stays out of exchanges") {
    val p = plan("q106_cross_source_dup")
    // the candidate stage is q27's df-capped shingle equi-join; the
    // source lookups are id->source equi-joins on the PAIR rows
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q106 degenerated to an all-pairs shape")
    assert(!p.contains("hashpartitioning(text#"),
      "q106 shuffles raw document text")
    assert(!p.contains("Window"), "q106 planned a window")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "matrix rollup lacks a map-side phase")
  }

  test("q107: length histogram is one explode-free aggregation — no join, no window") {
    val p = plan("q107_length_histogram")
    assert(!p.contains("Join"), "q107 grew a join — it is one aggregation")
    assert(!p.contains("Window"), "q107 planned a window")
    // size(split(..)) counts tokens as a per-row projection; the
    // bucket is integer bin-length work — no Generate, no text shuffle
    assert(!p.contains("Generate"), "q107 exploded tokens to count them")
    assert(!p.contains("hashpartitioning(text#"),
      "q107 shuffles raw document text")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "histogram rollup lacks a map-side phase")
  }

  test("q100: dup-gram rate shuffles 8-byte hashes, windowless with partials") {
    val p = plan("q100_ngram_novelty")
    // gram text never materializes: shingleHashes emits the polynomial
    // hash directly, so every exchange (df count, join back, per-doc
    // rollup) carries an 8-byte key, never the 8-gram string
    assert(p.contains("hashpartitioning(h#"),
      "df-count/join not keyed on the gram hash")
    assert(!p.contains("Window"), "q100 planned a window")
    assert(p.contains("partial_count"), "df count lacks map-side combine")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q108: the threshold lattice broadcasts against pairs, never the corpus") {
    val p = plan("q108_dup_threshold_sweep")
    // the only nested-loop join allowed is pairs × the 5-row lattice;
    // the candidate generator's shingle equi-join sits behind
    // jaccardPairs' eager localCheckpoint so it isn't in this plan —
    // its shape is asserted where it IS visible (q27/q84/q106 tests)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "threshold lattice is not a broadcast cross join")
    assert(!p.contains("CartesianProduct"),
      "q108 degenerated to a shuffled cartesian")
    assert(!p.contains("Window"), "q108 planned a window")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "sweep rollup lacks a map-side phase")
  }

  test("q109: zipf slope ranks on the bounded heap — no window, no sort of the vocab") {
    val p = plan("q109_zipf_slope")
    assert(!p.contains("Window"), "q109 planned a window over the vocab")
    assert(p.contains("partial_topkbyscore"),
      "ranking is not the bounded TopKByScore heap with a map-side partial")
    assert(!p.contains("Join"), "q109 grew a join — it is two aggregations")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "term count lacks a map-side phase")
  }

  test("q113: quality cross-tab rides the 8-byte gram hashes, windowless") {
    val p = plan("q113_dup_by_quality")
    assert(p.contains("hashpartitioning(h#"),
      "df-count/join not keyed on the gram hash")
    assert(!p.contains("Window"), "q113 planned a window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "q113 degenerated to all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "cross-tab rollup lacks a map-side phase")
  }

  test("q114: budget sweep windows only the heap-bounded prefix; lattice broadcasts") {
    val p = plan("q114_budget_sweep")
    // exactly one window, and it runs AFTER the bounded top-B heap
    // prepass (partial_topkbyscore), so its input is ≤ maxBudget rows
    // per source — never the source's full row count
    assert("Window".r.findAllIn(p).size <= 2, "q114 grew extra windows")
    assert(p.contains("partial_topkbyscore"), "heap prepass missing")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "budget lattice is not a broadcast cross join")
    assert(!p.contains("CartesianProduct"),
      "q114 degenerated to a shuffled cartesian")
  }

  test("q111: split balance is two combined aggs + a broadcast source-total join") {
    val p = plan("q111_split_balance")
    assert(!p.contains("Window"), "q111 planned a window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "q111 degenerated to all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "balance rollup lacks a map-side phase")
    assert(p.contains("BroadcastHashJoin"),
      "source-total join does not broadcast")
  }

  test("q112: correlation is ONE aggregation over one scan — no join, no window") {
    val p = plan("q112_len_quality_corr")
    assert(!p.contains("Join"), "q112 grew a join — it is one aggregation")
    assert(!p.contains("Window"), "q112 planned a window")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "moment sums lack a map-side phase")
    // exactly one scan (formatted mode lists each node twice — once in
    // the tree, once in the numbered details): the quality proxy and
    // the length come off the same projected row, not two derived frames
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "q112 scans the corpus more than once")
  }

  test("q110: confusion matrix is two combined aggs + one label-size join, no window") {
    val p = plan("q110_langid_confusion")
    assert(!p.contains("Window"), "q110 planned a window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q110 degenerated to all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "confusion rollup lacks a map-side phase")
    // the per-label totals side is |langs| rows: must broadcast
    assert(p.contains("BroadcastHashJoin"),
      "label-total join does not broadcast")
  }

  test("q121/q122: snapshot diff shuffles 16-byte digests, never document text") {
    for (name <- Seq("q121_snapshot_diff", "q122_snapshot_drift")) {
      val p = plan(name)
      // both sides project (doc_id, md5) AT the scan; the full-outer
      // join partitions on doc_id — text must not reach an exchange
      assert(!p.contains("hashpartitioning(text#"),
        s"$name shuffles raw document text")
      assert(p.contains("FullOuter"), s"$name lost the full-outer diff join")
      assert(!p.contains("Window"), s"$name planned a window")
    }
    // the drift report's rollup aggregates with a map-side phase
    assert("HashAggregate".r.findAllIn(plan("q122_snapshot_drift")).size >= 2,
      "q122 rollup lacks a map-side phase")
  }

  test("q123: weighted sample ranks on the bounded heap, not a window") {
    val p = plan("q123_weighted_sample")
    assert(p.contains("ObjectHashAggregate"),
      "q123 lost the bounded top-k aggregate")
    assert(!p.contains("Window"),
      "q123 ranks with a window over every group row")
  }

  test("q125: co-occurrence is a basket equi-join with map-side pair rollup") {
    val p = plan("q125_copurchase_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q125 degenerated to all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair rollup lacks a map-side phase")
    assert(!p.contains("Window"), "q125 planned a window")
  }

  test("q131: anomaly window runs over the calendar-bounded daily series") {
    val p = plan("q131_rate_anomaly")
    // the event-volume aggregation compresses map-side BEFORE the
    // window; the window itself sees (type, day) rows only
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "daily rollup lacks a map-side phase")
    assert(p.contains("Window"), "trailing-window frame missing")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "q131 planned a join — it is aggregation + window only")
  }

  test("q132: linkage is a block equi-join, never a name cross product") {
    val p = plan("q132_record_linkage")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q132 degenerated to all-pairs")
    assert(!p.contains("Window"), "q132 planned a window")
  }

  test("q133: split is a pure projection of the canonical id — no extra shuffle") {
    val p = plan("q133_cluster_split")
    // exactly one corpus-sized join attaches labels; the split CASE
    // must not introduce a window or an additional exchange
    assert(!p.contains("Window"), "q133 planned a window")
  }

  test("q135: calibration joins signatures onto pairs — pair-sized, no window") {
    val p = plan("q135_simhash_calibration")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q135 degenerated to all-pairs")
    assert(!p.contains("Window"), "q135 planned a window")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "bucket rollup lacks a map-side phase")
  }

  test("q136: quota ranks on the bounded heap, not a per-group window") {
    val p = plan("q136_event_quota")
    assert(p.contains("ObjectHashAggregate"),
      "q136 lost the bounded top-k aggregate")
    assert(!p.contains("Window"),
      "q136 ranks with a window over every event row")
  }

  test("q137: readability rides the scan — one rollup, no join, no window") {
    val p = plan("q137_readability")
    assert(!p.contains("Window"), "q137 planned a window")
    assert(!p.contains("Join"), "q137 planned a join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "source rollup lacks a map-side phase")
  }

  test("q138: transition lag partitions by user; totals join is pair-table-sized") {
    val p = plan("q138_event_transitions")
    // the lag window must be partitioned (per-user, behavior-bounded),
    // never a global single-partition sort
    assert(p.contains("Window"), "lag window missing")
    assert(!p.contains("SinglePartition"),
      "q138 planned a partition-less window")
  }

  test("q139: all row-local checks share one aggregation pass over one scan") {
    val p = plan("q139_data_validation")
    assert(!p.contains("Window"), "q139 planned a window")
    // three scans total (check pass, FK probe, orders keys) — the
    // seven checks must not each rescan the table. The tree line
    // renders as "Scan parquet  (n)"; the details section repeats the
    // node as "(n) Scan parquet", which the pattern excludes.
    val scans = "Scan parquet\\s*\\(".r.findAllIn(p).size
    assert(scans <= 3, s"q139 scans the inputs $scans times")
    assert(p.contains("LeftAnti"), "FK orphan check lost the anti join")
  }

  test("q140: hopping windows are one aggregation — no join, no window function") {
    val p = plan("q140_hopping_counts")
    assert(!p.contains("Window"), "q140 planned a window function")
    assert(!p.contains("Join"), "q140 planned a join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "hop rollup lacks a map-side phase")
  }

  test("q141: EWMA folds per key — no iteration, no window, one rollup + one collect") {
    val p = plan("q141_ewma_trend")
    assert(!p.contains("Window"), "q141 planned a window function")
    assert(!p.contains("Join"), "q141 planned a join")
    // daily rollup (partial+final) then the per-key series collect
    assert("HashAggregate".r.findAllIn(p).size >= 2 ||
      p.contains("ObjectHashAggregate"),
      "q141 lost the two-aggregation shape")
  }

  test("q143: pipeline v4 composes without a cross product or ranking window") {
    val p = plan("q143_corpus_pipeline_v4")
    assert(!p.contains("CartesianProduct"),
      "q143 degenerated to a cross product")
    assert(!p.contains("Window"), "q143 planned a ranking window")
    assert(p.contains("ObjectHashAggregate"),
      "winner election lost the bounded-heap aggregate")
  }

  test("q144: MAD rides the collected series — no join, no window function") {
    val p = plan("q144_mad_anomaly")
    assert(!p.contains("Window"), "q144 planned a window function")
    assert(!p.contains("Join"), "q144 planned a join")
  }

  test("q145: churn never degenerates to a cross product or ranking window") {
    val p = plan("q145_threshold_churn")
    assert(!p.contains("CartesianProduct"), "q145 planned a cross product")
    assert(!p.contains("Window"), "q145 planned a ranking window")
  }

  test("q146: embedding audit is one scan + one aggregation — no join, no window") {
    val p = plan("q146_embedding_audit")
    assert(!p.contains("Join"), "q146 planned a join")
    assert(!p.contains("Window"), "q146 planned a window function")
  }

  test("q147: hard negatives broadcast the query batch; top-k is the bounded heap") {
    val p = plan("q147_hard_negatives")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "query batch not broadcast — corpus would shuffle")
    assert(!p.contains("Window"), "q147 ranks with a window instead of the heap")
    assert(p.contains("ObjectHashAggregate"), "bounded top-k heap lost its hash aggregate")
  }

  test("q148: packing report never shuffles text and never degenerates to a window over rows") {
    val p = plan("q148_packing_efficiency")
    assert(!p.contains("CartesianProduct"), "q148 planned a cross product")
    // the prefix sum is the two-pass subtotal design, not a global window
    assert(!p.contains("Window"), "q148 planned a running window over the corpus")
  }

  test("q149: sentence text never crosses an exchange — digests do") {
    val p = plan("q149_sentence_dedup")
    assert(!p.contains("Join"), "q149 planned a join")
    assert(!p.contains("Window"), "q149 planned a window")
    // the first (pre-shuffle) aggregate keys on the md5 digest, not the
    // sentence string: every Exchange's hashpartitioning must mention d
    // or source, never sent
    val exchanges = p.split("\n").filter(_.contains("hashpartitioning"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("sent")),
      s"sentence text used as a shuffle key:\n${exchanges.mkString("\n")}")
  }

  test("q150: coverage thresholds join via broadcast; no ranking window over the vocab") {
    val p = plan("q150_vocab_coverage")
    assert(!p.contains("Window"), "q150 planned a window — the prefix sums must be the two-pass design")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "threshold/total tables must broadcast")
    assert(!p.contains("CartesianProduct"), "q150 planned a non-broadcast cross product")
  }

  test("q151: lineage keys exchanges on the 16-byte digest, never the text") {
    val p = plan("q151_dedup_lineage")
    val exchanges = p.split("\n").filter(_.contains("hashpartitioning"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"document text used as a shuffle key:\n${exchanges.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), "q151 planned a cross product")
  }

  test("q152: sentence scoring projects before any exchange — no join, no window") {
    val p = plan("q152_mixed_domain")
    assert(!p.contains("Join"), "q152 planned a join")
    assert(!p.contains("Window"), "q152 planned a window")
    val exchanges = p.split("\n").filter(_.contains("hashpartitioning"))
    assert(!exchanges.exists(_.contains("sent")),
      s"sentence text used as a shuffle key:\n${exchanges.mkString("\n")}")
  }

  test("q155: semantic dup matrix never plans a cross product; vectors stay off the dedup shuffle") {
    val p = plan("q155_semantic_dup_matrix")
    assert(!p.contains("CartesianProduct"), "q155 planned a cross product")
    // the bare-id candidate dedup must not carry qv payloads
    val exchanges = p.split("\n").filter(_.contains("hashpartitioning"))
    assert(exchanges.nonEmpty)
  }

  test("q158: winners broadcast back; no ranking window (top-k ran eagerly at the pin)") {
    val p = plan("q158_top_boilerplate")
    // the counts frame is localCheckpointed (so the corpus pass runs
    // once for its two consumers): the TakeOrderedAndProject executed
    // eagerly inside the pin and the registry plan starts from the
    // 20-row ExistingRDD — assert the eager fragment's shape directly
    assert(p.contains("Scan ExistingRDD"), "pinned winner list missing")
    assert(p.contains("BroadcastHashJoin"), "winner fetch-back must broadcast")
    assert(!p.contains("Window"), "q158 ranks with a window")
    val eager = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), "[.!?]+")).as("s0"))
      .select(md5(trim(col("s0"))).as("d"))
      .groupBy("d").agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("d").asc).limit(20)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(eager.contains("TakeOrderedAndProject"),
      "the winner election must plan as per-partition heaps")
  }

  test("q159: gini windows only the histogram — user-level rows never rank") {
    val p = plan("q159_activity_gini")
    assert(!p.contains("Join"), "q159 planned a join")
    // the window's input must be the (event_type, c) HISTOGRAM: its
    // partition spec orders by the count column c, and the plan carries
    // the two pre-window aggregations (user counts, then count-of-counts)
    assert(p.contains("Window"), "histogram prefix sum missing")
    assert(p.split("HashAggregate").length > 4,
      "expected user-count + histogram aggregations below the window")
    // the Window node's own detail block must consume histogram columns
    // (event_type, c, m), never user_id
    val winBlock = raw"\(\d+\) Window\n((?:.+\n)*)".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(winBlock.nonEmpty, "window detail block not found")
    assert(!winBlock.contains("user_id"),
      s"window runs over user-level rows:\n$winBlock")
  }

  test("q167: pipeline v5 never degenerates to a cross product; fill window is per-source") {
    val p = plan("q167_corpus_pipeline_v5")
    assert(!p.contains("CartesianProduct"), "q167 planned a cross product")
    // exactly one Window (the per-source budget fill over the heap-capped
    // prefix); the curriculum rank is the prefix-sum, not a second window
    val wins = p.split("\n").count(_.trim.startsWith("Window"))
    assert(wins <= 1, s"q167 planned $wins windows — the rank must stay windowless")
  }

  test("q168: prefix join verifies on arrays, never a cross product; prefix slice guards the generator") {
    val p = plan("q168_prefix_filter_join")
    // the candidate subtree ran eagerly at the localCheckpoint pin, so
    // the visible plan is the verify phase: exact array intersect, no
    // non-equi join anywhere
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q168 degenerated to a non-equi join")
    assert(p.contains("array_intersect"), "verify lost the exact intersect")
    // the slice IS the generator: assert it on the OPERATOR'S OWN
    // un-pinned candidate construction (prefixCandidatePairs is the
    // exact method prefixFilterJaccardPairs checkpoints), so a
    // regression in the operator fails here — no rebuilt copy to drift
    val sh = graft.operators.Dedup.shingleProjection(
      graft.sources.Tables.load(spark, sf, "documents"), "text", "doc_id")
    val cand = graft.operators.Dedup.prefixCandidatePairs(sh, threshold = 0.5)
    val cp = cand.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(cp.contains("slice(") && !cp.contains("CartesianProduct"), cp.take(800))
  }

  test("q169: every SCD2 window is key-partitioned — no global sort") {
    val p = plan("q169_scd2_history")
    val specs = p.split("windowspecdefinition\\(").drop(1)
    assert(specs.nonEmpty, "no window in the SCD2 plan?")
    specs.foreach(s => assert(s.startsWith("user_id"),
      s"window not partitioned by user_id: ${s.take(60)}"))
  }

  test("q170: the range join runs as a hash equi-join, not a nested loop") {
    val p = plan("q170_range_join_windows")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "binned range join degenerated to a nested loop — the bare-BETWEEN plan")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "no hash join on the bin id")
  }

  test("q171: query terms broadcast into postings; fusion windows are per-query") {
    val p = plan("q171_rrf_hybrid")
    assert(p.contains("BroadcastHashJoin"),
      "query-term table must broadcast — the corpus may not shuffle for 10 queries")
    val specs = p.split("windowspecdefinition\\(").drop(1)
    specs.foreach(s => assert(s.startsWith("query_id"),
      s"fusion window not per-query: ${s.take(60)}"))
  }

  test("q172: quantile normalization is windowless on the corpus") {
    val p = plan("q172_quantile_norm")
    assert(!p.contains("windowspecdefinition"),
      "percentiles must come from the histogram join, not a per-source window")
    assert(!p.contains("CartesianProduct"), "q172 planned a cross product")
  }

  test("q204: the sliding-window fan-out broadcasts the 7-offset spine, never a cartesian") {
    val p = plan("q204_stickiness")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 7-row offset spine must broadcast into the (user, day) grain")
    assert(!p.contains("CartesianProduct"), "q204 planned a shuffled cartesian")
  }

  test("q199/q206: triangle enumeration never plans a cartesian or a global window") {
    Seq("q199_triangle_count", "q206_clustering_coeff").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n planned a cross product")
      assert(!p.contains("windowspecdefinition"),
        s"$n ranks with a window — the wedge join must stay a keyed equi-join")
    }
  }

  test("q202: PRF pass 2 broadcasts the feedback-doc and query-term tables") {
    val p = plan("q202_prf_expansion")
    // the 25-row feedback list joins the documents scan broadcast, and
    // the query terms anti-join broadcast — the corpus never shuffles
    // for pass 2's candidate build
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val specs = p.split("windowspecdefinition\\(").drop(1)
    specs.foreach(s => assert(s.startsWith("query_id"),
      s"expansion ranking window not per-query: ${s.take(60)}"))
  }

  test("q196/q197: series windows partition by event_type, never global") {
    // q196's ranking window executes inside the eager checkpoint pin, so
    // the final plan may show none; whatever windows DO appear in either
    // plan must be event_type-keyed, and neither may plan a cartesian
    val specs = Seq("q196_acf_daily", "q197_cusum_changepoint").flatMap { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n planned a cross product")
      p.split("windowspecdefinition\\(").drop(1).map(n -> _)
    }
    assert(specs.nonEmpty, "expected at least one keyed window across the pair")
    specs.foreach { case (n, s) => assert(s.startsWith("event_type"),
      s"$n window not event_type-partitioned: ${s.take(60)}") }
  }

  test("q196: the lag self-join stays a hash EQUI-join on (event_type, rn+lag)") {
    // the pattern sub-day-grain series will copy (ARCHITECTURE: the
    // 7-way spine fan-out then ONE self-join) — the join must plan as a
    // broadcast/shuffled HASH join keyed on the series id, never a
    // nested-loop or range join, or the fan-out goes quadratic when the
    // series outgrows day grain
    val p = plan("q196_acf_daily")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"),
      "lag pairing lost its hash equi-join: " + p.take(1500))
    // the hash-join keys are (event_type, rn_b) — the series id leads,
    // so a sub-day-grain series shuffles/probes per series, never globally
    val keys = p.linesIterator.dropWhile(!_.startsWith("Left keys"))
      .take(2).mkString(" ")
    assert(keys.contains("event_type") && keys.contains("rn_b"),
      s"equi-join keys lost the series id: $keys")
    // the ONLY nested-loop join allowed is the 7-row lag-spine
    // broadcast (Cross with a single-column lag_k build side); the
    // rk-vs-rk pairing must never degenerate to one
    // count node DETAIL headers — formatted explain prints every node
    // once in the tree and once in the details section
    val bnlj = "(?m)^\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"$bnlj nested-loop joins planned")
    if (bnlj == 1) assert(p.contains("Input [1]: [lag_k#"),
      "the nested-loop join is not the 1-column lag spine broadcast")
  }

  test("q134: canonical selection is an arg-max aggregate, not a per-cluster sort") {
    val p = plan("q134_quality_canonical")
    assert(!p.contains("Window"), "q134 ranks with a window")
    // max_by plans as ObjectHashAggregate (hash-based partial+final);
    // max(struct) would fall back to SortAggregate's per-partition sort
    assert(p.contains("ObjectHashAggregate"),
      "arg-max lost the hash-based aggregate")
    assert(!p.contains("SortAggregate"),
      "q134 fell back to a sort-based aggregate")
  }

  test("q216-q218: attribution joins stay hash equi-joins on user_id; windows key on the conversion") {
    for (n <- Seq("q216_attribution_last_touch", "q217_attribution_linear",
        "q218_attribution_time_decay")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n planned a cross product")
      // the 7-day range predicate must ride a HASH join as a residual,
      // never demote the join to a nested loop over users
      assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
        || p.contains("SortMergeJoin"), s"$n lost its hash equi-join")
      // only q216's total-row broadcast may plan a nested loop (1-row)
      val bnlj = "(?m)^\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnlj <= 1, s"$n planned $bnlj nested-loop joins")
      // any window must partition by the conversion id, never globally
      p.split("windowspecdefinition\\(").drop(1).foreach(s =>
        assert(s.startsWith("conv_id"),
          s"$n window not conv_id-partitioned: ${s.take(50)}"))
    }
  }

  test("q219/q220: eval windows partition by query term; the 5-term set broadcasts") {
    for (n <- Seq("q219_retrieval_ndcg", "q220_retrieval_mrr")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n planned a cross product")
      assert(p.contains("BroadcastHashJoin"),
        s"$n lost the broadcast of the 5-term query set")
      val specs = p.split("windowspecdefinition\\(").drop(1)
      assert(specs.nonEmpty, s"$n lost its ranking windows")
      specs.foreach(s => assert(s.startsWith("term"),
        s"$n window not term-partitioned: ${s.take(50)}"))
    }
  }

  test("q222: rank runs at value grain via the prefix sum — no window at all") {
    val p = plan("q222_mann_whitney")
    assert(!p.contains("CartesianProduct"), "q222 planned a cross product")
    assert(!p.contains("Window"),
      "q222 reacquired a window — ranks must ride the value-grain prefix sum")
    // exactly one 1-row broadcast cross (the global tie/total row)
    val bnlj = "(?m)^\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q222 planned $bnlj nested-loop joins")
    // the value-grid join back onto (source, x) counts is a hash join
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"), "r2 grid join lost its hash form")
  }

  test("q223: Welch plans two aggregates and a 1-row broadcast — no window, no shuffle join") {
    val p = plan("q223_welch_t")
    assert(!p.contains("Window"), "q223 acquired a window")
    assert(!p.contains("CartesianProduct"), "q223 planned a cross product")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "moment sums lost their partial phase")
  }

  test("q225: candidates broadcast back as a LEFT-SEMI before the only exchange") {
    val p = plan("q225_frequent_terms")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "candidate recount lost its broadcast semi-join: " + p.take(1500))
    assert(!p.contains("CartesianProduct"), "q225 planned a cross product")
  }

  test("distribution wave (q230-q247): window-free, no cartesian") {
    // the wave's design rule: prefix sums ride the range-partitioned
    // two-phase pass (q231), series pairing rides calendar-bounded
    // broadcasts (q232), everything else is grouped aggregation — a
    // Window or CartesianProduct appearing anywhere is a regression
    Seq("q230_market_hhi", "q231_ks_test", "q232_kendall_tau",
      "q233_event_entropy", "q234_vocab_jsd", "q237_cohort_retention",
      "q240_lead_lag", "q241_theil_index", "q242_fano_factor",
      "q243_seasonal_adjusted", "q244_set_completion",
      "q245_mixture_weights", "q246_mann_kendall", "q247_sen_slope")
      .foreach { n =>
        val p = plan(n)
        assert(!p.contains("CartesianProduct"), s"$n planned a cross product")
        assert(!p.contains(" Window"), s"$n planned a window")
        assert("HashAggregate".r.findAllIn(p).size >= 2,
          s"$n lost its partial aggregation phase")
      }
  }

  test("q232: the day-pair join is the calendar-bounded broadcast, nothing bigger") {
    // the non-equi (day_a < day_b) pairing is inherent to Kendall; it
    // must plan as a BROADCAST nested loop over the day-grain aggregate
    // (|days|² is a constant of the calendar), never a shuffled
    // cartesian over event rows
    val p = plan("q232_kendall_tau")
    // the INNER join is the day pairing (the other BNLJ is the final
    // 1-row totals cross); the tree prints root-first, so its children
    // — the two day-grain HashAggregate chains — appear BELOW it
    val joinIdx = p.indexOf("BroadcastNestedLoopJoin Inner")
    assert(joinIdx >= 0, "day pairing lost its broadcast: " + p.take(1500))
    assert(p.substring(joinIdx).contains("HashAggregate"),
      "the pair join's inputs are not day-grain aggregates")
  }

  test("q187: the prefix sum plans as the native RunningSumExec over one range exchange") {
    // the custom operator tier: the planner must own the range
    // exchange (EnsureRequirements inserts it from RunningSumExec's
    // required distribution) — no ExistingRDD boundary, no Window.
    // (q222 also rides the operator but pins its output with an eager
    // localCheckpoint, so ITS final plan shows the checkpoint scan —
    // the operator ran inside it.)
    val p = plan("q187_cumulative_users")
    // the exec node prints as "RunningSum" (nodeName strips Exec)
    assert("(?m)^\\(\\d+\\) RunningSum\\b".r.findFirstIn(p).isDefined,
      "q187 lost the native running-sum operator: " + p.take(1200))
    assert(!p.contains(" Window"), "q187 fell back to a window")
    assert(p.toLowerCase.contains("rangepartitioning"),
      "the running sum lost its range exchange")
    assert(!p.contains("Scan ExistingRDD"),
      "q187 still crosses an RDD boundary")
    // r10 task 3: the node implements CodegenSupport — its per-row work
    // (evaluate, addExact, emit) must compile INTO the whole-stage
    // pipeline, not run as an interpreted eval + UnsafeProjection loop.
    // AQE collapses codegen stages only at materialization, so execute
    // first, then assert the FINAL plan's "*(k)" codegen marker on the
    // RunningSum line (pipelined with the Sort feeding it).
    val df = graft.queries.Registry.byName("q187_cumulative_users")
      .fn(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) RunningSum\\b".r.findFirstIn(finalPlan).isDefined,
      "RunningSumExec dropped out of whole-stage codegen:\n" +
        finalPlan.take(1200))
  }

  test("q16/q231/q248: every rank/prefix consumer plans the native operator, no RDD boundary") {
    // r11: globalRowNumber (zipWithIndex RDD drop) and
    // globalRunningSums (multi-column RDD drop) both route through the
    // native RunningSum node now — no consumer may cross a
    // Scan ExistingRDD boundary or fall back to a Window
    // (q255 also rides the operator but pins its 11-row rank frame with
    // an eager localCheckpoint, so ITS final plan shows the checkpoint
    // scan — the operator ran inside it, the q222 situation)
    Seq("q16_zip_join", "q231_ks_test", "q248_heaps_law",
      "q249_vocab_coverage").foreach { n =>
      val p = plan(n)
      assert("(?m)^\\(\\d+\\) RunningSum\\b".r.findFirstIn(p).isDefined,
        s"$n lost the native running-sum operator")
      assert(!p.contains("Scan ExistingRDD"),
        s"$n still crosses an RDD boundary")
    }
    // the fused multi-column form: q248 sums TWO columns through ONE
    // RunningSum node (one range exchange), not one node per column
    val p248 = plan("q248_heaps_law")
    assert("(?m)^\\(\\d+\\) RunningSum\\b".r.findAllIn(p248).size == 1,
      "q248's two prefix columns no longer fuse into one pass")
    assert("(?m)rangepartitioning".r.findAllIn(p248.toLowerCase).size >= 1,
      "q248 lost its range exchange")
  }

  test("q235/q236: fuzzy matching is block-joined on the noun key") {
    // the matcher expressions are quadratic in NAME length, so the
    // candidate generator must be a hash EQUI-join on the blocking key
    // (same noun), never an all-pairs nested loop over names
    Seq("q235_typo_pairs", "q236_fuzzy_scores").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
        || p.contains("SortMergeJoin"),
        s"$n lost its blocking equi-join: " + p.take(1500))
      assert(!p.contains("BroadcastNestedLoopJoin")
        && !p.contains("CartesianProduct"),
        s"$n planned an all-pairs join")
      // the matcher evaluates inside whole-stage codegen, not a UDF
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$n matcher fell out of codegen")
    }
  }

  test("q270: role-playing nation dim broadcasts twice; no cartesian anywhere") {
    val p = plan("q270_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "dimension joins lost their broadcasts: " + p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "a star edge degenerated to an unkeyed join")
  }

  test("q264/q269: sampling table rides the native RunningSum; draws broadcast-probe it") {
    val p264 = plan("q264_negative_sampling")
    assert("(?m)^\\(\\d+\\) RunningSum\\b".r.findAllIn(p264).nonEmpty,
      "q264's cumulative ranges left the native operator: " + p264.take(1500))
    assert(!p264.contains("Window"), "a window crept into the sampling table")
    // the draw probe is a broadcast interval join against the kilobyte
    // table — a nested-loop ONLY because the predicate is a range;
    // the corpus-scan side must never shuffle for it
    val p269 = plan("q269_multinomial_draws")
    assert(p269.contains("BroadcastNestedLoopJoin"),
      "q269's interval probe lost its broadcast: " + p269.take(1500))
    assert(!p269.contains("CartesianProduct"), "q269 degenerated to a cartesian")
  }

  test("q259/q260: KMV sketches aggregate with a map-side partial, no pre-distinct") {
    // the whole point of the sketch pass: ≤k longs per (partition, group)
    // ship to the exchange — a partial ObjectHashAggregate phase — and
    // the sketch branch never pays a distinct exchange of raw hashes
    // (the exact twin's count_distinct is the only Expand/distinct)
    Seq("q259_kmv_distinct", "q260_kmv_jaccard").foreach { n =>
      val p = plan(n)
      assert(p.contains("ObjectHashAggregate"), s"$n: " + p.take(1500))
      assert(p.contains("partial_kmvmins"),
        s"$n: KmvMins aggregate lost its partial phase")
      assert(!p.contains("Window"), s"$n: a window crept into the sketch path")
    }
    // q260's pair matrix is a broadcast self-join of the 37-row sketch
    // table — the corpus is never shuffled for the estimate side
    assert(plan("q260_kmv_jaccard").contains("BroadcastNestedLoopJoin") ||
      plan("q260_kmv_jaccard").contains("BroadcastHashJoin"),
      "q260 pair matrix no longer broadcasts the kilobyte sketch table")
  }

  test("q313/q315: the new cumulative consumers ride the native RunningSum") {
    // r13: the Q-Q global cumulative and the Pareto revenue cumulative
    // both route through the operator — a regression to a global
    // window here is the exact single-partition funnel the ban test
    // exists for
    Seq("q313_qq_deciles", "q315_abc_classes").foreach { n =>
      val p = plan(n)
      assert("(?m)^\\(\\d+\\) RunningSum\\b".r.findFirstIn(p).isDefined,
        s"$n lost the native running-sum operator: " + p.take(1200))
      assert(!p.contains("CartesianProduct"),
        s"$n grew a cartesian product")
    }
  }

  test("q308: the trend pair join is a histogram-grain equi-join, never a cross product") {
    // the (priority x day) grids join on the day value with the
    // priority inequality as a post-filter — row-grain data never
    // meets itself
    val p = plan("q308_jonckheere_trend")
    assert(!p.contains("CartesianProduct"), "q308 planned a cartesian:\n"
      + p.take(1200))
    assert(p.contains("BroadcastExchange"),
      "q308 lost its broadcast dimensions")
  }

  test("r14 wave: q324/q326/q327 cumulatives ride the native RunningSum") {
    // the CvM pooled CDFs, the Mood grand median, and the weighted-
    // kappa quintile thresholds all route their global cumulative
    // through the operator — a regression to a global window here is
    // the single-partition funnel the ban test exists for
    Seq("q324_cramer_von_mises", "q326_mood_median", "q330_kuiper_test",
        "q332_ansari_bradley").foreach { n =>
      val p = plan(n)
      assert("(?m)^\\(\\d+\\) RunningSum\\b".r.findFirstIn(p).isDefined,
        s"$n lost the native running-sum operator: " + p.take(1200))
      assert(!p.contains("CartesianProduct"),
        s"$n grew a cartesian product")
    }
    // q327's and q333's RunningSums run INSIDE eager pins (the 25-row
    // oij grid / the grid-sized sv moment frame), so their final lazy
    // plans start at a LogicalRDD; both share the exact machinery
    // asserted above, so here only the no-cartesian invariant is
    // checkable on the final plan
    Seq("q327_weighted_kappa", "q333_quade_test").foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n grew a cartesian product")
    }
  }

  test("q325: the Croston fold plans with no window at all") {
    // the q316 discipline: state rides the per-type aggregate fold
    // over the sorted day array — zero Window nodes in the optimized
    // plan (the day aggregate itself is a grouped count, not a rank)
    val df = Registry.byName("q325_croston").fn(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.isEmpty, s"q325 grew ${wins.size} window node(s)")
  }

  test("q316: the Holt-Winters fold plans with no window at all") {
    // state rides the per-type aggregate fold over the sorted day
    // array (calendar-bounded), so the optimized plan must carry ZERO
    // Window nodes — the recurrence never touches row-grain windows
    val df = Registry.byName("q316_holt_winters").fn(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.isEmpty, s"q316 grew ${wins.size} window node(s)")
  }
}
