package graft

import java.nio.file.Files

/** Runs the streaming-throughput harness small: the point is not the
  * rate (meaningless at this size) but the row accounting — every fed
  * row lands in the store exactly once, warmup excluded.
  */
class StreamBenchSpec extends SparkSpec {

  test("stream micro-bench: every measured row lands exactly once in the store") {
    val dir = Files.createTempDirectory("sbspec").toFile.getAbsolutePath
    val r = StreamBench.run(spark, batchRows = 400, batches = 3, keys = 8, dir)
    assert(r.totalRows === 1200L)
    assert(r.storedRows === 1200L, "sink lost or duplicated rows")
    assert(r.rowsPerSec > 0.0)
    // the store carries real deltas: per-key totals were strictly
    // increasing, so every measured row's confirmed delta is positive
    val neg = spark.read.parquet(s"$dir/store")
      .filter("delta.deltaConfirmed <= 0").count()
    assert(neg === 0L, s"$neg rows with non-positive delta — degenerate feed")
  }

  test("incdedup micro-bench: exactly the 7-in-10 novel rows land, once each") {
    val dir = Files.createTempDirectory("sbspec-dd").toFile.getAbsolutePath
    val r = StreamBench.runDedup(spark, batchRows = 400, batches = 3, dir)
    assert(r.totalRows === 1200L)
    // decade structure: 3 copy rows + 1 original collapse to 1 novel,
    // 6 unique rows stay — 7 novel per 10 fed
    assert(r.storedRows === 840L,
      s"expected 840 novel rows (0.7 x 1200), got ${r.storedRows}")
    assert(r.rowsPerSec > 0.0)
    // and the sink holds no duplicate texts — the store really gated
    val dupTexts = spark.read.parquet(s"$dir/novel")
      .groupBy("text").count().filter("count > 1").count()
    assert(dupTexts === 0L, s"$dupTexts duplicate texts escaped the dedup")
  }

  test("incchunkdedup micro-bench: exactly the 7-in-10 distinct chunks stored, once each") {
    val dir = Files.createTempDirectory("sbspec-cd").toFile.getAbsolutePath
    // runChunkDedup REQUIRE-asserts the global accounting internally
    // (stored digests == 0.7 x fed chunks == Σ kept, Σ total == 5 x
    // docs, warmup included); this drives it small and checks the
    // measured-batch numbers surfaced in the Result
    val r = StreamBench.runChunkDedup(spark, batchRows = 400, batches = 3, dir)
    assert(r.totalRows === 1200L)
    // measured batches feed 1200 docs x 5 chunks, decade structure at
    // chunk grain: 7 of every 10 fed chunks are distinct and admitted
    assert(r.storedRows === 4200L,
      s"expected 4200 kept chunks (0.7 x 6000), got ${r.storedRows}")
    assert(r.rowsPerSec > 0.0)
    // reassembly really dropped the copy-group chunks: every output
    // doc keeps <= its 5 chunks and the corpus-wide kept ratio is 7/10
    val bad = spark.read.parquet(s"$dir/deduped")
      .filter("kept_chunks > total_chunks OR total_chunks <> 5").count()
    assert(bad === 0L, s"$bad docs with impossible chunk counts")
  }

  test("incscd micro-bench: closed+open runs equal the batch rebuild exactly") {
    val dir = Files.createTempDirectory("sbspec-scd").toFile.getAbsolutePath
    // runScd REQUIRE-asserts the duality internally (closed set ==
    // rebuild's closed set, store open runs == rebuild's current rows,
    // closed count == events - keys); this drives it small and checks
    // the surfaced numbers
    val r = StreamBench.runScd(spark, batchRows = 400, batches = 3, dir)
    assert(r.totalRows === 1200L)
    assert(r.keys === 40)
    // 40 keys x (1 warmup + 30 measured changes) = 1240 events, all
    // real transitions; every event but each key's last closes a run
    assert(r.storedRows === 1200L,
      s"expected 1200 closed intervals (1240 - 40 open), got ${r.storedRows}")
    assert(r.rowsPerSec > 0.0)
  }

  test("incneardedup micro-bench: exactly the 7-in-10 novel rows land, once each") {
    val dir = Files.createTempDirectory("sbspec-nd").toFile.getAbsolutePath
    val r = StreamBench.runNearDedup(spark, batchRows = 400, batches = 3, dir)
    assert(r.totalRows === 1200L)
    // same decade structure as the exact harness: identical-copy groups
    // collide in every band, so the LSH+verify path detects them with
    // probability 1 and the accounting is exact
    assert(r.storedRows === 840L,
      s"expected 840 novel rows (0.7 x 1200), got ${r.storedRows}")
    assert(r.rowsPerSec > 0.0)
    val dupTexts = spark.read.parquet(s"$dir/novel")
      .groupBy("text").count().filter("count > 1").count()
    assert(dupTexts === 0L, s"$dupTexts duplicate texts escaped the near-dedup")
  }

  test("incembdedup micro-bench: exactly the 7-in-10 novel vectors land, once each") {
    val dir = Files.createTempDirectory("sbspec-emb").toFile.getAbsolutePath
    val r = StreamBench.runEmbeddingNearDedup(spark, batchRows = 400,
      batches = 3, dir)
    assert(r.totalRows === 1200L)
    // exact-copy decades: identical vectors collide in every sign-LSH
    // band and the integer-cosine verify confirms them with
    // probability 1, so the accounting is exact; distinct splitmix64
    // vectors sit at |cos| ~ 1/8, nowhere near the 0.95 threshold
    assert(r.storedRows === 840L,
      s"expected 840 novel rows (0.7 x 1200), got ${r.storedRows}")
    assert(r.rowsPerSec > 0.0)
    val dupIds = spark.read.parquet(s"$dir/novel")
      .groupBy("doc_id").count().filter("count > 1").count()
    assert(dupIds === 0L, s"$dupIds duplicate ids escaped the near-dedup")
  }

  test("entropy micro-bench: final per-day counts equal the fed deltas exactly") {
    // runEntropy REQUIRE-asserts the accounting internally (summed
    // final per-day n == total fed count incl. warmup); this drives it
    // small and checks the surfaced numbers
    val r = StreamBench.runEntropy(spark, batchRows = 400, batches = 3)
    assert(r.totalRows === 1200L)
    assert(r.keys === 365)
    assert(r.rowsPerSec > 0.0)
  }

  test("kmv micro-bench: streaming sketch bit-identical to batch aggregate") {
    // runKmv REQUIRE-asserts the duality internally (final per-key
    // (n_sk, h_k) == batch KmvMins over everything fed, incl. the
    // warmup and any replay); this drives it small enough to saturate
    // some sketches (3*500/37 ≈ 40 < 256 stays unsaturated; the
    // duality holds either way)
    val r = StreamBench.runKmv(spark, batchRows = 500, batches = 3)
    assert(r.totalRows === 1500L)
    assert(r.keys === 37)
    assert(r.rowsPerSec > 0.0)
  }

  test("heavy-hitters micro-bench: MG bounds hold and true hitters survive") {
    // runHeavyHitters REQUIRE-asserts per emitted key est <= true <=
    // est + maxErr against exact recounts, and that each window's 3
    // hottest true keys appear in the emitted top-k
    val r = StreamBench.runHeavyHitters(spark, batchRows = 2000, batches = 2)
    assert(r.totalRows === 4000L)
    assert(r.rowsPerSec > 0.0)
  }
}
