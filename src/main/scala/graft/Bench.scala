package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR
  * and emits ONE JSON line for the driver (BENCH_r{N}.json).
  *
  * Output contract: stdout carries the full result JSON line, then a
  * COMPACT summary line printed LAST — the driver archives a bounded
  * 2000-char tail of the output, and the ~8 KB per-query line
  * truncates from the left inside that window (BENCH_r07.json lost its
  * leading `"total"`), while the trailing compact line always survives
  * whole and parses. Since r9 the compact line is SELF-CONTAINED (the
  * r8 verdict's task 3): it carries the COMPLETE per-query data,
  * encoded to fit the tail window, degrading through a unit ladder as
  * the registry grows instead of truncating. Full-precision full-name
  * results and error messages stay in the first line and
  * bench_out.json. All progress goes to stderr.
  *
  * SELF-ADJUDICATION (r10 verdict, task 2): a median-of-3 is provably
  * poisonable by a 2-of-3-slow contention window — exactly what
  * inflated BENCH_r10's q28/q29/q49/q134/q180, each exonerated only by
  * a judge re-running them isolated. Two additions make the record
  * prove that about itself:
  *
  *  - every query reports its MIN across the repeats alongside the
  *    median — a contention-robust floor (a spike whose min sits in
  *    its historical band is box noise, not a regression, with no
  *    re-run needed);
  *  - the q27 control ([[ControlQuery]], datum ~1.9 s at sf0.1 since
  *    r5) runs FIRST and LAST, both readings embedded in the JSON —
  *    a record whose control readings sit at datum was taken on a
  *    quiet box; elevated readings timestamp the contention;
  *  - (r12, the r11 verdict's task 3) every query records its
  *    START-OFFSET from run start, so a cluster of slow queries at one
  *    timeline region self-identifies as a contention window without a
  *    judge re-run — the control bracket sees only the run's ENDS.
  *    Full-precision seconds live in the first line / bench_out.json
  *    (`offsets` map); the compact trailer carries `qoffm`, ONE
  *    base-36 char per query (minutes since run start, 'z' = ≥35 min,
  *    registry-name order — the same order as qmed/qmin), because
  *    three full JSON number arrays at 287 queries (~600 chars each)
  *    cannot fit the 1900-char tail budget next to the med+min arrays
  *    (measured: 1501 chars used at r11), while minute-grain timeline
  *    clustering answers the only question offsets exist to answer;
  *  - (r13, the r12 verdict's task 2) the record's one remaining blind
  *    spot was the run TAIL: the LAST query in the name-sorted order
  *    has no downstream neighbors to corroborate a contention window,
  *    so BENCH_r12's q99 (med 18.7 s, min 2.27 s, run's final entry)
  *    was unadjudicable from the record alone. Fix: after the closing
  *    control, any query whose med/min ratio exceeds
  *    [[RerunRatio]] is RE-RUN once (no warmup — the code is JIT-warm
  *    from its own mid-run repeats) and the re-reading lands in the
  *    record — full precision in the first line / bench_out.json
  *    (`reruns` map), deciseconds in the trailer (`qre` map, query
  *    numbers as keys). A spiky query whose re-reading sits back in
  *    class self-exonerates; a re-reading that repeats the spike is a
  *    real regression. The map is capped at [[MaxReruns]] entries
  *    (worst ratios first) so a pathological run cannot blow the tail
  *    budget; an empty run emits `"qre":{}`;
  *  - (r14, the r13 verdict's task 1) the `qre` spike trigger is
  *    provably blind to a SUSTAINED contention window: a multi-minute
  *    slow region inflates the median AND the min together (BENCH_r13's
  *    q219 read 16.95 med / 16.86 min vs 0.60/0.59 judge-isolated —
  *    med/min 1.005, so the 3× trigger never fires), and the
  *    first/last control bracket sees only the run's ENDS. Two
  *    additions close it: (a) a **mid-run control heartbeat** — a
  *    single timed q27 reading every [[HeartbeatEvery]] queries (the
  *    control is JIT-warm from the opening bracket), plus one more
  *    AFTER the rerun pass so the re-readings are followed, not just
  *    preceded, by a control reading — carried full-precision as
  *    `ctrl_hb` [[offset, sec], …] pairs in the first line /
  *    bench_out.json and as a compact centisecond array in every
  *    trailer rung (~10 entries ≈ 60 chars at the current registry),
  *    timestamping a window INSIDE the record; (b) a **band-file
  *    trigger** — the adjudicated per-query min-bands (ARCHITECTURE's
  *    bench-history table, committed as the
  *    `graft/bench_bands.json` classpath resource) extend the
  *    post-control rerun to any query whose MIN exceeds its band
  *    ceiling ≥ [[BandTriggerRatio]]× — exactly the reading shape the
  *    spike trigger cannot see. Both triggers share the [[MaxReruns]]
  *    cap, worst severity first.
  *
  * Each query is driven through a `noop`-format write, not `count()`:
  * count lets Catalyst prune projection-only work (rendering columns,
  * text metrics would never be evaluated), understating real cost.
  * Failures are not swallowed: a failed query reports -1 with its error
  * in an `errors` map and the process exits non-zero.
  */
object Bench {

  /** The control query: small, stable, plan-audited since r5 — its two
    * readings bracket the run and calibrate every other number.
    * DATUM SHIFT (r14 optimization round): q27 rides the shared-shingle
    * self-join that gained the shuffle_hash hint, so its quiet-box
    * datum moved from ~1.9 s to ~1.0-1.3 s at sf0.1. Control readings
    * are only ever compared WITHIN a record (first/last/heartbeats) or
    * against a same-tree datum, so historical records stay
    * interpretable — but do not compare r14+ control centiseconds to
    * pre-optimization rounds without this note. */
  val ControlQuery = "q27_ngram_jaccard"

  /** A query is re-run after the closing control when its median
    * exceeds its min by this ratio — the med≫min shape that is either
    * a contention window (re-reading lands near the min) or a real
    * bimodal regression (re-reading repeats the spike). 3× sits far
    * above this box's ±25% scheduler noise. */
  val RerunRatio = 3.0

  /** Tail-budget bound on the rerun map: worst severities first.
    * 8 entries ≈ 90 trailer chars; a run with more than 8 queries
    * spiking 3× (or departing their bands 2×) is a poisoned record no
    * per-query re-run can save. */
  val MaxReruns = 8

  /** A single q27 control reading is taken after every this-many
    * measured queries (~10 heartbeats at the current registry, ~20 s
    * of a ~25 min run) — a sustained contention window lands ON a
    * heartbeat and is timestamped inside the record, where the
    * first/last bracket sees only the ends. */
  val HeartbeatEvery = 30

  /** A query is re-run after the closing control when its MIN exceeds
    * its adjudicated band ceiling by this ratio — the sustained-window
    * shape (med AND min inflated together) the med/min spike trigger
    * cannot fire on. 2× a box-datum ceiling sits above this box's
    * ±25% scheduler noise and the ~1.5× slow-session drift the
    * control readings calibrate out. */
  val BandTriggerRatio = 2.0

  /** The committed adjudicated min-band file (r13 verdict task 1):
    * {"bands": {name: [floor, ceiling]}} in seconds at sf0.1. */
  val BandsResource = "/graft/bench_bands.json"

  /** Adjudicated [floor, ceiling] min-bands by query name, loaded from
    * [[BandsResource]]. A missing or unparseable resource degrades to
    * an empty map with a loud stderr warning — the band trigger is an
    * adjudication aid, never a reason a bench record fails to exist. */
  def loadBands(): Map[String, (Double, Double)] =
    try {
      val in = getClass.getResourceAsStream(BandsResource)
      if (in == null) {
        System.err.println(s"[bench] WARNING: $BandsResource missing — band trigger disabled")
        Map.empty
      } else
        try {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val bands = om.readTree(in).get("bands")
          val it = bands.properties().iterator()
          val b = Map.newBuilder[String, (Double, Double)]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> (e.getValue.get(0).asDouble, e.getValue.get(1).asDouble)
          }
          b.result()
        } finally in.close()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARNING: $BandsResource unparseable " +
          s"(${e.toString.take(120)}) — band trigger disabled")
        Map.empty
    }

  /** The post-control rerun set (both triggers, r13+r14): every query
    * whose med/min exceeds [[RerunRatio]] (the SPIKE shape) or whose
    * MIN exceeds [[BandTriggerRatio]]× its adjudicated band ceiling
    * (the SUSTAINED-window shape), ordered worst severity first and
    * capped at [[MaxReruns]]. Severity is the trigger ratio normalized
    * to its own threshold, so a 28× band departure (BENCH_r13's q219)
    * outranks a 3.5× spike. Pure — pinned by BenchHygieneSpec. */
  private[graft] def rerunCandidates(
      results: Seq[(String, Double, Double, Double)],
      bands: Map[String, (Double, Double)]): Seq[String] =
    results
      .flatMap { case (name, med, min, _) =>
        if (med <= 0 || min <= 0) None
        else {
          val spike = med / min / RerunRatio
          val band = bands.get(name)
            .map { case (_, ceil) => min / (BandTriggerRatio * ceil) }
            .getOrElse(0.0)
          val severity = math.max(spike, band)
          if (severity > 1.0) Some((name, severity)) else None
        }
      }
      .sortBy { case (n, s) => (-s, n) }
      .take(MaxReruns)
      .map(_._1)

  /** Locale-pinned 2-dp rendering — `f"$v%.2f"` uses the JVM default
    * locale, which on a comma-decimal locale (de_DE) would emit "1,23"
    * and corrupt the JSON record (ADVICE r12). */
  private[graft] def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // Per-query warmup run, then `repeats` measured runs: at these scale
    // factors Catalyst analysis + whole-stage-codegen JIT dominates a
    // cold first execution, and this box's scheduler is noisy (two
    // identical-code r5 runs differed 27% total on min-of-two). The
    // MEDIAN is the headline (round-over-round deltas stay signal); the
    // MIN is the adjudication floor (see the scaladoc above).
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS").map(_.toInt).getOrElse(3)
    require(repeats >= 1, s"SPARK_GRAFT_REPEATS must be >= 1, got $repeats")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // warmup + repeats; returns (median, min). Always releases pinned
    // blocks afterward (eager localCheckpoints etc.) so later queries
    // measure themselves, not accumulated block-manager eviction
    // pressure — the r9 q91 15.29s/0.98s spread was exactly residue.
    def measure(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) =
      try {
        runOnce(fn)
        val ts = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          runOnce(fn)
          (System.nanoTime() - t0) / 1e9
        }
        (median(ts), ts.min)
      } finally GraftSession.releaseCaches(spark)

    // dev-only focus filter (unset for driver runs = all queries)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    var errors = Map.empty[String, String]
    def record(e: Throwable, name: String): Unit =
      errors += name -> e.toString.replaceAll("[\\\\\"\\n\\r]", " ").take(200)

    // control bracket: FIRST reading (the suite's own q27 pass below is
    // mid-run and subject to whatever contention the record disputes)
    val controlFn = SparkEntry.queries.get(ControlQuery)
    def controlReading(tag: String): Option[(Double, Double)] = controlFn.map { fn =>
      System.err.println(s"[bench] control($tag) $ControlQuery")
      try measure(fn)
      catch { case e: Throwable => record(e, s"control_$tag"); (-1.0, -1.0) }
    }
    // run-start datum for the per-query start offsets (task 3, r11
    // verdict): taken BEFORE the first control so the control bracket
    // and every query share one timeline origin
    val runStart = System.nanoTime()
    val ctrlFirst = controlReading("first")

    // mid-run control heartbeat (r13 verdict task 1a): ONE timed q27
    // run — no warmup, the control is JIT-warm from the opening
    // bracket's measure — every HeartbeatEvery queries, plus one after
    // the rerun pass below. A heartbeat failure records -1 and never
    // fails the run (same philosophy as a rerun failure).
    val ctrlHb = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    def heartbeat(tag: String): Unit = controlFn.foreach { fn =>
      val off = (System.nanoTime() - runStart) / 1e9
      System.err.println(s"[bench] heartbeat($tag) $ControlQuery")
      val t =
        try {
          val t0 = System.nanoTime()
          runOnce(fn)
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] WARNING: heartbeat failed: " +
              e.toString.take(200))
            -1.0
        } finally GraftSession.releaseCaches(spark)
      ctrlHb += ((off, t))
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .zipWithIndex
      .map { case ((name, fn), i) =>
        if (i > 0 && i % HeartbeatEvery == 0) heartbeat(s"q$i")
        System.err.println(s"[bench] $name")
        val off = (System.nanoTime() - runStart) / 1e9
        val (med, min) =
          try measure(fn)
          catch { case e: Throwable => record(e, name); (-1.0, -1.0) }
        (name, med, min, off)
      }
    val ctrlLast = controlReading("last")
    val ctrl = (ctrlFirst, ctrlLast) match {
      case (Some((fm, fn0)), Some((lm, ln))) => Some((fm, fn0, lm, ln))
      case _ => None
    }
    // re-reading pass (r12 verdict task 2 + r13 verdict task 1b): one
    // extra timed run for every med≫min SPIKE query and every
    // band-ceiling-departed MIN (the sustained-window shape), AFTER
    // the closing control so each re-reading is PRECEDED by a control
    // reading — and FOLLOWED by the post-rerun heartbeat taken below,
    // which completes the bracket the r13 comment wrongly claimed
    // (ADVICE r13)
    val bands = loadBands()
    val reruns: Seq[(String, Double)] = rerunCandidates(results, bands)
      .map { name =>
        val (_, med, min, _) = results.find(_._1 == name).get
        System.err.println(f"[bench] rerun $name (med $med%.2f / min $min%.2f)")
        // a rerun failure records -1 in the rerun maps but does NOT
        // join the errors map: the query already succeeded warmup + 3
        // repeats mid-run, so a transient crash here must not flip the
        // whole record to rc=1 / n_errors>0 — the -1 re-reading is the
        // loud-enough signal (it means "spiky AND not re-readable",
        // the one case a judge should look at by hand)
        val t =
          try {
            val t0 = System.nanoTime()
            runOnce(SparkEntry.queries(name))
            (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] WARNING: rerun of $name failed: " +
                e.toString.take(200))
              -1.0
          } finally GraftSession.releaseCaches(spark)
        (name, t)
      }
    // the control reading AFTER the rerun pass (ADVICE r13): without
    // it no control follows the re-readings and a late-tail window
    // could inflate them unexamined
    heartbeat("post-rerun")

    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, m, _, _) => k -> m })
    val mins = jmap(results.map { case (k, _, m, _) => k -> m })
    // full-precision start offsets (seconds since run start, 2 dp,
    // locale-pinned — ADVICE r12) — the trailer's qoffm is the
    // minute-grain compression of this map
    val offs = results
      .map { case (k, _, _, o) => "\"" + k + "\":" + f2(o) }
      .mkString("{", ",", "}")
    val rerunsJson = reruns
      .map { case (k, v) => "\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val ctrlJson = ctrl
      .map { case (fm, fn0, lm, ln) => s"""{"first":[$fm,$fn0],"last":[$lm,$ln]}""" }
      .getOrElse("null")
    // full-precision heartbeat pairs [offset_sec, reading_sec]; the
    // trailer carries the readings alone as centiseconds (the offsets
    // are recoverable to HeartbeatEvery-query grain from qoffm)
    val ctrlHbJson = ctrlHb
      .map { case (off, t) => s"[${f2(off)},$t]" }
      .mkString("[", ",", "]")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // a leaked dev-only filter must never read as a full-suite total:
    // tag the JSON and shout on stderr (ADVICE r3)
    val filteredTag = if (only.isDefined) {
      System.err.println(
        s"[bench] WARNING: SPARK_GRAFT_ONLY is set — this is a " +
          s"${results.size}-query SUBSET, not the full suite")
      ""","filtered":true"""
    } else ""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""mins":$mins,"offsets":$offs,"reruns":$rerunsJson,""" +
        s""""control":$ctrlJson,"ctrl_hb":$ctrlHbJson,""" +
        s""""errors":$errJson$filteredTag,"sf":"$sfDir"}"""
    Files.write(Paths.get("bench_out.json"),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    // ALSO write a core-count-stamped copy (r15, the r14 verdict's
    // task 2): the driver benches at two core counts and the archived
    // log tail carries only the compact trailer, so the full-precision
    // per-query record of the FIRST run was lost when the second
    // overwrote bench_out.json. With the stamp both runs survive in
    // the workspace for the round record / judge, restoring
    // per-query and scaling data that PERF_r14 could not see. The
    // write is outside the timed region and changes no printed line.
    Files.write(Paths.get(s"bench_out_c$cpus.json"),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(json)
    println(compactTrailer(results, errors, total, filteredTag, sfDir, ctrl,
      reruns, ctrlHb.map(_._2).toSeq))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  /** Budget for the compact trailer: the driver archives a 2000-char
    * tail; leave room for sbt's closing [success]/[error] line. */
  val TrailerBudget = 1900

  /** One base-36 char for a query's start offset: whole minutes since
    * run start, 'z' = ≥35 min (a run that long has coarser problems);
    * negative/NaN defends to '0'. */
  private[graft] def offsetChar(sec: Double): Char =
    if (!(sec > 0)) '0'
    else Character.forDigit(math.min((sec / 60.0).toInt, 35), 36)

  /** The compact trailer, printed LAST and SELF-CONTAINED: complete
    * per-query data inside the driver's 2000-char log-tail window,
    * TOGETHER with sbt's trailing [success]/[error] line. Error
    * MESSAGES stay in the full first line and bench_out.json; the
    * trailer carries only the failed query NUMBERS (an array), so a
    * failure-heavy run cannot blow the budget. Degradation ladder as
    * the registry grows (centiseconds overflowed at 211 queries in r9;
    * the decisec MAP overflowed at 249 in r10, which cost the archived
    * record its whole per-query map):
    *
    *  1. centisec — med map `queries` + min map `qmins`, bare query
    *     numbers as keys;
    *  2. decisec — same maps, coarser unit;
    *  3. sec — same maps, whole seconds;
    *  4. ds-arrays — `qmed`/`qmin` VALUE ARRAYS in deciseconds,
    *     ordered by registry-name sort (the keys are recoverable by
    *     sorting `SparkEntry.queries.keys`; -1 = failed) — ~4 chars
    *     per value instead of ~10 per map entry, which keeps FULL
    *     per-query data in the record at 250+ queries;
    *  5. ds-mindelta (r14) — `qmin` array + `qmedd`, the med−min gap
    *     as ONE base-36 char per query in deciseconds ('z' = ≥35 ds,
    *     '0' for failed entries; med_ds = qmin + decode(qmedd)) — the
    *     gap is near-zero for all but spiky queries (measured at r13:
    *     215 of 315 zeros, 68 ones), so the char string costs ~1/2 the
    *     full med array and keeps BOTH med and min past the registry
    *     size where ds-arrays overflows (the r14 registry + the
    *     ctrl_hb column crossed it);
    *  6. ds-minarray — `qmin` only (the adjudication floor outranks
    *     the median when only one fits);
    *  7. omitted — totals + failed numbers only.
    *
    * Every form carries `ctrl_cs` — the q27 control bracket as
    * [first_med, first_min, last_med, last_min] in centiseconds
    * (-1 = unavailable) — so any record is self-normalizing. Every
    * PER-QUERY form also carries `qoffm` (r12): ONE base-36 char per query in
    * the same registry-name order as the value arrays — the query's
    * start offset in whole MINUTES since run start ('z' = ≥35 min) —
    * so a contention window mid-run shows up as a CLUSTER of slow
    * queries sharing a minute region. One char per query (~290 chars)
    * is what fits: a third JSON number array (~600 chars even
    * delta-encoded — the comma floor) would blow the tail budget next
    * to qmed+qmin at the current registry size. Full-precision
    * offsets: the `offsets` map in the first line / bench_out.json.
    *
    * Every form ALSO carries `qre` (r13): the post-control re-readings
    * of the run's med/min>[[RerunRatio]] queries as a {query number →
    * deciseconds} map (-1 = the re-run failed), ≤ [[MaxReruns]]
    * entries by construction — the run-tail adjudication data. Empty
    * map = no query spiked (r14: nor departed its band). Full
    * precision: the `reruns` map in the first line / bench_out.json.
    *
    * Every form ALSO carries `ctrl_hb` (r14): the mid-run control
    * heartbeat readings as a centisecond array (-1 = a heartbeat
    * failed), one per [[HeartbeatEvery]] queries plus the post-rerun
    * reading — ~10 entries ≈ 60 chars at the current registry, the
    * in-record timestamping of a sustained contention window. Full
    * precision [offset, sec] pairs: the `ctrl_hb` array in the first
    * line / bench_out.json. */
  private[graft] def compactTrailer(results: Seq[(String, Double, Double, Double)],
      errors: Map[String, String], total: Double, filteredTag: String,
      sfDir: String, ctrl: Option[(Double, Double, Double, Double)],
      reruns: Seq[(String, Double)] = Seq.empty,
      ctrlHb: Seq[Double] = Seq.empty): String = {
    def qnum(name: String): String = name.takeWhile(_ != '_').drop(1)
    def cs(v: Double): Long = if (v < 0) -1 else math.round(v * 100)
    def ds(v: Double): Long = if (v < 0) -1 else math.round(v * 10)
    val qoffm = results.map(r => offsetChar(r._4)).mkString
    val errQs = errors.keys.toSeq.sorted
      .map("\"" + qnum(_) + "\"").mkString("[", ",", "]")
    val ctrlCs = ctrl
      .map { case (a, b, c, d) => Seq(a, b, c, d).map(cs).mkString("[", ",", "]") }
      .getOrElse("[-1,-1,-1,-1]")
    val qre = reruns.take(MaxReruns)
      .map { case (k, v) => "\"" + qnum(k) + "\":" + ds(v) }
      .mkString("{", ",", "}")
    val hbCs = ctrlHb.map(cs).mkString("[", ",", "]")
    def trailer(unit: String, payload: String): String =
      s"""{"total":${f2(total)},"n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"unit":"$unit",$payload,""" +
        s""""ctrl_cs":$ctrlCs,"ctrl_hb":$hbCs,"qre":$qre,""" +
        s""""errors":$errQs$filteredTag,""" +
        s""""sf":"${Paths.get(sfDir).getFileName}"}"""
    // qoffm joins every rung that carries per-query data; the map-free
    // floor stays free of it (at a registry so large even the min
    // array overflows, n chars of offsets overflow too)
    val offPart = s""","qoffm":"$qoffm""""
    def scaled(v: Double, scale: Int): Long =
      if (v < 0) -1 else math.round(v * scale)
    def mapsForm(scale: Int, unit: String): String = {
      def m(sel: ((String, Double, Double, Double)) => Double): String =
        results.map(r => "\"" + qnum(r._1) + "\":" + scaled(sel(r), scale))
          .mkString("{", ",", "}")
      trailer(unit, s""""queries":${m(_._2)},"qmins":${m(_._3)}$offPart""")
    }
    def arr(sel: ((String, Double, Double, Double)) => Double): String =
      results.map(r => scaled(sel(r), 10)).mkString("[", ",", "]")
    // the ds-mindelta rung's med−min gap chars: base-36 deciseconds,
    // 'z' saturating at ≥35 ds, '0' for failed entries (qmin carries
    // the -1); med_ds = qmin + Character.digit(c, 36)
    val qmedd = results.map { r =>
      val d = if (r._2 < 0 || r._3 < 0) 0L
        else math.min(math.max(ds(r._2) - ds(r._3), 0L), 35L)
      Character.forDigit(d.toInt, 36)
    }.mkString
    // degradation priority once the med+min+off form overflows: the
    // median COARSENS first (ds-mindelta keeps it as a gap char), then
    // drops (the min is the adjudication floor, the offsets are what
    // localize a contention window — r11 task 3); offsets go next;
    // the map-free floor carries no per-query data
    val ladder = Seq(
      mapsForm(100, "centisec"), mapsForm(10, "decisec"), mapsForm(1, "sec"),
      trailer("ds-arrays",
        s""""queries":{},"qmed":${arr(_._2)},"qmin":${arr(_._3)}$offPart"""),
      trailer("ds-mindelta",
        s""""queries":{},"qmedd":"$qmedd","qmin":${arr(_._3)}$offPart"""),
      trailer("ds-minarray", s""""queries":{},"qmin":${arr(_._3)}$offPart"""),
      trailer("ds-minarray-bare", s""""queries":{},"qmin":${arr(_._3)}"""),
      trailer("omitted", """"queries":{}"""))
    ladder.find(_.length <= TrailerBudget).getOrElse {
      // unreachable in practice (the map-free form is a few hundred
      // chars), but never print an over-budget line that truncates
      System.err.println("[bench] WARNING: even the map-free trailer " +
        "exceeds the tail budget — emitting it anyway")
      ladder.last
    }
  }
}
