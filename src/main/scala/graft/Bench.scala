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
  * r8 verdict's task 3): it carries the COMPLETE per-query map in
  * `queries`, encoded to fit the tail window — keys are the bare query
  * numbers ("01".."193", the `qNN` registry prefix minus its `q`),
  * values integer CENTISECONDS (declared by `unit`; -1 marks a failed
  * query) and `errors` only the failed query NUMBERS, so the trailer
  * size is registry-bound, not failure-bound. A registry grown past
  * the ~1900-char budget degrades to deciseconds (unit says so)
  * instead of truncating. Full-precision full-name results and error
  * messages stay in the first line and bench_out.json. All progress
  * goes to stderr.
  *
  * Each query is driven through a `noop`-format write, not `count()`:
  * count lets Catalyst prune projection-only work (rendering columns,
  * text metrics would never be evaluated), understating real cost.
  * Failures are not swallowed: a failed query reports -1 with its error
  * in an `errors` map and the process exits non-zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // Per-query warmup run, then the MEDIAN of `repeats` measured runs:
    // at these scale factors Catalyst analysis + whole-stage-codegen JIT
    // dominates a cold first execution, and this box's scheduler is noisy
    // (two identical-code r5 runs differed 27% total on min-of-two) — the
    // median of repeated steady-state runs makes round-over-round deltas
    // signal instead of scheduler luck.
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS").map(_.toInt).getOrElse(3)
    require(repeats >= 1, s"SPARK_GRAFT_REPEATS must be >= 1, got $repeats")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // dev-only focus filter (unset for driver runs = all queries)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    var errors = Map.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      System.err.println(s"[bench] $name")
      val t =
        try {
          runOnce(fn)
          median((1 to repeats).map { _ =>
            val t0 = System.nanoTime()
            runOnce(fn)
            (System.nanoTime() - t0) / 1e9
          })
        } catch {
          case e: Throwable =>
            errors += name -> e.toString
              .replaceAll("[\\\\\"\\n\\r]", " ").take(200)
            -1.0
        } finally {
          // release the blocks THIS query pinned (eager localCheckpoints
          // etc.) so later queries measure themselves, not accumulated
          // block-manager eviction pressure — the r9 driver record's
          // q91 15.29s-in-process / 0.98s-isolated spread was exactly
          // this residue landing on the late lexical tail
          GraftSession.releaseCaches(spark)
        }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
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
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson$filteredTag,"sf":"$sfDir"}"""
    Files.write(Paths.get("bench_out.json"),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(json)
    // compact trailer, printed LAST and SELF-CONTAINED: the complete
    // per-query map (bare query numbers, integer times; -1 = failed)
    // must fit whole inside the driver's 2000-char log-tail window
    // TOGETHER with sbt's trailing [success]/[error] line. Error
    // MESSAGES stay in the full first line and bench_out.json; the
    // trailer carries only the failed query numbers (an array), so a
    // failure-heavy run cannot blow the budget — the r8 trailer's
    // per-error strings could. Degradation ladder as the registry
    // grows (centiseconds overflowed at 211 queries, r9): centisec →
    // decisec → whole seconds → finally DROP the per-query map and
    // keep only the totals + failed query numbers, so the line that
    // prints always fits and always parses — never a truncated tail.
    println(compactTrailer(results, errors, total, filteredTag, sfDir))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  /** Budget for the compact trailer: the driver archives a 2000-char
    * tail; leave room for sbt's closing [success]/[error] line. */
  val TrailerBudget = 1900

  private[graft] def compactTrailer(results: Seq[(String, Double)],
      errors: Map[String, String], total: Double, filteredTag: String,
      sfDir: String): String = {
    def qnum(name: String): String = name.takeWhile(_ != '_').drop(1)
    val errQs = errors.keys.toSeq.sorted
      .map("\"" + qnum(_) + "\"").mkString("[", ",", "]")
    def trailer(qs: String, unit: String): String =
      f"""{"total":$total%.2f,"n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"unit":"$unit",""" +
        s""""queries":$qs,"errors":$errQs$filteredTag,""" +
        s""""sf":"${Paths.get(sfDir).getFileName}"}"""
    def withScale(scale: Int, unit: String): String = trailer(
      results.map { case (k, v) =>
        "\"" + qnum(k) + "\":" + (if (v < 0) -1 else math.round(v * scale)) }
        .mkString("{", ",", "}"),
      unit)
    val ladder = Seq(withScale(100, "centisec"), withScale(10, "decisec"),
      withScale(1, "sec"), trailer("{}", "omitted"))
    ladder.find(_.length <= TrailerBudget).getOrElse {
      // unreachable in practice (the map-free form is a few hundred
      // chars), but never print an over-budget line that truncates
      System.err.println("[bench] WARNING: even the map-free trailer " +
        "exceeds the tail budget — emitting it anyway")
      ladder.last
    }
  }
}
