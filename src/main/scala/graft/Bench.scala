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
    // per-query map (bare query numbers, integer centiseconds; -1 =
    // failed) must fit whole inside the driver's 2000-char log-tail
    // window TOGETHER with sbt's trailing [success]/[error] line.
    // Error MESSAGES stay in the full first line and bench_out.json;
    // the trailer carries only the failed query numbers (an array), so
    // a failure-heavy run cannot blow the budget — the r8 trailer's
    // per-error strings could. If the registry outgrows centiseconds
    // (~220 queries), degrade to deciseconds rather than truncate.
    def qnum(name: String): String = name.takeWhile(_ != '_').drop(1)
    def trailer(scale: Int, unit: String): String = {
      val qs = results
        .map { case (k, v) =>
          "\"" + qnum(k) + "\":" + (if (v < 0) -1 else math.round(v * scale)) }
        .mkString("{", ",", "}")
      val errQs = errors.keys.toSeq.sorted
        .map("\"" + qnum(_) + "\"").mkString("[", ",", "]")
      f"""{"total":$total%.2f,"n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"unit":"$unit",""" +
        s""""queries":$qs,"errors":$errQs$filteredTag,""" +
        s""""sf":"${Paths.get(sfDir).getFileName}"}"""
    }
    val budget = 1900 // 2000-char tail minus sbt's closing line
    val t1 = trailer(100, "centisec")
    val line =
      if (t1.length <= budget) t1
      else {
        val t2 = trailer(10, "decisec")
        if (t2.length > budget) System.err.println(
          s"[bench] WARNING: compact trailer ${t2.length} chars exceeds " +
            s"the $budget-char tail budget even at decisec — shrink it")
        t2
      }
    println(line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
