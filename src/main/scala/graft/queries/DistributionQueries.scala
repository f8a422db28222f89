package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Distribution-shape analytics: concentration (HHI), two-sample
  * distribution distance (Kolmogorov-Smirnov), rank association
  * (Kendall tau-b), and information-theoretic profiles (Shannon
  * entropy, Jensen-Shannon divergence) — the corpus-health numbers a
  * mixture designer reads before weighting sources, next to the
  * hypothesis tests of `StatQueries` (chi², Mann-Whitney, Welch) and
  * the inequality audit of q159's exact Gini.
  *
  * Exactness contract (the repo-wide oracle discipline): every count
  * and currency amount is an exact 64-bit (or DECIMAL(38,0)/HUGEINT)
  * integer; ratios quantize to ppm by INTEGER floor-division; the two
  * transcendental queries (entropy, JSD) micro-quantize each term to
  * integer BEFORE the order-immune BIGINT sum (the q50/q194
  * technique — exact integer inputs, one fixed-shape IEEE expression,
  * 10⁻⁶ quanta ~10 orders above cross-libm ln() ulp divergence).
  */
object DistributionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val d38 = "decimal(38,0)"

  /** q230: Herfindahl-Hirschman revenue concentration per market
    * segment — Σ(customer share)² in ppm, the standard "is this
    * segment's demand a monopsony?" number and the concentration twin
    * of q159's Gini (HHI weights the head, Gini the whole curve).
    *
    * Exact end to end: order totals land as integer cents (the q226
    * idiom — one round both engines compute identically), per-customer
    * revenue is a BIGINT sum, Σrev² runs in DECIMAL(38,0) (rev² ~1e16
    * × 10⁴ customers overflows BIGINT; the decimal has 13 digits of
    * headroom at 10⁶× this scale factor), and the ppm is one integral
    * division of nonneg exact integers — floor on both engines.
    *
    * Scale shape: pre-aggregate orders to customer grain BEFORE the
    * customer join (the join input shrinks from orders to customers),
    * join strategy left to AQE (both sides are fact-sized at 100 TB —
    * the q200 argument), then one segment-grain rollup. No window, no
    * sort. */
  val marketHhi: Q = Q(
    "q230_market_hhi",
    """WITH o AS (SELECT o_custkey,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders),
      |r AS (SELECT c.c_mktsegment AS segment, o.o_custkey,
      |             CAST(sum(o.cents) AS BIGINT) AS rev
      |      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |      GROUP BY 1, 2),
      |s AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
      |             CAST(sum(rev) AS BIGINT) AS tot,
      |             sum(CAST(rev AS HUGEINT) * rev) AS sq
      |      FROM r GROUP BY 1)
      |SELECT segment, n_cust, tot,
      |       CAST((1000000 * sq) // (CAST(tot AS HUGEINT) * tot) AS BIGINT)
      |         AS hhi_ppm
      |FROM s ORDER BY segment""".stripMargin
  ) { (s, dir) =>
    val rev = t(s, dir, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy("o_custkey").agg(sum(col("cents")).as("rev"))
    rev
      .join(t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), Seq("o_custkey"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("tot"),
        sum(col("rev").cast(d38) * col("rev")).as("sq"))
      .select(col("segment"), col("n_cust"), col("tot"),
        expr(s"CAST((CAST(1000000 AS $d38) * sq) DIV " +
          s"(CAST(tot AS $d38) * tot) AS BIGINT)").as("hhi_ppm"))
  }

  /** q231: two-sample KOLMOGOROV-SMIRNOV distance between the
    * BUILDING and MACHINERY segments' order-value distributions —
    * D = max|F₁−F₂| over the empirical CDFs, the distribution-shape
    * drift test that catches what the mean-based q223 cannot (equal
    * means, different tails).
    *
    * Exact: with x in integer cents, F₁(x)−F₂(x) = c₁(x)/n₁ − c₂(x)/n₂
    * compares as the INTEGER |c₁·n₂ − c₂·n₁| (common denominator
    * n₁·n₂ ~ 10⁹ and the scaled max ~10¹⁵ both fit BIGINT), so D
    * needs no doubles at all; the reported ppm is one integral floor
    * division.
    *
    * Scale shape: BOTH groups' CDF prefixes run at DISTINCT-VALUE
    * grain through ONE two-phase range-partitioned pass
    * ([[graft.operators.Ranks.globalRunningSums]] — the q222 ranking
    * discipline, never a partition-less window; the multi-column form
    * exists so the second CDF costs one Long per partition instead of
    * a second range exchange); totals ride one broadcast 1-row
    * frame. */
  val ksTest: Q = Q(
    "q231_ks_test",
    """WITH f AS (SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1
      |                       ELSE 2 END AS g,
      |             CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
      |           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |           WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |v AS (SELECT x,
      |        CAST(count(*) FILTER (WHERE g = 1) AS BIGINT) AS c1,
      |        CAST(count(*) FILTER (WHERE g = 2) AS BIGINT) AS c2
      |      FROM f GROUP BY x),
      |cum AS (SELECT x,
      |          CAST(sum(c1) OVER (ORDER BY x) AS BIGINT) AS f1,
      |          CAST(sum(c2) OVER (ORDER BY x) AS BIGINT) AS f2
      |        FROM v),
      |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |             CAST(sum(c2) AS BIGINT) AS n2 FROM v),
      |d AS (SELECT n.n1, n.n2,
      |             max(abs(cum.f1 * n.n2 - cum.f2 * n.n1)) AS d_scaled
      |      FROM cum CROSS JOIN n GROUP BY n.n1, n.n2)
      |SELECT n1, n2, CAST(d_scaled AS BIGINT) AS d_scaled,
      |       CAST((1000000 * d_scaled) // (n1 * n2) AS BIGINT) AS d_ppm
      |FROM d""".stripMargin
  ) { (s, dir) =>
    val f = t(s, dir, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast(LongType).as("x"))
      .join(t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey").as("o_custkey"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(2L).as("g")),
        Seq("o_custkey"))
    val byVal = f.groupBy("x").agg(
      sum(when(col("g") === 1L, 1L).otherwise(0L)).as("c1"),
      sum(when(col("g") === 2L, 1L).otherwise(0L)).as("c2"))
    val cum = graft.operators.Ranks.globalRunningSums(
      byVal, Seq(col("x")), Seq(col("c1") -> "f1", col("c2") -> "f2"))
    val n = byVal.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(n))
      .select(col("n1"), col("n2"),
        abs(col("f1") * col("n2") - col("f2") * col("n1")).as("d"))
      .groupBy("n1", "n2").agg(max(col("d")).as("d_scaled"))
      .select(col("n1"), col("n2"), col("d_scaled"),
        expr("(1000000 * d_scaled) div (n1 * n2)").as("d_ppm"))
  }

  /** q232: KENDALL TAU-B rank association between the daily event
    * COUNT and the daily event VALUE sum — "do busy days monetize?"
    * as a monotone-association number, the rank twin of q221's
    * Spearman (tau counts pair inversions; Spearman correlates rank
    * positions — tau is the one with the clean tie correction).
    *
    * Exact: both series are integers (a count; a cents sum), so every
    * pair classifies exactly into concordant / discordant / x-tied /
    * y-tied / both-tied; tau-b = (nc−nd)/√((nc+nd+ty)(nc+nd+tx))
    * is one fixed IEEE expression over those five BIGINTs (√ is
    * correctly rounded on both engines), reported in milli.
    *
    * Scale shape: the pair join is DAY-grain — calendar-bounded (the
    * q141/q144 argument: |days|² pairs is a constant of the calendar,
    * not the data), broadcast on one side; everything below it is one
    * grouped scan of events. */
  val kendallTau: Q = Q(
    "q232_kendall_tau",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
      |             CAST(count(*) AS BIGINT) AS x,
      |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |           FROM events GROUP BY 1),
      |p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      |      FROM d a JOIN d b ON a.day < b.day),
      |agg AS (SELECT
      |    CAST(count(*) FILTER (WHERE (xa < xb AND ya < yb)
      |                             OR (xa > xb AND ya > yb)) AS BIGINT) AS nc,
      |    CAST(count(*) FILTER (WHERE (xa < xb AND ya > yb)
      |                             OR (xa > xb AND ya < yb)) AS BIGINT) AS nd,
      |    CAST(count(*) FILTER (WHERE xa = xb AND ya <> yb) AS BIGINT) AS tx,
      |    CAST(count(*) FILTER (WHERE ya = yb AND xa <> xb) AS BIGINT) AS ty,
      |    CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days
      |  FROM p)
      |SELECT n_days, nc, nd,
      |       CAST(round(1000.0 * (nc - nd)
      |         / sqrt(CAST(nc + nd + ty AS DOUBLE) * (nc + nd + tx)))
      |         AS BIGINT) AS tau_milli
      |FROM agg""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("value") * 100).cast(LongType)).as("y"))
    val a = d.select(col("day").as("day_a"), col("x").as("xa"),
      col("y").as("ya"))
    val b = d.select(col("day").as("day_b"), col("x").as("xb"),
      col("y").as("yb"))
    val p = a.join(broadcast(b), col("day_a") < col("day_b"))
    val nDays = d.agg(count(lit(1)).as("n_days"))
    p.agg(
        sum(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
          (col("xa") > col("xb") && col("ya") > col("yb")), 1L)
          .otherwise(0L)).as("nc"),
        sum(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
          (col("xa") > col("xb") && col("ya") < col("yb")), 1L)
          .otherwise(0L)).as("nd"),
        sum(when(col("xa") === col("xb") && col("ya") =!= col("yb"), 1L)
          .otherwise(0L)).as("tx"),
        sum(when(col("ya") === col("yb") && col("xa") =!= col("xb"), 1L)
          .otherwise(0L)).as("ty"))
      .crossJoin(broadcast(nDays))
      .select(col("n_days"), col("nc"), col("nd"),
        round(lit(1000.0) * (col("nc") - col("nd"))
          / sqrt((col("nc") + col("nd") + col("ty")).cast("double")
            * (col("nc") + col("nd") + col("tx"))))
          .cast(LongType).as("tau_milli"))
  }

  /** q233: SHANNON ENTROPY of the event-type mix per day, in integer
    * micro-nats — the mix-diversity series a drift monitor plots next
    * to q207's chi² (entropy collapses when one type takes over, chi²
    * says whether the change is significant).
    *
    * Exactness: each type's term (c/n)·ln(n/c) is one fixed IEEE
    * expression over two exact integers, micro-quantized to BIGINT
    * BEFORE the per-day sum (the q50 order-immunity technique), so
    * the total is exact under any aggregation schedule; c = n gives
    * ln(1) = 0 exactly on both engines.
    *
    * Scale shape: one grouped count at (day, type) grain, one
    * day-grain rollup — map-side combinable all the way; no window,
    * no sort, no collect. */
  val eventEntropy: Q = Q(
    "q233_event_entropy",
    """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type,
      |             CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |n AS (SELECT day, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
      |SELECT c.day, n.n,
      |       CAST(sum(CAST(round(1000000.0 * (CAST(c.c AS DOUBLE) / n.n)
      |         * ln(CAST(n.n AS DOUBLE) / c.c)) AS BIGINT)) AS BIGINT) AS h_u6
      |FROM c JOIN n ON c.day = n.day
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val c = t(s, dir, "events")
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val n = c.groupBy("day").agg(sum(col("c")).as("n"))
    c.join(n, Seq("day"))
      .select(col("day"), col("n"),
        round(lit(1000000.0) * (col("c").cast("double") / col("n"))
          * log(col("n").cast("double") / col("c")))
          .cast(LongType).as("term_u6"))
      .groupBy("day", "n").agg(sum(col("term_u6")).as("h_u6"))
  }

  /** q234: JENSEN-SHANNON DIVERGENCE between the vocabulary
    * distributions of the corpus' two source halves (src0-9 vs
    * src10-19) — the symmetric, always-finite mixture distance a data
    * composer uses to quantify "how different are these two feeds"
    * before blending (KL alone blows up on any term one side lacks;
    * JSD's mixture midpoint never does).
    *
    * Exactness: per-term counts (cp, cq) and totals (np, nq) are
    * exact integers; each term's ½(p·ln(p/m) + q·ln(q/m)) with
    * m = (p+q)/2 is one fixed-shape IEEE expression (identical
    * operand order on both engines), micro-quantized to BIGINT before
    * the one order-immune sum; a zero count contributes exactly its
    * surviving half (x·ln x → 0 guarded by CASE on both sides).
    *
    * Scale shape: explode → one (term, half)-grain count with map-side
    * combine → 1-row broadcast totals → term-grain map + one sum.
    * Distinct terms cross the wire, not occurrences. */
  val vocabJsd: Q = Q(
    "q234_vocab_jsd",
    """WITH w AS (SELECT CASE WHEN CAST(substr(source, 4, 8) AS INT) < 10
      |                       THEN 1 ELSE 2 END AS h,
      |             unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |c AS (SELECT term,
      |        CAST(count(*) FILTER (WHERE h = 1) AS BIGINT) AS cp,
      |        CAST(count(*) FILTER (WHERE h = 2) AS BIGINT) AS cq
      |      FROM w GROUP BY term),
      |n AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
      |             CAST(sum(cq) AS BIGINT) AS nq,
      |             CAST(count(*) AS BIGINT) AS n_terms FROM c)
      |SELECT n.n_terms, n.np, n.nq,
      |       CAST(sum(CAST(round(1000000.0 * 0.5 * (
      |         CASE WHEN c.cp > 0 THEN (CAST(c.cp AS DOUBLE) / n.np)
      |           * ln((CAST(c.cp AS DOUBLE) / n.np)
      |             / ((CAST(c.cp AS DOUBLE) / n.np
      |                + CAST(c.cq AS DOUBLE) / n.nq) / 2)) ELSE 0.0 END
      |         + CASE WHEN c.cq > 0 THEN (CAST(c.cq AS DOUBLE) / n.nq)
      |           * ln((CAST(c.cq AS DOUBLE) / n.nq)
      |             / ((CAST(c.cp AS DOUBLE) / n.np
      |                + CAST(c.cq AS DOUBLE) / n.nq) / 2)) ELSE 0.0 END))
      |         AS BIGINT)) AS BIGINT) AS jsd_u6
      |FROM c CROSS JOIN n
      |GROUP BY 1, 2, 3""".stripMargin
  ) { (s, dir) =>
    val w = t(s, dir, "documents")
      .select(
        when(substring(col("source"), 4, 8).cast("int") < 10, 1L)
          .otherwise(2L).as("h"),
        explode(split(col("text"), " ")).as("term"))
    val c = w.groupBy("term").agg(
      sum(when(col("h") === 1L, 1L).otherwise(0L)).as("cp"),
      sum(when(col("h") === 2L, 1L).otherwise(0L)).as("cq"))
    val n = c.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"),
      count(lit(1)).as("n_terms"))
    val withN = c.crossJoin(broadcast(n))
    val p = col("cp").cast("double") / col("np")
    val q = col("cq").cast("double") / col("nq")
    val m = (p + q) / lit(2)
    val contrib = round(lit(1000000.0) * lit(0.5) * (
      when(col("cp") > 0, p * log(p / m)).otherwise(lit(0.0))
        + when(col("cq") > 0, q * log(q / m)).otherwise(lit(0.0))))
      .cast(LongType)
    withN.select(col("n_terms"), col("np"), col("nq"),
        contrib.as("contrib_u6"))
      .groupBy("n_terms", "np", "nq")
      .agg(sum(col("contrib_u6")).as("jsd_u6"))
  }

  /** q240: LEAD-LAG cross-correlation between the 'view' and
    * 'purchase' daily series at lags −3..+3 — "do views lead
    * purchases, and by how many days?", the causal-ordering probe a
    * funnel analyst runs before attribution. Pearson r at each lag
    * from EXACT integer moments (Σx, Σy, Σxy, Σx², Σy² over the
    * aligned day pairs — DECIMAL(38,0) products, the q223 overflow
    * discipline), one fixed IEEE expression per lag, reported in
    * milli.
    *
    * Scale shape: two day-grain aggregates, a 7-row lag spine
    * broadcast-fanned against one side (the q196 pattern), one hash
    * equi-join on the shifted day, one (lag)-grain moment rollup.
    * Calendar-bounded throughout. */
  val leadLag: Q = Q(
    "q240_lead_lag",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
      |             CAST(count(*) AS BIGINT) AS c
      |           FROM events WHERE event_type IN ('view', 'purchase')
      |           GROUP BY 1, 2),
      |x AS (SELECT day, c FROM d WHERE event_type = 'view'),
      |y AS (SELECT day, c FROM d WHERE event_type = 'purchase'),
      |lags AS (SELECT unnest(range(-3, 4)) AS lag),
      |p AS (SELECT l.lag, x.c AS xv, y.c AS yv
      |      FROM lags l CROSS JOIN x
      |      JOIN y ON y.day = x.day + to_days(CAST(l.lag AS INT))),
      |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
      |        sum(CAST(xv AS HUGEINT) * yv) AS sxy,
      |        sum(CAST(xv AS HUGEINT) * xv) AS sxx,
      |        sum(CAST(yv AS HUGEINT) * yv) AS syy
      |      FROM p GROUP BY lag)
      |SELECT CAST(lag AS BIGINT) AS lag, n,
      |       CAST(round(1000.0 *
      |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * sy)
      |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * sx)
      |           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |             - CAST(sy AS DOUBLE) * sy))) AS BIGINT) AS r_milli
      |FROM m""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val x = d.filter(col("event_type") === "view").select("day", "c")
    val y = d.filter(col("event_type") === "purchase")
      .select(col("day").as("day_y"), col("c").as("yv"))
    val lags = s.range(-3, 4).select(col("id").as("lag"))
    val p = x.crossJoin(broadcast(lags))
      .select(col("lag"), col("c").as("xv"),
        date_add(col("day"), col("lag").cast("int")).as("day_y"))
      .join(y, Seq("day_y"))
    val nD = col("n").cast("double")
    p.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("xv")).as("sx"), sum(col("yv")).as("sy"),
        sum(col("xv").cast(d38) * col("yv")).as("sxy"),
        sum(col("xv").cast(d38) * col("xv")).as("sxx"),
        sum(col("yv").cast(d38) * col("yv")).as("syy"))
      .select(col("lag"), col("n"),
        round(lit(1000.0) *
          (nD * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy"))
          / sqrt((nD * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx"))
            * (nD * col("syy").cast("double")
              - col("sy").cast("double") * col("sy"))))
          .cast(LongType).as("r_milli"))
  }

  /** q241: THEIL INDEX of customer revenue inequality per segment —
    * T = Σ (xᵢ/X)·ln(xᵢ·n/X), the decomposable member of the
    * inequality family (q159 Gini weights the whole curve, q230 HHI
    * the head; Theil is the one that splits into within/between-group
    * terms). Per-customer terms micro-quantize to integers before the
    * order-immune sum (the q233/q234 technique); revenue is exact
    * integer cents throughout.
    *
    * Scale shape: customer-grain revenue rollup, segment totals as a
    * dimension-sized broadcast join back, term-grain map, one sum. */
  val theilIndex: Q = Q(
    "q241_theil_index",
    """WITH o AS (SELECT o_custkey,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders),
      |r AS (SELECT c.c_mktsegment AS segment, o.o_custkey,
      |             CAST(sum(o.cents) AS BIGINT) AS rev
      |      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |      GROUP BY 1, 2),
      |s AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
      |             CAST(sum(rev) AS BIGINT) AS tot
      |      FROM r GROUP BY 1)
      |SELECT r.segment, s.n_cust, s.tot,
      |       CAST(sum(CAST(round(1000000.0
      |         * (CAST(r.rev AS DOUBLE) / s.tot)
      |         * ln(CAST(r.rev AS DOUBLE) * s.n_cust / s.tot))
      |         AS BIGINT)) AS BIGINT) AS theil_u6
      |FROM r JOIN s ON r.segment = s.segment
      |GROUP BY 1, 2, 3""".stripMargin
  ) { (s, dir) =>
    val rev = t(s, dir, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy("o_custkey").agg(sum(col("cents")).as("rev"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), Seq("o_custkey"))
    val seg = rev.groupBy("segment")
      .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("tot"))
    rev.join(broadcast(seg), Seq("segment"))
      .select(col("segment"), col("n_cust"), col("tot"),
        round(lit(1000000.0)
          * (col("rev").cast("double") / col("tot"))
          * log(col("rev").cast("double") * col("n_cust") / col("tot")))
          .cast(LongType).as("term_u6"))
      .groupBy("segment", "n_cust", "tot")
      .agg(sum(col("term_u6")).as("theil_u6"))
  }

  /** q242: FANO FACTOR (variance-to-mean ratio) of each event type's
    * daily count series — the burstiness index (1 = Poisson-like,
    * > 1 = bursty/overdispersed) a capacity planner reads next to
    * q144's MAD anomalies. Exact integer moments over the
    * calendar-bounded series; one fixed IEEE expression per type,
    * reported in milli (population variance, the n-denominator
    * form). */
  val fanoFactor: Q = Q(
    "q242_fano_factor",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |             CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(c) AS BIGINT) AS s,
      |        sum(CAST(c AS HUGEINT) * c) AS ss
      |      FROM d GROUP BY 1)
      |SELECT event_type, n, s,
      |       CAST(round(1000.0
      |         * (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |             - CAST(s AS DOUBLE) * s)
      |         / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)
      |         AS fano_milli
      |FROM m""".stripMargin
  ) { (s, dir) =>
    val nD = col("n").cast("double")
    t(s, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast(d38) * col("c")).as("ss"))
      .select(col("event_type"), col("n"), col("s"),
        round(lit(1000.0)
          * (nD * col("ss").cast("double")
            - col("s").cast("double") * col("s"))
          / (nD * col("s").cast("double")))
          .cast(LongType).as("fano_milli"))
  }

  /** q246: MANN-KENDALL trend test per event type — "is this series
    * monotonically drifting?" without assuming a distribution (the
    * hypothesis-test companion of q208's Holt trend estimate; q232
    * measures association BETWEEN two series, this tests trend OF one
    * against time). S = Σ sign(y_b − y_a) over day pairs is an exact
    * integer; the tie-corrected variance and the continuity-corrected
    * z are one fixed IEEE expression over exact BIGINTs, in milli.
    * Pair join calendar-bounded per type (the q232 argument). */
  val mannKendall: Q = Q(
    "q246_mann_kendall",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |             CAST(count(*) AS BIGINT) AS y
      |           FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type,
      |        CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
      |             ELSE 0 END AS sgn
      |      FROM d a JOIN d b ON a.event_type = b.event_type
      |                       AND a.day < b.day),
      |s AS (SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat
      |      FROM p GROUP BY 1),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |      FROM d GROUP BY 1),
      |t AS (SELECT event_type,
      |        CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |      FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
      |            FROM d GROUP BY 1, 2)
      |      GROUP BY 1)
      |SELECT n.event_type, n.n, s.s_stat,
      |       CAST(round(1000.0 *
      |         (CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
      |               WHEN s.s_stat < 0 THEN s.s_stat + 1 ELSE 0 END)
      |         / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
      |             - t.tie_term) / 18.0)) AS BIGINT) AS z_milli
      |FROM n JOIN s ON n.event_type = s.event_type
      |JOIN t ON n.event_type = t.event_type""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val a = d.select(col("event_type"), col("day").as("day_a"),
      col("y").as("ya"))
    val b = d.select(col("event_type"), col("day").as("day_b"),
      col("y").as("yb"))
    val sStat = a.join(broadcast(b), Seq("event_type"))
      .filter(col("day_a") < col("day_b"))
      .select(col("event_type"),
        when(col("yb") > col("ya"), 1L)
          .when(col("yb") < col("ya"), -1L).otherwise(0L).as("sgn"))
      .groupBy("event_type").agg(sum(col("sgn")).as("s_stat"))
    val n = d.groupBy("event_type").agg(count(lit(1)).as("n"))
    val ties = d.groupBy("event_type", "y").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .as("tie_term"))
    val nD = col("n").cast("double")
    n.join(sStat, Seq("event_type")).join(ties, Seq("event_type"))
      .select(col("event_type"), col("n"), col("s_stat"),
        round(lit(1000.0) *
          when(col("s_stat") > 0, col("s_stat") - 1)
            .when(col("s_stat") < 0, col("s_stat") + 1).otherwise(0L)
          / sqrt((nD * (col("n") - 1) * (lit(2) * col("n") + 5)
            - col("tie_term")) / 18.0))
          .cast(LongType).as("z_milli"))
  }

  /** q247: SEN'S SLOPE per event type — the robust trend MAGNITUDE
    * that pairs with q246's significance (median of all pairwise
    * slopes shrugs off the outlier days that wreck least squares).
    * Each slope is ONE IEEE division of exact integers (count delta /
    * day gap), so both engines materialize identical doubles; the
    * median is the same exact-interpolation percentile on both
    * (Spark `percentile(0.5)` == DuckDB `median` for doubles), micro-
    * quantized. Pairs are calendar-bounded per type. */
  val senSlope: Q = Q(
    "q247_sen_slope",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |             CAST(count(*) AS BIGINT) AS y
      |           FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type,
      |        (CAST(b.y AS DOUBLE) - a.y)
      |          / date_diff('day', a.day, b.day) AS slope
      |      FROM d a JOIN d b ON a.event_type = b.event_type
      |                       AND a.day < b.day)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(round(1000000.0 * median(slope)) AS BIGINT)
      |         AS slope_u6
      |FROM p GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val a = d.select(col("event_type"), col("day").as("day_a"),
      col("y").as("ya"))
    val b = d.select(col("event_type"), col("day").as("day_b"),
      col("y").as("yb"))
    a.join(broadcast(b), Seq("event_type"))
      .filter(col("day_a") < col("day_b"))
      .select(col("event_type"),
        ((col("yb").cast("double") - col("ya"))
          / datediff(col("day_b"), col("day_a"))).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(lit(1000000.0) * expr("percentile(slope, 0.5)"))
          .cast(LongType).as("slope_u6"))
  }

  /** q252: MUTUAL INFORMATION between event type and value band —
    * I(T;B) = Σ p(t,b)·ln(p(t,b)/(p(t)p(b))), the dependence number a
    * mixture designer reads to decide whether a categorical column
    * actually carries signal about a numeric one (0 = independent;
    * the q194-entropy family's bivariate member: q194 profiles one
    * margin, q234's JSD compares two distributions, this measures the
    * JOINT against the product of margins).
    *
    * Value bands are exact integer deciles of the fixed [0, 500)
    * range (`floor(value / 50)` clamped to 9 — one IEEE division by a
    * power-of-2-free constant, identical on both engines). All three
    * distributions are exact BIGINT counts over ONE cell-grain
    * aggregate (types × 10 cells, dimension-sized); margins join back
    * broadcast; each cell's term micro-quantizes to u6 before the
    * order-immune sum (the q241 Theil technique). One keyed shuffle at
    * cell grain; N rides a 1-row broadcast. */
  val mutualInfo: Q = Q(
    "q252_mutual_information",
    """WITH c AS (SELECT event_type,
      |             least(CAST(floor(value / 50) AS BIGINT), 9) AS band,
      |             CAST(count(*) AS BIGINT) AS n_tb
      |           FROM events GROUP BY 1, 2),
      |mt AS (SELECT event_type, CAST(sum(n_tb) AS BIGINT) AS n_t
      |       FROM c GROUP BY 1),
      |mb AS (SELECT band, CAST(sum(n_tb) AS BIGINT) AS n_b
      |       FROM c GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_tb) AS BIGINT) AS n FROM c)
      |SELECT tot.n,
      |       CAST(sum(CAST(round(1000000.0
      |         * (CAST(c.n_tb AS DOUBLE) / tot.n)
      |         * ln(CAST(c.n_tb AS DOUBLE) * tot.n
      |              / (CAST(mt.n_t AS DOUBLE) * mb.n_b)))
      |         AS BIGINT)) AS BIGINT) AS mi_u6
      |FROM c
      |JOIN mt USING (event_type) JOIN mb USING (band) CROSS JOIN tot
      |GROUP BY tot.n""".stripMargin
  ) { (s, dir) =>
    val cells = t(s, dir, "events")
      .groupBy(col("event_type"),
        least(floor(col("value") / 50).cast(LongType), lit(9L)).as("band"))
      .agg(count(lit(1)).as("n_tb"))
    val mt = cells.groupBy("event_type").agg(sum(col("n_tb")).as("n_t"))
    val mb = cells.groupBy("band").agg(sum(col("n_tb")).as("n_b"))
    val tot = cells.agg(sum(col("n_tb")).as("n"))
    cells
      .join(broadcast(mt), Seq("event_type"))
      .join(broadcast(mb), Seq("band"))
      .crossJoin(broadcast(tot))
      .select(col("n"),
        round(lit(1000000.0)
          * (col("n_tb").cast("double") / col("n"))
          * log(col("n_tb").cast("double") * col("n")
            / (col("n_t").cast("double") * col("n_b"))))
          .cast(LongType).as("term_u6"))
      .groupBy("n").agg(sum(col("term_u6")).as("mi_u6"))
  }

  /** q282: HILL DIVERSITY NUMBERS of the source mix — the "effective
    * number of sources" ladder ecology standardized (Hill 1973) and
    * the intuitive unification of this file's concentration family:
    * D₀ = richness, D₁ = exp(H) (the entropy q233 computes, as a
    * COUNT — "this mix behaves like D₁ equally-sized sources"),
    * D₂ = 1/Σp² (inverse Simpson, the reciprocal of q230's HHI) —
    * with D₀ ≥ D₁ ≥ D₂ always, the gap measuring how top-heavy the
    * mix is. Over source token shares: H's terms micro-quantize from
    * exact BIGINTs (the q233 discipline), D₁ = exp(h/10⁶) is one more
    * transcendental of an exact integer (identical double on both
    * engines), D₂ is an exact rational N²/Σn² via one fixed-shape
    * double. One source-grain rollup and a 1-row reduce. */
  val hillDiversity: Q = Q(
    "q282_hill_diversity",
    """WITH n AS (SELECT source,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS nt
      |           FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(nt) AS BIGINT) AS n FROM n),
      |h AS (SELECT CAST(sum(CAST(round(-1000000.0
      |          * (CAST(nt AS DOUBLE) / tot.n)
      |          * ln(CAST(nt AS DOUBLE) / tot.n)) AS BIGINT)) AS BIGINT)
      |          AS h_u6,
      |        CAST(count(*) AS BIGINT) AS d0,
      |        sum(CAST(nt AS HUGEINT) * nt) AS sq
      |      FROM n CROSS JOIN tot)
      |SELECT h.d0, h.h_u6,
      |  CAST(round(1000.0 * exp(CAST(h.h_u6 AS DOUBLE) / 1000000.0))
      |    AS BIGINT) AS d1_milli,
      |  CAST(round(1000.0 * (CAST(tot.n AS DOUBLE) * tot.n)
      |    / CAST(h.sq AS DOUBLE)) AS BIGINT) AS d2_milli
      |FROM h CROSS JOIN tot""".stripMargin
  ) { (s, dir) =>
    val n = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast(LongType).as("nt"))
    val tot = n.agg(sum(col("nt")).as("n"))
    n.crossJoin(broadcast(tot))
      .agg(
        sum(round(lit(-1000000.0)
          * (col("nt").cast("double") / col("n"))
          * log(col("nt").cast("double") / col("n"))).cast(LongType))
          .as("h_u6"),
        count(lit(1)).as("d0"),
        sum(col("nt").cast(d38) * col("nt")).as("sq"),
        max(col("n")).as("n"))
      .select(col("d0"), col("h_u6"),
        expr("CAST(round(1000.0 * exp(CAST(h_u6 AS DOUBLE) / 1000000.0)) " +
          "AS BIGINT)").as("d1_milli"),
        expr("CAST(round(1000.0 * (CAST(n AS DOUBLE) * n) " +
          "/ CAST(sq AS DOUBLE)) AS BIGINT)").as("d2_milli"))
  }

  /** q286: PERMUTATION ENTROPY (Bandt & Pompe 2002) of each type's
    * daily series — the complexity measure the moment family (q242
    * Fano, q253 burstiness) can't see: it reads the diversity of
    * ORDINAL patterns (which of the 6 orderings consecutive triples
    * take), so a perfectly periodic series scores near 0 and white
    * noise near ln 6, independent of scale. Ordinal ranks break ties
    * by POSITION (the standard convention, and the thing that keeps
    * the pattern a pure integer function of exact counts): element
    * i's rank = |{j : vⱼ < vᵢ ∨ (vⱼ = vᵢ ∧ j < i)}|, pattern id =
    * 100·r₀ + 10·r₁ + r₂. Entropy terms micro-quantize from exact
    * BIGINT pattern counts (the q233 discipline). Keyed lead windows
    * only; calendar-bounded series. */
  val permutationEntropy: Q = Q(
    "q286_permutation_entropy",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |             CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1, 2),
      |t3 AS (SELECT event_type, n AS a,
      |         lead(n, 1) OVER w AS b, lead(n, 2) OVER w AS c
      |       FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |pat AS (SELECT event_type,
      |          100 * (CASE WHEN b < a THEN 1 ELSE 0 END
      |               + CASE WHEN c < a THEN 1 ELSE 0 END)
      |          + 10 * (CASE WHEN a <= b THEN 1 ELSE 0 END
      |                + CASE WHEN c < b THEN 1 ELSE 0 END)
      |          + (CASE WHEN a <= c THEN 1 ELSE 0 END
      |           + CASE WHEN b <= c THEN 1 ELSE 0 END) AS pid
      |        FROM t3 WHERE b IS NOT NULL AND c IS NOT NULL),
      |pc AS (SELECT event_type, pid, CAST(count(*) AS BIGINT) AS k
      |       FROM pat GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(sum(k) AS BIGINT) AS nt,
      |             CAST(count(*) AS BIGINT) AS n_patterns
      |      FROM pc GROUP BY 1)
      |SELECT pc.event_type, m.nt AS n_triples, m.n_patterns,
      |       CAST(sum(CAST(round(-1000000.0
      |         * (CAST(pc.k AS DOUBLE) / m.nt)
      |         * ln(CAST(pc.k AS DOUBLE) / m.nt)) AS BIGINT)) AS BIGINT)
      |         AS h_u6
      |FROM pc JOIN m USING (event_type)
      |GROUP BY 1, 2, 3""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("event_type").orderBy("day")
    val d = t(s, dir, "events")
      .groupBy(col("event_type"),
        to_date(timestamp_millis(expr("ts_ns div 1000000"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val pat = d
      .withColumn("b", lead(col("n"), 1).over(w))
      .withColumn("c", lead(col("n"), 2).over(w))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .select(col("event_type"),
        (lit(100) * (when(col("b") < col("n"), 1).otherwise(0)
          + when(col("c") < col("n"), 1).otherwise(0))
          + lit(10) * (when(col("n") <= col("b"), 1).otherwise(0)
            + when(col("c") < col("b"), 1).otherwise(0))
          + (when(col("n") <= col("c"), 1).otherwise(0)
            + when(col("b") <= col("c"), 1).otherwise(0))).as("pid"))
    val pc = pat.groupBy("event_type", "pid").agg(count(lit(1)).as("k"))
    val m = pc.groupBy("event_type")
      .agg(sum(col("k")).as("nt"), count(lit(1)).as("n_patterns"))
    pc.join(broadcast(m), Seq("event_type"))
      .select(col("event_type"), col("nt").as("n_triples"),
        col("n_patterns"),
        round(lit(-1000000.0)
          * (col("k").cast("double") / col("nt"))
          * log(col("k").cast("double") / col("nt")))
          .cast(LongType).as("term_u6"))
      .groupBy("event_type", "n_triples", "n_patterns")
      .agg(sum(col("term_u6")).as("h_u6"))
  }

  /** q292: POPULATION STABILITY INDEX of the value distribution,
    * first calendar half vs second — the ML-monitoring drift number
    * this family still lacked: q105's KL is directional and
    * zero-unsafe, q207's chi² says "significant?" (any drift is, at
    * scale), q231's KS sees only the worst single quantile; PSI is
    * the industry's symmetric, per-bin-attributable drift score with
    * fixed action thresholds (< 0.1 stable, > 0.25 act — 100 000 /
    * 250 000 in the u6 scale here). Split: the day span's integer
    * midpoint (a pure date function — both engines derive the same
    * cut). Bins: q252's fixed 10-band value grid, add-one smoothed on
    * BOTH sides over the FULL grid so an empty band contributes a
    * finite, attributable term instead of ±∞ (the standard PSI
    * practice; smoothing is part of the statistic's definition here
    * and applied identically on both engines). Each band's term
    * micro-quantizes from exact counts before the order-immune sum
    * (the q241/q252 discipline); output is band grain — the
    * actionable "WHICH bins moved" view, Σterm_u6 = the headline
    * PSI. */
  val psiDrift: Q = Q(
    "q292_psi_drift",
    """WITH b AS (SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS band,
      |             CAST(ts AS DATE) AS day
      |           FROM events),
      |cut AS (SELECT min(day)
      |          + CAST(date_diff('day', min(day), max(day)) // 2 AS INTEGER)
      |          AS cutday FROM b),
      |c AS (SELECT band,
      |        CAST(sum(CASE WHEN day <= cutday THEN 1 ELSE 0 END)
      |          AS BIGINT) AS ca,
      |        CAST(sum(CASE WHEN day > cutday THEN 1 ELSE 0 END)
      |          AS BIGINT) AS cb
      |      FROM b CROSS JOIN cut GROUP BY 1),
      |g AS (SELECT r.range AS band, coalesce(c.ca, 0) + 1 AS sa,
      |             coalesce(c.cb, 0) + 1 AS sb
      |      FROM range(0, 10) r LEFT JOIN c ON c.band = r.range),
      |tot AS (SELECT CAST(sum(sa) AS BIGINT) AS na,
      |               CAST(sum(sb) AS BIGINT) AS nb FROM g)
      |SELECT CAST(g.band AS BIGINT) AS band,
      |       CAST(g.sa - 1 AS BIGINT) AS n_first,
      |       CAST(g.sb - 1 AS BIGINT) AS n_second,
      |       CAST(round(1000000.0
      |         * (CAST(g.sa AS DOUBLE) / tot.na
      |            - CAST(g.sb AS DOUBLE) / tot.nb)
      |         * ln(CAST(g.sa AS DOUBLE) * tot.nb
      |              / (CAST(g.sb AS DOUBLE) * tot.na)))
      |         AS BIGINT) AS term_u6
      |FROM g CROSS JOIN tot""".stripMargin
  ) { (s, dir) =>
    val b = t(s, dir, "events")
      .select(least(floor(col("value") / 50).cast(LongType), lit(9L))
        .as("band"), to_date(col("ts")).as("day"))
    val cut = b.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("date_add(dmin, CAST(datediff(dmax, dmin) div 2 AS INT))")
        .as("cutday"))
    val c = b.crossJoin(broadcast(cut))
      .groupBy("band")
      .agg(sum(when(col("day") <= col("cutday"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("day") > col("cutday"), 1L).otherwise(0L)).as("cb"))
    val g = s.range(0, 10).toDF("band")
      .join(broadcast(c), Seq("band"), "left")
      .select(col("band"),
        (coalesce(col("ca"), lit(0L)) + 1L).as("sa"),
        (coalesce(col("cb"), lit(0L)) + 1L).as("sb"))
    val tot = g.agg(sum(col("sa")).as("na"), sum(col("sb")).as("nb"))
    g.crossJoin(broadcast(tot))
      .select(col("band"),
        (col("sa") - 1L).as("n_first"), (col("sb") - 1L).as("n_second"),
        round(lit(1000000.0)
          * (col("sa").cast("double") / col("na")
            - col("sb").cast("double") / col("nb"))
          * log(col("sa").cast("double") * col("nb")
            / (col("sb").cast("double") * col("na"))))
          .cast(LongType).as("term_u6"))
  }

  /** q313: Q-Q DECILE table, each source vs the rest of the corpus —
    * the distribution-drift face the scalar tests compress away: q226
    * KS gives one max-gap number and q222 MW one shift z; this emits
    * the nine decile pairs (x_src(q), x_rest(q)) per source, i.e. the
    * Q-Q plot a reviewer actually reads to see WHERE a source's
    * length distribution departs (head, body, or tail). qq_gap > 0 at
    * high deciles with ≈0 elsewhere = a long-tail source; uniform
    * offset = a shifted one.
    *
    * Scale shape: everything runs at (source × distinct value) GRID
    * grain — the global cumulative rides the range-partitioned prefix
    * sum over the value table (never a partition-less window on the
    * Spark side), per-source cumulatives are keyed windows on the
    * grid, and the rest-of-corpus cumulative is cc_all − cc_s by
    * complement, so no second histogram pass. Deciles are exact lower
    * quantiles via integer comparisons (10·cc ≥ d·n) — pure integer
    * arithmetic end to end, the q287 p50 pattern generalized. */
  val qqDeciles: Q = Q(
    "q313_qq_deciles",
    """WITH f AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
      |hs AS (SELECT source, x, CAST(count(*) AS BIGINT) AS cs
      |       FROM f GROUP BY 1, 2),
      |hall AS (SELECT x, CAST(sum(cs) AS BIGINT) AS call FROM hs GROUP BY 1),
      |ca AS (SELECT x, CAST(sum(call) OVER (ORDER BY x) AS BIGINT) AS cc_all
      |       FROM hall),
      |srcs AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_s
      |         FROM hs GROUP BY 1),
      |tot AS (SELECT CAST(sum(call) AS BIGINT) AS n FROM hall),
      |grid AS (SELECT s.source, ca.x, COALESCE(hs.cs, 0) AS cs,
      |                ca.cc_all, s.n_s, tot.n
      |         FROM srcs s CROSS JOIN ca CROSS JOIN tot
      |         LEFT JOIN hs ON hs.source = s.source AND hs.x = ca.x),
      |cum AS (SELECT source, x, cc_all, n_s, n,
      |          CAST(sum(cs) OVER (PARTITION BY source ORDER BY x) AS BIGINT)
      |            AS cc_s
      |        FROM grid),
      |dec AS (SELECT unnest(range(1, 10)) AS decile)
      |SELECT c.source, CAST(d.decile AS BIGINT) AS decile,
      |       CAST(min(CASE WHEN 10 * c.cc_s >= d.decile * c.n_s
      |                THEN c.x END) AS BIGINT) AS x_src,
      |       CAST(min(CASE WHEN 10 * (c.cc_all - c.cc_s)
      |                     >= d.decile * (c.n - c.n_s)
      |                THEN c.x END) AS BIGINT) AS x_rest,
      |       CAST(min(CASE WHEN 10 * c.cc_s >= d.decile * c.n_s
      |                THEN c.x END)
      |            - min(CASE WHEN 10 * (c.cc_all - c.cc_s)
      |                       >= d.decile * (c.n - c.n_s)
      |                  THEN c.x END) AS BIGINT) AS qq_gap
      |FROM cum c CROSS JOIN dec d GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val hs = t(s, dir, "documents")
      .select(col("source"), col("n_chars").cast(LongType).as("x"))
      .groupBy("source", "x").agg(count(lit(1)).as("cs"))
      .localCheckpoint(true) // (source × distinct value), 3 consumers
    val hall = hs.groupBy("x").agg(sum(col("cs")).as("call"))
    val ca = graft.operators.Ranks.globalRunningSum(
      hall, Seq(col("x")), col("call"), "cc_all").drop("call")
    val srcs = hs.groupBy("source").agg(sum(col("cs")).as("n_s"))
    val tot = hall.agg(sum(col("call")).as("n"))
    val grid = ca.crossJoin(broadcast(srcs)).crossJoin(broadcast(tot))
      .join(hs, Seq("source", "x"), "left")
      .select(col("source"), col("x"), coalesce(col("cs"), lit(0L)).as("cs"),
        col("cc_all"), col("n_s"), col("n"))
    val cum = grid.withColumn("cc_s",
      sum(col("cs")).over(Window.partitionBy("source").orderBy("x")))
    cum.crossJoin(broadcast(s.range(1, 10).select(col("id").as("decile"))))
      .groupBy("source", "decile")
      .agg(
        min(when(lit(10) * col("cc_s") >= col("decile") * col("n_s"),
          col("x"))).as("x_src"),
        min(when(lit(10) * (col("cc_all") - col("cc_s"))
          >= col("decile") * (col("n") - col("n_s")), col("x"))).as("x_rest"))
      .select(col("source"), col("decile"), col("x_src"), col("x_rest"),
        (col("x_src") - col("x_rest")).as("qq_gap"))
  }

  val all: Seq[Q] =
    Seq(marketHhi, ksTest, kendallTau, eventEntropy, vocabJsd,
      leadLag, theilIndex, fanoFactor, mannKendall, senSlope, mutualInfo,
      hillDiversity, permutationEntropy, psiDrift, qqDeciles)
}
