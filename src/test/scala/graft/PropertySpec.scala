package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.core._
import graft.streaming.{DailyAgg, DeltaTracker, NewsDedup}

/** ScalaCheck invariants from SURVEY.md §5.4: delta-tracker conservation,
  * dedup idempotence, window-sum equivalence. Generators are small (each
  * case runs Spark jobs) but seeds vary across the configured runs. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, runs: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(runs), prop)
    assert(res.passed, res.status.toString)
  }

  private val day = 86400000L
  private val t0 = 1585699200000L // 2020-04-01T00:00:00Z (epoch, TZ-independent)

  private val snapshotsGen: Gen[List[(String, List[Long])]] = for {
    states <- Gen.someOf(Seq("Assam", "Delhi", "Kerala", "Goa")).map(_.toList)
      .suchThat(_.nonEmpty)
    perState <- Gen.listOfN(states.size, Gen.listOfN(4, Gen.chooseNum(0L, 10000L)))
  } yield states.zip(perState.map(_.sorted)) // totals are monotone snapshots

  test("delta tracker conserves totals: sum of deltas = final total per key") {
    import spark.implicits._
    check(Prop.forAll(snapshotsGen) { snaps =>
      val rows = for {
        (state, totals) <- snaps
        (total, i) <- totals.zipWithIndex
      } yield StampedStats(new Timestamp(t0 + i * 3600000L),
        StatewiseStats("0", total.toString, "0", "0", state, "XX", s"t$i"))
      val out = DeltaTracker.statewise(rows.toDS()).collect()
      snaps.forall { case (state, totals) =>
        val deltas = out.filter(_.delta.state == state).map(_.delta.deltaConfirmed)
        deltas.length == totals.length && deltas.sum == totals.last
      }
    })
  }

  private val eventTimesGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 20L * day)).map(_.distinct.sorted)
      .suchThat(_.nonEmpty)

  test("TTL dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    import spark.implicits._
    val ttl = 7 * day
    check(Prop.forAll(eventTimesGen) { times =>
      val p = PatientInfo(currentstatus = "H", detectedstate = "Assam", source1 = "s")
      val in = times.map(t => StampedPatient(new Timestamp(t0 + t), p)).toDS()
      val once = NewsDedup.dedupWithTtl(in, ttl).collect().toSet
      val twice = NewsDedup.dedupWithTtl(
        spark.createDataset(once.toSeq), ttl).collect().toSet
      twice == once
    }, runs = 8)
  }

  test("windowed daily agg equals a batch groupBy-by-date over the same deltas") {
    import spark.implicits._
    check(Prop.forAll(eventTimesGen) { times =>
      val deltas = times.zipWithIndex.map { case (t, i) =>
        StampedDelta(new Timestamp(t0 + t),
          StatewiseDelta(deltaConfirmed = i + 1L, currentConfirmed = 100L + i,
            state = "Assam"))
      }
      val windowed = DailyAgg.statewiseDaily(deltas.toDS())
        .select("date", "deltaConfirmed").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = deltas
        .groupBy { d =>
          val sdf = new java.text.SimpleDateFormat("dd/MM/yyyy")
          sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          sdf.format(new java.util.Date(d.eventTime.getTime))
        }
        .view.mapValues(_.map(_.delta.deltaConfirmed).sum).toMap
      windowed == expected
    }, runs = 8)
  }

  // --- round-5 training-pipeline operators vs brute-force references ---

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 12)
    texts <- Gen.listOfN(n,
      Gen.chooseNum(0, 9).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))))
  } yield texts.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  test("chunkDedup == brute-force first-occurrence reference on random corpora") {
    import spark.implicits._
    check(Prop.forAll(corpusGen) { corpus =>
      val cw = 2
      val got = graft.operators.Dedup
        .chunkDedup(corpus.toDF("doc_id", "text"), "text", "doc_id", chunkWords = cw)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      // reference: scan docs in id order, keep a chunk iff its text is
      // globally unseen (within-doc repeats count as seen too)
      val seen = scala.collection.mutable.Set[String]()
      val exp = corpus.map { case (id, text) =>
        val chunks = text.split(" ", -1).grouped(cw).map(_.mkString(" ")).toList
        val kept = chunks.filter(c => seen.add(c))
        id -> ((chunks.length.toLong, kept.length.toLong, kept.mkString(" ")))
      }.toMap
      got == exp
    }, runs = 8)
  }

  private val punctTextGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 8)
    texts <- Gen.listOfN(n,
      Gen.chooseNum(0, 12).flatMap(len =>
        Gen.listOfN(len,
          Gen.oneOf("a", "b", "cd", ".", "!", "?", " ", "..", "a.b"))))
  } yield texts.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString("")) }

  test("sentence-mode chunked == regex-split reference on random punctuated text") {
    import spark.implicits._
    check(Prop.forAll(punctTextGen) { corpus =>
      val got = graft.operators.Dedup
        .chunked(corpus.toDF("doc_id", "text"), "text", "doc_id",
          chunkWords = 8, splitSentences = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1)
        .map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toList }
      // reference: split on [.!?]+ runs, trim, drop empties; all-empty
      // docs keep the one-empty-chunk invariant; indexes are dense 0..n
      val exp = corpus.map { case (id, text) =>
        val sents = text.split("[.!?]+", -1).map(_.trim).filter(_.nonEmpty).toList
        id -> (if (sents.isEmpty) List("") else sents)
      }.toMap
      got == exp
    }, runs = 8)
  }

  test("exact hardNegatives == brute-force band/label top-k on random labeled vectors") {
    import spark.implicits._
    val vecGen: Gen[List[(Long, Int, List[Double])]] = for {
      n <- Gen.chooseNum(4, 14)
      rows <- Gen.listOfN(n, for {
        label <- Gen.chooseNum(0, 2)
        v <- Gen.listOfN(4, Gen.chooseNum(-5, 5).map(_.toDouble))
          .suchThat(_.exists(_ != 0.0)) // zero vectors have no cosine
      } yield (label, v))
    } yield rows.zipWithIndex.map { case ((l, v), i) => (i.toLong, l, v) }
    // NoShrink: shrinking truncates the inner vectors to ragged widths,
    // which violates the fixed-dims contract the operator requires
    check(Prop.forAllNoShrink(vecGen) { rows =>
      val df = rows.toDF("vec_id", "label", "embedding")
      val q = graft.operators.Similarity.quantize(df, "embedding", "vec_id")
        .join(df.select(col("vec_id"), col("label")), "vec_id")
      val (lo, hi, k) = (-0.5, 0.9, 2)
      val got = graft.operators.Similarity
        .hardNegatives(q, q.filter(col("vec_id") < 3), k, lo, hi)
        .collect()
        .map(r => (r.getLong(0), r.getAs[Number](3).longValue(), r.getLong(1)))
        .toSet
      // brute-force reference on the SAME quantized integers
      def qz(v: List[Double]) = v.map(x => math.floor(x * (1L << 20)).toLong)
      val byId = rows.map(r => r._1 -> ((r._2, qz(r._3)))).toMap
      def cos(a: List[Long], b: List[Long]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(b.map(x => x * x).sum.toDouble))
      }
      val exp = (for {
        (qid, (qlab, qv)) <- byId.toSeq if qid < 3
        cands = byId.toSeq
          .filter { case (nid, (nlab, _)) => nid != qid && nlab != qlab }
          .map { case (nid, (_, nv)) => (nid, cos(qv, nv)) }
          .filter { case (_, c) => c >= lo && c < hi }
          .sortBy { case (nid, c) => (-c, nid) }
          .take(k).zipWithIndex
        ((nid, _), pos) <- cands
      } yield (qid, pos + 1L, nid)).toSet
      got == exp
    }, runs = 8)
  }

  test("dupSpanStrip == brute-force keep-first span reference on random corpora") {
    import spark.implicits._
    check(Prop.forAll(corpusGen) { corpus =>
      val k = 2
      val got = graft.operators.Dedup
        .dupSpanStrip(corpus.toDF("doc_id", "text"), "text", "doc_id", spanWords = k)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      // reference: count every k-gram occurrence globally; every
      // occurrence of a gram with occ>1 EXCEPT the (doc_id, pos)-first
      // covers [p, p+k-1]; kept text = uncovered tokens in order
      val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toVector }
      val allGrams = for {
        (id, ws) <- toks
        p <- 0 to ws.length - k
      } yield (id, p, ws.slice(p, p + k).mkString(" "))
      val occ = allGrams.groupBy(_._3).view.mapValues(_.size).toMap
      val first = allGrams.groupBy(_._3).view
        .mapValues(_.minBy(x => (x._1, x._2))).toMap
      val exp = toks.map { case (id, ws) =>
        val covered = allGrams.collect {
          case (d, p, g) if d == id && occ(g) > 1 && first(g) != ((d, p, g)) =>
            p until p + k
        }.flatten.toSet
        val keptWs = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
        id -> ((ws.length.toLong, covered.size.toLong,
          (ws.length - covered.size).toLong, keptWs.mkString(" ")))
      }.toMap
      got == exp
    }, runs = 8)
  }

  test("bigramNll == brute-force add-one model on random corpora") {
    import spark.implicits._
    check(Prop.forAll(corpusGen) { corpus =>
      val got = graft.operators.LangModel
        .bigramNll(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      // brute-force reference over Scala collections, same quantization
      val toks = corpus.map { case (id, text) => id -> text.split(" ", -1).toList }
      val bigrams = toks.flatMap { case (id, ws) =>
        if (ws.length >= 2) ws.zip(ws.tail).map(id -> _) else Nil
      }
      val c2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val c1 = bigrams.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
      val v = toks.flatMap(_._2).distinct.size.toLong
      def nllQ(b: (String, String)): Long =
        math.round(-math.log((c2(b) + 1.0) / (c1(b._1) + v)) * 1000000.0)
      val exp = bigrams.groupBy(_._1).map { case (id, bs) =>
        val s = bs.map(b => nllQ(b._2)).sum
        id -> ((bs.size.toLong, s, s.toDouble / bs.size / 1000000.0))
      }
      got == exp
    }, runs = 8)
  }

  test("packSequences partitions every doc and fills every non-tail sequence") {
    import spark.implicits._
    val tokGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 23L)))
    check(Prop.forAll(tokGen) { toks =>
      val l = 7L
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tok")
      val rows = graft.operators.Sharding
        .packSequences(df, Seq(org.apache.spark.sql.functions.col("doc_id")),
          "n_tok", seqLen = l)
        .select("doc_id", "n_tok", "seq_id", "offset", "n_tok_in_seq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val total = toks.sum
      // guard against vacuous passes: a non-empty token stream must
      // produce rows (empty forall/groupBy would otherwise all hold)
      if (total > 0 && rows.isEmpty) throw new AssertionError("no rows packed")
      val bySeq = rows.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
      val seqOk = total == 0L || bySeq.forall { case (s, tok) =>
        if (s < (total - 1) / l) tok == l else tok == total - l * s
      }
      val docOk = rows.groupBy(_._1).forall { case (_, rs) =>
        rs.map(_._5).sum == rs.head._2 && rs.map(_._5).forall(_ > 0)
      }
      val zeroDropped = rows.forall(_._2 > 0)
      seqOk && docOk && zeroDropped
    }, runs = 8)
  }

  test("TopKByScore == window row_number ranking under (score desc, id asc)") {
    // q109's cross-engine contract: the bounded heap must emit exactly
    // the rows a row_number window over (score desc, id asc) would keep,
    // in the same order — including duplicate scores and duplicate
    // (score, id) pairs, where any tie-break ambiguity must not change
    // the emitted (rank, score) sequence.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rowsGen = Gen.listOf(for {
      g <- Gen.oneOf("a", "b")
      score <- Gen.chooseNum(0L, 5L) // narrow range forces score ties
      id <- Gen.chooseNum(0L, 9L)    // and occasional (score, id) dups
    } yield (g, score, id)).suchThat(_.nonEmpty)
    check(Prop.forAll(rowsGen) { rows =>
      val k = 4
      val df = rows.toDF("g", "score", "id")
      val heap = df.groupBy("g")
        .agg(graft.functions.expressions.GraftExpressions
          .topKByScore(col("score").cast("double"), col("id"), k).as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("pos", "p")))
        .select(col("g"), (col("pos") + 1).as("rn"),
          col("p.score").cast("long").as("score"), col("p.id").as("id"))
        .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
      val win = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .collect().map(r => (r.getString(0), r.getInt(3).toLong, r.getLong(1)))
      // compare (group, rank, score) multisets: with duplicate (score,id)
      // rows either copy may be emitted, but rank→score must agree
      heap.sorted.sameElements(win.sorted)
    }, runs = 8)
  }

  test("KmvMins == sorted distinct take-k, under any layout and duplication") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val E = graft.functions.expressions.GraftExpressions
    val gen = for {
      k <- Gen.chooseNum(1, 40)
      // duplicates likely (narrow value range) and a negative tail —
      // the buffer must order on the SIGNED long like the reference
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(-50L, 200L))
      parts <- Gen.chooseNum(1, 7)
    } yield (k, vs, parts)
    check(Prop.forAll(gen) { case (k, vs, parts) =>
      val got = vs.toDF("h").repartition(parts)
        .agg(E.kmvMins(col("h"), k).as("sk"))
        .select("sk").as[Seq[Long]].collect().head
      got == vs.distinct.sorted.take(k)
    }, runs = 10)
  }
}
