package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One hashed observation for a keyed distinct-count sketch. */
final case class KeyedHash(key: String, h: Long)

/** Persisted KMV state: the k smallest distinct hashes (ascending)
  * plus a per-key monotone emission version — the "log offset" a
  * latest-per-key consumer ([[graft.state.KeyedStore.serveToStore]])
  * orders on. */
final case class KmvState(mins: Seq[Long], ver: Long)

/** One live sketch reading: kept mins, the k-th min (0 while the
  * sketch is unsaturated), the cardinality estimate, and the key's
  * monotone emission version. */
final case class KmvPoint(key: String, nSk: Int, hK: Long, est: Long,
    ver: Long)

/** Streaming twin of q259's KMV distinct sketch — the live
  * distinct-users-per-key dashboard: each micro-batch's (key, hash)
  * rows fold into the key's k smallest distinct hashes and the key
  * re-emits its cardinality estimate, refining toward the batch
  * answer as events stream in.
  *
  * The duality here is STRONGER than the EWMA/entropy trackers': a
  * set of k mins is a pure function of the SET of values seen —
  * order-immune AND duplicate-immune — so the final emission is
  * bit-identical to the batch `KmvMins` aggregate under any
  * micro-batch split, any arrival order, and any replay of already-
  * seen rows (at-least-once delivery cannot move a min). KmvStreamSpec
  * proves it against q259's registered output.
  *
  * Scale: state is ≤ k longs per key (2 KB at k = 256), keyed by the
  * dashboard dimension whose cardinality is bounded by construction;
  * `NoTimeout` retention is a constant of the dimension, not a leak.
  * Partitioned by key; no global state, no driver loop. */
object KmvTracker extends Serializable {

  /** q259's estimator: exact below saturation, (k-1)·2^48/U_(k) at it.
    * (k-1)·2^48 is a Long product: k ≤ 32768 keeps it inside int64
    * ((2^15)·2^48 = 2^63-ε) — enforced here, not assumed, so a large-k
    * caller fails loudly instead of reading a wrapped estimate. */
  private[graft] def estimate(mins: Seq[Long], k: Int): Long = {
    require(k <= 32768, s"KMV estimator needs k <= 32768 " +
      s"((k-1)*2^48 must fit int64), got $k")
    if (mins.size < k) mins.size.toLong
    else (k - 1).toLong * 281474976710656L / mins.last
  }

  def track(in: Dataset[KeyedHash], k: Int): Dataset[KmvPoint] = {
    require(k > 0, s"KMV needs k > 0, got $k")
    require(k <= 32768, s"KMV needs k <= 32768 " +
      s"((k-1)*2^48 must fit int64), got $k")
    val spark = in.sparkSession
    import spark.implicits._
    def advance(key: String, rows: Iterator[KeyedHash],
        gs: GroupState[KmvState]): Iterator[KmvPoint] = {
      val set = new java.util.TreeSet[java.lang.Long]()
      val ver = gs.getOption.map(_.ver).getOrElse(0L) + 1
      gs.getOption.foreach(_.mins.foreach(v => set.add(v)))
      rows.foreach { r =>
        if (set.size < k) { set.add(r.h); () }
        else if (r.h < set.last()) {
          if (set.add(r.h)) { set.pollLast(); () }
        }
      }
      val mins = {
        val b = Seq.newBuilder[Long]
        set.forEach(v => b += v.longValue())
        b.result()
      }
      gs.update(KmvState(mins, ver))
      Iterator(KmvPoint(key, mins.size,
        if (mins.size < k) 0L else mins.last, estimate(mins, k), ver))
    }
    in.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(advance)
  }
}
