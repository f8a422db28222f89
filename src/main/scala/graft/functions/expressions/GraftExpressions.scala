package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * are CodegenFallback — evaluated interpretively per element, which
  * dominates wall-clock when a join emits millions of candidate pairs.
  * These expressions run the inner loop as one compiled call per row:
  * `DotProductL` participates in whole-stage codegen; `MinHashSig` does
  * its k×n work in a single tight JVM loop per row.
  */

/** Exact integer dot product of two `array<bigint>` columns (the
  * quantized-embedding hot path of q30/q31/q32). Whole-stage codegen:
  * one fused loop, no per-element virtual calls.
  *
  * Null semantics MATCH the declarative
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0L, (acc,x)=>acc+x)` form —
  * null result on length mismatch or any null element — so
  * `RewriteDotProduct` may substitute this expression soundly. */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct hashed word n-gram shingles of an `array<string>` token
  * list, as `array<bigint>` (sorted). One pass per row: each word is
  * XXH64-hashed once, each n-window identity is a seed-chained hash of
  * its word hashes — no shingle strings are ever materialized. Replaces
  * an interpreted transform+concat lambda that cost ~50× (collision
  * odds over ~10^5 shingles: ~1e-9, irrelevant to set semantics). */
case class ShingleHashes(child: Expression, n: Int, ordered: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = words.getUTF8String(i)
      wh(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var acc = 42L
      var j = 0
      while (j < n) { acc = XXH64.hashLong(wh(i + j), acc); j += 1 }
      out(i) = acc
      i += 1
    }
    // ordered = document-position order (winnowing input);
    // default = sorted distinct (set semantics for Jaccard/MinHash)
    if (ordered) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of an `array<string>` shingle set: k independent
  * hash functions derived from one XXH64 base hash per shingle +
  * splitmix64 finalizers — k×n hashing in one eval call per row instead
  * of k interpreted `transform`s (the q28 hot path). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => MinHashSig.mix(j.toLong * 0x9e3779b97f4a7c15L + 1L))

  private lazy val elementsAreHashes: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base =
        if (elementsAreHashes) arr.getLong(i)
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var j = 0
      while (j < k) {
        val h = MinHashSig.mix(base ^ seeds(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Distinct sliding-window minima of an `array<bigint>` (the winnowing
  * sketch inner loop, SIGMOD'03): minimum of every length-`w` window in
  * position order, deduplicated keeping first occurrence. Semantically
  * identical to `array_distinct(transform(sequence(1, n-w+1), i ->
  * array_min(slice(hs, i, w))))` but one O(n) monotonic-deque pass per
  * row instead of an interpreted O(n·w) HOF chain (the q40 hot path). */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = hs.getLong(i); i += 1 }
    val mins = new Array[Long](n - w + 1)
    val dq = new Array[Int](n) // monotonic deque of indices, values increasing
    var head = 0
    var tail = 0
    i = 0
    while (i < n) {
      while (tail > head && arr(dq(tail - 1)) >= arr(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = arr(dq(head))
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](mins.length * 2)
    val res = new Array[Long](mins.length)
    var k = 0
    i = 0
    while (i < mins.length) {
      if (seen.add(mins(i))) { res(k) = mins(i); k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(res, k))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Highest multiplicity of any element in an `array<bigint>` — the
  * repetition-score inner loop (max n-gram count per document, the
  * Gopher/C4 duplicate-n-gram quality signal). One hashmap pass per
  * row; 0 for an empty array. The declarative form would be an
  * explode + two shuffles or an interpreted O(n²) HOF. Null elements
  * are skipped (not counted as 0). */
case class MaxMultiplicity(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[java.lang.Long, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val c = counts.merge(arr.getLong(i), 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Occurrences of any of a fixed marker set in an `array<string>` token
  * list (language-ID scores, stopword counts — the q24/q25 hot path).
  * Counts OCCURRENCES, not distinct markers (stopwords repeat), exactly
  * like `size(filter(ws, w -> w.isin(markers)))` — which is an
  * interpreted per-element HOF running an `In` over the marker literals
  * per token (~50× the scan cost). One hash-set probe per token here. */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && markerSet.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Frequency-weighted 64-bit SimHash of an `array<string>` token list:
  * every occurrence votes ±1 per bit position, signature bit = sign of
  * the tally — one pass per row instead of a 64×-explode + two shuffles
  * (the q29 hot path). */
case class SimHashSig(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points. */
object GraftExpressions {

  def dotQFast(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductL(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))

  def simhashSig(tokens: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(tokens)))

  def shingleHashes(words: Column, n: Int = 3, ordered: Boolean = false): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(words), n, ordered))

  def winnowMins(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowMins(ColumnBridge.expression(hashes), w))

  def markerCount(words: Column, markers: Seq[String]): Column =
    ColumnBridge.column(MarkerCount(ColumnBridge.expression(words), markers))

  def maxMultiplicity(hashes: Column): Column =
    ColumnBridge.column(MaxMultiplicity(ColumnBridge.expression(hashes)))

  /** Register for SQL use (`SELECT graft_dot_q(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot_q",
      exprs => DotProductL(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
  }
}
