package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.{DamerauLevenshtein, JaroWinkler}
import graft.functions.expressions.GraftExpressions.{damerauLevenshtein, jaroWinkler}
import org.apache.spark.unsafe.types.UTF8String

/** The fuzzy-key matcher expressions behind q235/q236: algorithm
  * pins (the unrestricted-vs-OSA distinction, the Winkler boost
  * threshold), a brute-force cross-check for DL, and codegen/eval
  * agreement through a real DataFrame plan. */
class ResolutionSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("DL: unrestricted Damerau (Lowrance-Wagner), not OSA") {
    // the discriminating case: OSA forbids editing a transposed pair
    // again and answers 3; the unrestricted variant moves 'c' across
    // and answers 2 — DuckDB's damerau_levenshtein (the q235 oracle)
    // answers 2
    assert(dl("ca", "abc") == 2)
    assert(dl("a cat", "an act") == 2)
    assert(dl("", "") == 0 && dl("", "abc") == 3 && dl("abc", "") == 3)
    assert(dl("abc", "abc") == 0)
    assert(dl("abc", "acb") == 1)  // one transposition
    assert(dl("abcdef", "abcfad") == 3)
  }

  test("DL properties vs plain Levenshtein on random word-grammar strings") {
    val rnd = new scala.util.Random(42)
    val vocab = "abcdeg "
    def randStr(): String =
      (0 until (1 + rnd.nextInt(9))).map(_ => vocab(rnd.nextInt(vocab.length))).mkString
    val pairs = Seq.fill(400)((randStr(), randStr()))
    // Levenshtein via Spark's built-in (codepoint == byte on this
    // ASCII alphabet)
    import spark.implicits._
    val lev = pairs.toDF("a", "b")
      .select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("lev"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    pairs.foreach { case (a, b) =>
      val d = dl(a, b)
      assert(d <= lev((a, b)), s"DL > Levenshtein for ($a, $b)")
      assert(d >= math.abs(a.length - b.length))
      assert(d == dl(b, a), s"asymmetric for ($a, $b)")
      assert((d == 0) == (a == b))
    }
  }

  test("JW: classic fixture values and the 0.7 boost threshold") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    // below the 0.7 threshold the shared 3-byte prefix must NOT boost:
    // the score equals raw jaro
    val j = jw("abcxxxxx", "abcyyyyyyyy")
    assert(j == 0.5492424242424242, s"boost applied below threshold: $j")
    assert(jw("same", "same") == 1.0)
    assert(jw("", "x") == 0.0 && jw("x", "") == 0.0)
  }

  test("JW bounds and symmetry on random strings") {
    val rnd = new scala.util.Random(7)
    def randStr(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    Seq.fill(400)((randStr(), randStr())).foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of bounds for ($a, $b): $s")
      assert(s == jw(b, a), s"asymmetric for ($a, $b)")
      assert((s == 1.0) == (a == b) || a == b)
    }
  }

  test("codegen path (DataFrame plan) agrees with direct eval") {
    import spark.implicits._
    val names = graft.sources.Tables.load(spark, sf, "part")
      .select("p_name").distinct().as[String].collect()
    val pairs = for (a <- names; b <- names if a < b) yield (a, b)
    val viaPlan = pairs.toSeq.toDF("a", "b")
      .select(col("a"), col("b"),
        damerauLevenshtein(col("a"), col("b")).as("d"),
        jaroWinkler(col("a"), col("b")).as("j"))
      .collect()
    viaPlan.foreach { r =>
      assert(r.getInt(2) == dl(r.getString(0), r.getString(1)))
      assert(r.getDouble(3) == jw(r.getString(0), r.getString(1)))
    }
  }
}
