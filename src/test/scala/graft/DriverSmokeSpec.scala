package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Simulates the driver's smoke check: `SparkEntry.entry` invoked on a
  * VANILLA session (none of GraftSession's configs — no nanosAsLong, no
  * extensions). entry() must not depend on graft session setup. */
class DriverSmokeSpec extends AnyFunSuite {
  test("entry() returns rows under a vanilla SparkSession") {
    // note: getOrCreate may reuse SharedSpark's session if it exists;
    // build an isolated one the way an external driver would
    val vanilla = SparkSession.builder()
      .master("local[2]")
      .appName("driver-smoke")
      .getOrCreate()
    try {
      val n = SparkEntry.entry(vanilla).count()
      assert(n > 0)
    } finally ()
  }
}
