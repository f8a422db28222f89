package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (Spark sessions are heavy;
  * suites must not stop() it). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local("4")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sf: String = "/root/testdata/sf0.001"
}
