package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (JVM-wide; Spark sessions are
  * expensive). Same configs as the engine's [[Sessions.local]].
  */
object SparkTestSession {
  lazy val spark: SparkSession = Sessions.local("4", "graft-test")
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
}
