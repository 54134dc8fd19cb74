package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; `lazy val`
  * in a trait resolves to the same underlying SparkSession). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session(cores = 8)
  val sf  = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}
