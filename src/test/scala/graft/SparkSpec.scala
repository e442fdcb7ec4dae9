package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; getOrCreate
  * makes every suite reuse it).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session(cores = 4)
  val sfDir = "/root/testdata/sf0.001"
}
