package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all specs (one JVM-wide session via
  * getOrCreate; local[4] keeps test latency down).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = Session.builder(master = "local[4]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))
}
