package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One local session per suite (SURVEY §5 test strategy). */
trait SharedSpark { self: AnyFunSuite =>
  lazy val spark: SparkSession = graft.core.GraftSession.local("graft-test", cores = 4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
