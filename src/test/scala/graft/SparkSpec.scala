package graft

import org.apache.spark.sql.SparkSession

/** Shared session for all suites (getOrCreate → one JVM-wide session). */
trait SparkSpec {
  lazy val spark: SparkSession = Engine.session("graft-test", "local[4]", 4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
