package graft

import org.apache.spark.sql.SparkSession

/** One shared tuned session for the whole forked test JVM. */
object TestSession {
  lazy val spark: SparkSession = {
    val s = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[4]").appName("graft-test"),
      shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
