package graft

import org.apache.spark.sql.SparkSession

/** One shared tuned session for the whole forked test JVM. */
object TestSession {
  lazy val spark: SparkSession = {
    val s = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[4]").appName("graft-test")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString),
      shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
