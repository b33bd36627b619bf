package graft
import org.apache.spark.sql.SparkSession
object DevLoadTrace {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def probe(label: String)(f: => Unit): Unit = {
      Thread.sleep(200); val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      Thread.sleep(200)
      println(f"[loadtrace] $label%-40s ${(System.nanoTime()-t0)/1e9}%7.3f s jobs=${jobs.get()-j0}")
    }
    probe("load documents (no action)") {
      Tables.load(spark, "/root/testdata/sf0.1", "documents") }
    probe("load documents again (no action)") {
      Tables.load(spark, "/root/testdata/sf0.1", "documents") }
    probe("load events (no action)") {
      Tables.load(spark, "/root/testdata/sf0.1", "events") }
    probe("count documents") {
      Tables.load(spark, "/root/testdata/sf0.1", "documents").count() }
    spark.stop()
  }
}
