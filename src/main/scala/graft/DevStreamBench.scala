package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Structured-streaming THROUGHPUT bench (round-8 verdict item 7): the
  * nine stream twins are equivalence-proven against their batch
  * operators, but never measured — this drives the three
  * state-heaviest sinks (ewma, order-flow imbalance, realized
  * variance) through MemoryStream micro-batches and reports rows/s,
  * so streaming regressions become visible round-over-round in
  * BASELINE.md.
  *
  * Usage: runMain graft.DevStreamBench [nRows] [nBatches] [nKeys]
  * Deterministic feed (seq-derived values) — run-to-run comparable.
  */
object DevStreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val nKeys = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      // streaming state ops shuffle per micro-batch: modest partition
      // count keeps per-batch overhead proportionate
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val per = n / batches
    def key(i: Int) = s"k${i % nKeys}"
    def value(i: Int) = 100.0 + (i % 37) * 0.25

    def run(name: String)(start: MemoryStream[(String, Long, Double, Double)]
        => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val mem = MemoryStream[(String, Long, Double, Double)]
      val q = start(mem)
      // warm batch (JIT + state-store init) outside the timing
      mem.addData((0 until 1000).map(i =>
        (key(i), i.toLong, value(i), 1.0 + (i % 5))))
      q.processAllAvailable()
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        mem.addData((0 until per).map { j =>
          val i = 1000 + b * per + j
          (key(i), i.toLong, value(i), 1.0 + (i % 5))
        })
        q.processAllAvailable()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"[stream] $name rows=${per * batches} batches=$batches " +
        f"time=$dt%.2f s throughput=${per * batches / dt}%.0f rows/s")
    }

    run("ewma") { mem =>
      streaming.EventStream.ewmaStream(spark,
          mem.toDF().toDF("sym", "seq", "price", "qty"),
          "sym", "seq", "price", 0.25)
        .writeStream.outputMode("update").format("memory")
        .queryName("bench_ewma").start()
    }
    run("ofi") { mem =>
      streaming.EventStream.flowImbalanceStream(spark,
          mem.toDF().toDF("sym", "seq", "price", "qty"),
          "sym", "seq", "price", "qty")
        .writeStream.outputMode("update").format("memory")
        .queryName("bench_ofi").start()
    }
    run("rv") { mem =>
      streaming.EventStream.realizedVarianceStream(spark,
          mem.toDF().toDF("sym", "seq", "price", "bucket")
            .withColumn("bucket", org.apache.spark.sql.functions
              .floor(org.apache.spark.sql.functions.col("seq") / 1000)),
          "sym", "seq", "price", "bucket")
        .writeStream.outputMode("update").format("memory")
        .queryName("bench_rv").start()
    }
    spark.stop()
  }
}
