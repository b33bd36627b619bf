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

    // the INDEXED streaming sink (round-10 verdict item 8): per-batch
    // frozen-codebook encode + idempotent promote into a persisted
    // IVFADC layout — the continuous-ingest face of the ANN family.
    // Fed synthetic 64-d vectors (seq-derived, deterministic); the
    // standing index is built once from sf0.01 embeddings, untimed.
    locally {
      import org.apache.spark.sql.functions._
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.01")
      val root = java.nio.file.Files
        .createTempDirectory("graft_stream_ivf").toString
      val idx = s"$root/index"
      vector.Similarity.buildIvfAdcIndex(
        Tables.load(spark, sfDir, "embeddings"),
        "vec_id", "embedding", idx)
      val vPer = math.max(per / 10, 1000) // encode-heavy: 10% the row diet
      val mem = MemoryStream[Long]
      val q = streaming.EventStream.sinkIvfAdcAppend(
        mem.toDF().toDF("vec_id")
          .withColumn("embedding",
            transform(sequence(lit(0), lit(63)), j =>
              (pmod(col("vec_id") * 64 + j, lit(1009L)) - 504L)
                .cast("double") / 8.0)),
        idx, s"$root/ckpt")
      mem.addData((1000000L until 1001000L))
      q.processAllAvailable() // warm batch: JIT + codebook broadcast
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        val base = 2000000L + b.toLong * vPer
        mem.addData(base until (base + vPer))
        q.processAllAvailable()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"[stream] ivfadc_append rows=${vPer * batches} " +
        f"batches=$batches time=$dt%.2f s " +
        f"throughput=${vPer * batches / dt}%.0f rows/s")
    }
    spark.stop()
  }
}
