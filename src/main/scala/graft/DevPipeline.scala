package graft

import org.apache.spark.sql.functions._

// dev scratch — reference-workload stress run (200 coins × 30 days,
// generator → bronze → silver → gold → csv), the workload the reference
// runs via run_pipeline.ps1 at STRESS_TEST_COINS=200/STRESS_TEST_DAYS=30
object DevPipeline {
  def main(args: Array[String]): Unit = {
    val coins = args.headOption.map(_.toInt).getOrElse(200)
    val days = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val base = java.nio.file.Files.createTempDirectory("medallion").toString
    val spark = engine.Sessions.local("graft-pipeline", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def lap(tag: String, from: Long): Long = {
      val now = System.nanoTime()
      println(f"[stage] $tag%-18s ${(now - from) / 1e9}%.2f s")
      now
    }
    // bronze: synthetic ticks, date-partitioned accumulating write
    val bronze = ops.Ingest.generate(spark, coins, days,
      startEpoch = 1704067200L, seed = 42L)
    // co-locate each date before the partitioned write: without this,
    // every date dir gets one file per shuffle partition (days × shuffle
    // tiny files — the small-files problem that kills scan throughput)
    engine.Layout.upsertPartitions(engine.Layout.colocated(bronze), s"$base/bronze")
    val t1 = lap("bronze", t0)
    // silver: typed casts + keep-latest dedup, recomputed from bronze
    val silver = ops.Clean.silverCasts(
      ops.Clean.dedupLatest(
        spark.read.parquet(s"$base/bronze"),
        Seq("id", "last_updated"), "_ingested_at"),
      "current_price", "market_cap")
    engine.Layout.upsertPartitions(engine.Layout.colocated(silver), s"$base/silver")
    val t2 = lap("silver", t1)
    // maintenance: sort-clustered compaction of all touched partitions
    val dates = spark.read.parquet(s"$base/silver")
      .select("partition_date").distinct().collect().map(_.get(0).toString)
    // maintenance retried like the reference's OPTIMIZE (3×, 5 s backoff)
    engine.Orchestrate.retry(attempts = 3, backoffMs = 5000) {
      engine.Layout.compactPartitions(spark, s"$base/silver",
        Seq("symbol", "current_price", "market_cap"), dates.toSeq)
    }
    val t3 = lap("compact", t2)
    // gold: per-day top-10 by volume stats + single-file csv
    val gold = ops.Stats.dailyTopKStats(
      spark.read.parquet(s"$base/silver"),
      "partition_date", col("total_volume"), "market_cap", "current_price")
    engine.Layout.overwritePartitioned(gold.repartition(col("partition_date")), s"$base/gold")
    engine.Layout.singleCsv(spark.read.parquet(s"$base/gold").orderBy("partition_date"),
      s"$base/Final_Report.csv")
    // catalog registration under a hard 120 s timeout, composed the way
    // the reference guards its metastore thread (main_pipeline.py:305-318):
    // a hung metastore must not wedge the whole pipeline run
    engine.Orchestrate.withTimeout(120000L) {
      engine.Layout.registerTable(spark, "graft", "gold_daily_stats", s"$base/gold")
    } match {
      case Some(_) => ()
      case None => println("[stage] register           TIMED OUT (120 s) — run continues")
    }
    lap("gold+csv", t3)
    val rows = spark.read.parquet(s"$base/bronze").count()
    val goldRows = spark.read.parquet(s"$base/gold").count()
    println(f"[total] $rows rows bronze, $goldRows gold rows, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s end-to-end")
    spark.stop()
  }
}
