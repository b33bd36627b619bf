package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratch — isolate the per-row cost of the props JSON extraction
// that the q100/q123/q127 family pays (get_json_object vs from_json vs
// a substring parse), on the real events table.
object DevJsonCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.load(spark, dir, "events").cache()
    println(s"rows=${ev.count()} partitions=${ev.rdd.getNumPartitions}")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag%-28s rep$i n=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("baseline value sum") {
      ev.agg(sum(col("value"))).head(); ev.count()
    }
    time("get_json_object") {
      ev.filter(get_json_object(col("props"), "$.k").cast("long").isNotNull).count()
    }
    time("from_json") {
      ev.filter(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
        .getField("k").isNotNull).count()
    }
    time("regexp_extract") {
      ev.filter(regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1)
        .cast("long").isNotNull).count()
    }
    // bisect amihud: which stage of the q123 pipeline carries the 5 s?
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val evq = ev.filter(col("value").isNotNull)
      .withColumn("qty", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("qty").isNotNull)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    time("amihud full") {
      graft.ops.Stats.amihudIlliquidity(evq, "event_type",
        Seq(col("ts"), col("event_id")), col("value"), col("qty"),
        to_date(col("ts"))).count()
    }
    time("window lag only") {
      evq.withColumn("_pv", lag(col("value"), 1).over(w))
        .filter(col("_pv").isNotNull).count()
    }
    def tickRet = {
      val v = col("value").cast(DecimalType(18, 6))
      val prev = lag(v, 1).over(w)
      when(prev > 0,
        round((v - prev).cast("double") / prev.cast("double"), 9)
          .cast(DecimalType(16, 9)))
    }
    time("tickReturn only") {
      evq.withColumn("_r", tickRet)
        .filter(col("_r").isNotNull).count()
    }
    val dollar = (col("value").cast(DecimalType(18, 6)) *
      col("qty").cast(DecimalType(18, 6))).cast(DecimalType(38, 12))
    time("tickReturn + quotient") {
      evq.withColumn("_r", tickRet)
        .withColumn("_dv", dollar)
        .filter(col("_r").isNotNull && col("_dv") > 0)
        .withColumn("_il",
          round(abs(col("_r")).cast("double") / col("_dv").cast("double"), 12)
            .cast(DecimalType(32, 12)))
        .filter(col("_il").isNotNull).count()
    }
    time("quotient + groupBy sum") {
      evq.withColumn("_r", tickRet)
        .withColumn("_dv", dollar)
        .filter(col("_r").isNotNull && col("_dv") > 0)
        .withColumn("_il",
          round(abs(col("_r")).cast("double") / col("_dv").cast("double"), 12)
            .cast(DecimalType(32, 12)))
        .groupBy(col("event_type"), to_date(col("ts")).as("b"))
        .agg(count(lit(1)), sum(col("_il"))).count()
    }
    spark.stop()
  }
}
