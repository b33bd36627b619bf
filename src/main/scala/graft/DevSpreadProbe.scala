package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratch — isolate where the media-hash time goes with/without the
// r15 scan spread (audio regressed while image improved; find out why).
object DevSpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.Media
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (rep <- 1 to 3) {
      // 1-partition variants (pre-r15 shape)
      val ids1 = docs.select(col("doc_id").cast("long")).coalesce(1).as[Long]
      val audio1 = ids1.mapPartitions(_.map(id =>
        Media.MediaRow(id, "wav", Media.AudioCodec.encodeWavBits(
          2 + java.lang.Math.floorMod(id, 3L).toInt, graft.multimodal.Media.spreadBitsDev(id)))))
        .toDF()
      time(s"rep$rep audio encode+decode 1-part") {
        Media.audioHashes(spark, audio1).toDF().write.format("noop")
          .mode("overwrite").save()
      }
      val idsN = docs.select(col("doc_id").cast("long"))
        .repartition(cpus.toInt).as[Long]
      val audioN = idsN.mapPartitions(_.map(id =>
        Media.MediaRow(id, "wav", Media.AudioCodec.encodeWavBits(
          2 + java.lang.Math.floorMod(id, 3L).toInt, graft.multimodal.Media.spreadBitsDev(id)))))
        .toDF()
      time(s"rep$rep audio encode+decode $cpus-part") {
        Media.audioHashes(spark, audioN).toDF().write.format("noop")
          .mode("overwrite").save()
      }
      val img1 = ids1.mapPartitions(_.map(id =>
        Media.MediaRow(id, "png", Media.ImageCodec.encodePngBits(
          1 + java.lang.Math.floorMod(id, 3L).toInt, graft.multimodal.Media.spreadBitsDev(id)))))
        .toDF()
      time(s"rep$rep image encode+decode 1-part") {
        Media.imageHashes(spark, img1).toDF().write.format("noop")
          .mode("overwrite").save()
      }
      val imgN = idsN.mapPartitions(_.map(id =>
        Media.MediaRow(id, "png", Media.ImageCodec.encodePngBits(
          1 + java.lang.Math.floorMod(id, 3L).toInt, graft.multimodal.Media.spreadBitsDev(id)))))
        .toDF()
      time(s"rep$rep image encode+decode $cpus-part") {
        Media.imageHashes(spark, imgN).toDF().write.format("noop")
          .mode("overwrite").save()
      }
      // the pair join downstream, audio
      time(s"rep$rep audio exact pairs (1-part hashes)") {
        Media.audioHashExactPairs(spark, audio1).write.format("noop")
          .mode("overwrite").save()
      }
      time(s"rep$rep audio exact pairs ($cpus-part hashes)") {
        Media.audioHashExactPairs(spark, audioN).write.format("noop")
          .mode("overwrite").save()
      }
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
