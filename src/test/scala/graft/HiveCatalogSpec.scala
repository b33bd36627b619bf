package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** K5 external-metastore registration against a REAL Hive metastore
  * (`HiveExternalCatalog` on embedded Derby — the reference's
  * Postgres-backed metastore minus the network hop,
  * `main_pipeline.py:189-218`). Runs in its own forked JVM (see
  * `Test / testGrouping` in build.sbt): the catalog implementation of a
  * SparkSession is fixed at creation, so this suite cannot share
  * TestSession's in-memory-catalog session.
  */
class HiveCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val ms = Files.createTempDirectory("graft_metastore").toString
    val s = graft.engine.Sessions.tune(
      graft.engine.Sessions.withHiveMetastore(
        SparkSession.builder().master("local[2]").appName("graft-hive-test")
          .config("spark.sql.warehouse.dir",
            Files.createTempDirectory("graft-hive-warehouse").toString),
        ms),
      shufflePartitions = 2).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("registration lands in a Hive metastore and reads back through it") {
    import spark.implicits._
    // the session really is metastore-backed, not in-memory
    assert(spark.conf.get("spark.sql.catalogImplementation") === "hive")
    val dir = Files.createTempDirectory("graft_hive_reg").toString
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v").write.parquet(s"$dir/t")
    assert(graft.engine.Layout.registerTableGuarded(
      spark, "graft_ext", "hive_t", s"$dir/t"))
    assert(spark.table("graft_ext.hive_t").count() === 3)
    // the registration reached the external catalog (Hive DDL metadata),
    // not just the session's temp state
    val ext = spark.sharedState.externalCatalog.getTable("graft_ext", "hive_t")
    assert(ext.provider.contains("PARQUET"))
    assert(ext.location.toString.contains(dir.stripPrefix("/")))
  }

  test("a hung registration times out without failing the caller (120 s guard shape)") {
    val dir = Files.createTempDirectory("graft_hive_to").toString
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$dir/t")
    val ok = graft.engine.Orchestrate.withTimeout(200) {
      Thread.sleep(10000)
      graft.engine.Layout.registerTable(spark, "graft_ext", "never_t", s"$dir/t")
    }
    assert(ok === None) // timed out, caller continues — table unregistered
  }
}
