package graft

import org.apache.spark.sql.SparkSession

/** Child-process entry point for [[ConcurrencySpec]]: a REAL second
  * JVM with its own SparkSession racing the parent test JVM against
  * one shared index directory — the production failure mode for a
  * shared-filesystem index that in-process fault injection
  * (StagedReplaceSpec/DeleteSpec) cannot exercise (round-12 verdict
  * item #4). Modes:
  *
  *   - `compact <path> <millis>`: loop
  *     [[graft.engine.Layout.compactFlat]] over a flat table for at
  *     least `millis` wall-clock, printing `ROUND <start> <end>`
  *     nanotimes the parent uses to prove overlap;
  *   - `purge <indexPath>`: one
  *     [[graft.vector.Similarity.purgeIvfAdcIndex]], bracketed by
  *     `PURGE_START <ms>` / `PURGE_END <ms>` wall-clock millis.
  *
  * Prints `READY` once the session is up (the parent gates its racing
  * work on it) and `DONE` before exiting 0; any exception exits 1 with
  * the stack on stdout for the parent's failure message.
  */
object ConcurrencyWorker {
  def main(args: Array[String]): Unit = {
    try {
      val spark = graft.engine.Sessions.tune(
        SparkSession.builder().master("local[2]")
          .appName("graft-concurrency-worker"),
        shufflePartitions = 2).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      println("READY")
      Console.flush()
      args(0) match {
        case "compact" =>
          val path = args(1)
          val millis = args(2).toLong
          val deadline = System.currentTimeMillis() + millis
          // RawLocalFileSystem stats shell out to `ls`; a file the racing
          // appender removes mid-listing (its in-flight `_temporary`
          // committer scratch) surfaces as this transient. Retryable by
          // the staged protocol — the next round's entry heals any
          // partial state — and impossible on a real DFS, which stats
          // natively instead of shelling out.
          def localFsListingRace(t: Throwable): Boolean = {
            val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
              .take(8).flatMap(c => Option(c.getMessage)).mkString(" | ")
            msgs.contains("while running command to get file permissions") ||
              msgs.contains("No such file or directory") ||
              msgs.contains("_temporary")
          }
          while (System.currentTimeMillis() < deadline) {
            val t0 = System.currentTimeMillis()
            try {
              graft.engine.Layout.compactFlat(spark, path, targetFiles = 2)
              println(s"ROUND $t0 ${System.currentTimeMillis()}")
            } catch {
              case t: Throwable if localFsListingRace(t) =>
                println(s"SKIP $t0 ${System.currentTimeMillis()}")
                Thread.sleep(50)
            }
            Console.flush()
          }
        case "purge" =>
          val indexPath = args(1)
          println(s"PURGE_START ${System.currentTimeMillis()}")
          Console.flush()
          graft.vector.Similarity.purgeIvfAdcIndex(spark, indexPath)
          println(s"PURGE_END ${System.currentTimeMillis()}")
          Console.flush()
      }
      println("DONE")
      Console.flush()
      spark.stop()
      sys.exit(0)
    } catch {
      case t: Throwable =>
        t.printStackTrace(Console.out)
        Console.flush()
        sys.exit(1)
    }
  }
}
