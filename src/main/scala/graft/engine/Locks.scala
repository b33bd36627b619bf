package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}

/** JVM-wide lock registry keyed by qualified filesystem URI, shared by
  * every create-if-absent/rename commit discipline in the engine
  * (`Snapshots` version commits, `Layout.logWrite` version claims).
  * Local file:// neither renames-without-overwrite nor
  * creates-if-absent atomically, so racing THREADS of one driver must
  * serialize here; cross-process races rely on the HDFS-semantics
  * atomicity of the store. Qualification makes "/t", "file:/t" and
  * "/t/" share one lock.
  */
private[engine] object UriLocks {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def forPath(fs: FileSystem, path: Path): Object =
    locks.computeIfAbsent(
      fs.makeQualified(path).toString.stripSuffix("/"), _ => new Object)
}
