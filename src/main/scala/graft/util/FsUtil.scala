package graft.util

/** Local-filesystem helpers shared by the builders/benches (the sandbox
  * runs on local disk; a cluster deployment would swap these for the
  * Hadoop FileSystem API at the same call sites).
  */
object FsUtil {

  /** Recursive delete; tolerates a missing path. */
  def rmTree(path: String): Unit = rmTree(new java.io.File(path))

  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(rmTree)
    }
    f.delete()
  }

  /** Rename that THROWS on failure instead of returning false — silent
    * rename failures around directory swaps are how index generations get
    * lost.
    */
  def renameOrThrow(from: String, to: String): Unit = {
    if (!new java.io.File(from).renameTo(new java.io.File(to)))
      throw new java.io.IOException(s"rename failed: $from -> $to")
  }
}
