package graft.sources

/** Local-filesystem helpers for scratch staging. */
object LocalFs {

  /** Recursive delete of a scratch directory (no-op if absent). Does not
    * follow symlinks into their targets — `listFiles` on a symlinked dir
    * is only reached via the staged trees we create ourselves, which
    * contain no cycles.
    */
  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(path))
  }
}
