package graft.util

/** Tiny local-FS helpers shared by the engine's checkpoint layout and the
  * bench harness (a cluster deployment swaps these for its shared store's
  * client — the call sites are the engine's only direct FS touches). */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
