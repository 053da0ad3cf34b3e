package graft

import java.io.File
import java.nio.file.{Files, Path, StandardCopyOption}

/** Shared filesystem helpers for the crash-simulation specs (torn-swap
  * staging, parked-tree recovery) — one copy instead of per-spec
  * privates. */
object TestFs {

  def copyTree(src: File, dst: File): Unit = {
    val sp = src.toPath
    Files.walk(sp).forEach { p: Path =>
      val t = dst.toPath.resolve(sp.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }
}
