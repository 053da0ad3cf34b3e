package graft.operators

/** THE filesystem seam under every persisted-lifecycle protocol (postings
  * index, IVF index, ANALYZE state, version stamps, mutation markers,
  * router layout probes): no lifecycle code touches `java.io.File`
  * directly — it goes through [[IndexFs.of]] so the storage binding is
  * one implementation swap, not a hunt through swap protocols.
  *
  * The surface is deliberately shaped like `org.apache.hadoop.fs
  * .FileSystem` (exists / mkdirs / listStatus / delete-recursive /
  * rename / create-marker), so an HDFS binding is a mechanical
  * delegation. What each protocol REQUIRES of an implementation is part
  * of this contract:
  *
  *  - **`replaceFile` must atomically replace the destination** — a
  *    reader sees the old bytes or the new bytes, never a torn or
  *    missing file. Used by the version-stamp bump
  *    ([[IndexVersion.bump]]). POSIX rename and HDFS
  *    `FileContext.rename(OVERWRITE)` provide this; object stores
  *    provide it too (a single-key PUT is atomic), so a stamp is the
  *    MOST portable protocol here.
  *  - **`rename` must atomically move a file or whole directory tree to
  *    a non-existent destination** — readers see the tree at exactly one
  *    of the two paths. Used by the whole-tree swaps
  *    ([[PostingsIndex.rebucket]]/`vacuum`, [[Sketches]] ANALYZE-state
  *    promote) and the per-cell retrain swap ([[IvfIndex.retrain]]).
  *    POSIX and HDFS directory renames are atomic; **object stores have
  *    NO atomic directory rename** — an S3/GCS binding must replace
  *    these swaps with a manifest commit (write the new tree under a
  *    unique prefix, then `replaceFile` a manifest that names the live
  *    prefix; readers resolve the manifest first). The swap call sites
  *    are the complete list of places such a binding changes.
  *  - **`createMarker` must be create-if-absent** (false when the file
  *    already exists) — the idempotence the done-marker and
  *    crash-replay protocols lean on. HDFS `createNewFile` matches;
  *    object stores approximate with if-none-match PUTs.
  *  - `listStatus` returns each child's (name, kind, length, mtime) in
  *    ONE call — implementations must not require a per-child stat
  *    round-trip ([[graft.sources.Corpus.fingerprint]] walks whole
  *    table trees through it).
  *
  * [[IndexFs.of]] dispatches on the path's scheme. Only the local
  * binding ships today; a path with any other scheme fails LOUDLY at
  * dispatch — the alternative (java.io.File silently reporting
  * nothing-exists for `hdfs://…`) turns into wrong-but-plausible
  * behavior like a router declaring a positional table absent and
  * silently never serving the positional leg. */
trait IndexFs {
  def exists(path: String): Boolean
  def isFile(path: String): Boolean
  def isDirectory(path: String): Boolean
  /** Create the directory and any missing parents; true if it exists
    * when the call returns. */
  def mkdirs(path: String): Boolean
  /** Children of a directory as (basename, isDir, length, mtimeMs) in
    * one listing call; empty for a non-directory. Order unspecified —
    * callers sort. */
  def listStatus(path: String): Seq[IndexFs.Stat]
  /** Child basenames; empty for a non-directory. */
  def listNames(path: String): Seq[String] = listStatus(path).map(_.name)
  /** One path's status; None if absent. */
  def stat(path: String): Option[IndexFs.Stat]
  /** Create-if-absent empty marker file: true iff this call created it. */
  def createMarker(path: String): Boolean
  /** Delete one file or EMPTY directory; false if absent or non-empty. */
  def delete(path: String): Boolean
  /** Recursive delete; absent path is a no-op (idempotent crash sweep). */
  def deleteTree(path: String): Unit
  /** Atomic move of a file or whole tree to a NON-EXISTENT destination
    * (see class contract); false on failure, so protocols can
    * require-check with their own message. */
  def rename(src: String, dst: String): Boolean
  /** Atomically replace `dst` (which may exist) with the file at `src`
    * (see class contract). Throws on failure — there is no partial
    * success to recover from. */
  def replaceFile(src: String, dst: String): Unit
  def writeUtf8(path: String, content: String): Unit
  def readUtf8(path: String): String
}

object IndexFs {
  final case class Stat(name: String, isDir: Boolean, len: Long, mtimeMs: Long)

  /** The binding for `path`'s scheme. Local today; `hdfs://`-style paths
    * refuse loudly rather than probe-as-absent (class scaladoc). */
  def of(path: String): IndexFs = {
    val scheme = path.indexOf(':') match {
      case i if i > 1 && path.substring(0, i).forall(_.isLetter) =>
        Some(path.substring(0, i))
      case _ => None // no scheme, or a Windows-style drive letter
    }
    scheme match {
      case None | Some("file") => LocalFs
      case Some(other) => throw new IllegalArgumentException(
        s"no IndexFs binding for scheme '$other' ($path) — implement " +
          "IndexFs over org.apache.hadoop.fs.FileSystem for it (object " +
          "stores additionally need the manifest-commit swap described " +
          "in the IndexFs contract)")
    }
  }

  // ---- forwarding sugar: IndexFs.exists(p) == IndexFs.of(p).exists(p) ----
  def exists(p: String): Boolean = of(p).exists(p)
  def isFile(p: String): Boolean = of(p).isFile(p)
  def isDirectory(p: String): Boolean = of(p).isDirectory(p)
  def mkdirs(p: String): Boolean = of(p).mkdirs(p)
  def listStatus(p: String): Seq[Stat] = of(p).listStatus(p)
  def listNames(p: String): Seq[String] = of(p).listNames(p)
  def stat(p: String): Option[Stat] = of(p).stat(p)
  def createMarker(p: String): Boolean = of(p).createMarker(p)
  def delete(p: String): Boolean = of(p).delete(p)
  def deleteTree(p: String): Unit = of(p).deleteTree(p)
  def rename(src: String, dst: String): Boolean = of(src).rename(src, dst)
  def replaceFile(src: String, dst: String): Unit = of(src).replaceFile(src, dst)
  def writeUtf8(p: String, content: String): Unit = of(p).writeUtf8(p, content)
  def readUtf8(p: String): String = of(p).readUtf8(p)
}

/** The POSIX-local binding — the only `java.io.File` user in the
  * lifecycle layer. Rename atomicity comes from the platform rename
  * (same-filesystem moves only, which every protocol guarantees by
  * keeping scratch trees beside their destination). */
object LocalFs extends IndexFs {
  private def f(p: String) =
    if (p.startsWith("file:")) new java.io.File(new java.net.URI(p))
    else new java.io.File(p)

  def exists(p: String): Boolean = f(p).exists()
  def isFile(p: String): Boolean = f(p).isFile
  def isDirectory(p: String): Boolean = f(p).isDirectory
  def mkdirs(p: String): Boolean = { val d = f(p); d.mkdirs(); d.isDirectory }
  def listStatus(p: String): Seq[IndexFs.Stat] =
    Option(f(p).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(c => IndexFs.Stat(c.getName, c.isDirectory, c.length(), c.lastModified()))
  def stat(p: String): Option[IndexFs.Stat] = {
    val x = f(p)
    if (!x.exists()) None
    else Some(IndexFs.Stat(x.getName, x.isDirectory, x.length(), x.lastModified()))
  }
  def createMarker(p: String): Boolean = f(p).createNewFile()
  def delete(p: String): Boolean = f(p).delete()
  def deleteTree(p: String): Unit = {
    def rm(d: java.io.File): Unit = {
      if (d.isDirectory) Option(d.listFiles()).foreach(_.foreach(rm))
      d.delete(); ()
    }
    rm(f(p))
  }
  def rename(src: String, dst: String): Boolean = f(src).renameTo(f(dst))
  def replaceFile(src: String, dst: String): Unit =
    // POSIX rename(2) replaces an existing destination atomically
    require(f(src).renameTo(f(dst)), s"atomic replace failed: $src -> $dst")
  def writeUtf8(p: String, content: String): Unit = {
    val w = new java.io.PrintWriter(f(p), "UTF-8")
    try w.print(content) finally w.close()
  }
  def readUtf8(p: String): String = {
    val src = scala.io.Source.fromFile(f(p), "UTF-8")
    try src.mkString finally src.close()
  }
}
