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

  /** Test seam: route schemeless/`file:` paths through an alternate
    * binding, so the LIFECYCLE specs (not just the FS contract spec)
    * can run the full build→maintain→swap→query protocols through the
    * Hadoop delegation while Spark keeps reading the same local paths.
    * Production code never sets it; suites set-and-restore in
    * try/finally (Test/parallelExecution is off). */
  @volatile private[graft] var localBindingOverride: Option[IndexFs] = None

  /** The binding for `path`'s scheme. Local and HDFS-style (atomic-
    * rename) filesystems ship; object-store schemes refuse loudly rather
    * than probe-as-absent (class scaladoc) — their bindings must replace
    * the whole-tree swaps with a manifest commit first. */
  def of(path: String): IndexFs = {
    val scheme = path.indexOf(':') match {
      case i if i > 1 && path.substring(0, i).forall(_.isLetter) =>
        Some(path.substring(0, i))
      case _ => None // no scheme, or a Windows-style drive letter
    }
    scheme match {
      case None | Some("file") => localBindingOverride.getOrElse(LocalFs)
      // filesystems with real atomic rename (file + directory) — the
      // contract every swap protocol leans on. webhdfs is the same
      // namenode behind an HTTP proxy; viewfs delegates to mounts that
      // are themselves hdfs.
      case Some(fs @ ("hdfs" | "viewfs" | "webhdfs")) => HadoopFs.forScheme(fs)
      case Some(other) => throw new IllegalArgumentException(
        s"no IndexFs binding for scheme '$other' ($path) — object " +
          "stores (s3/gs/abfs) have no atomic directory rename, so a " +
          "binding must first replace the whole-tree swaps with the " +
          "manifest-commit protocol described in the IndexFs contract")
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

/** The Hadoop-`FileSystem` delegation the trait was shaped for (class
  * scaladoc): every call maps to the one Hadoop call with the same
  * contract. Atomicity provenance, per contract clause:
  *
  *  - `rename` (file or whole tree, non-existent destination): HDFS
  *    `FileSystem.rename` is a namenode-atomic metadata op. The
  *    destination-exists guard is explicit here because the legacy
  *    rename's "move INTO an existing directory" POSIX-mv behavior
  *    would silently nest a swapped tree one level deep — the guard
  *    turns that into the contract's `false`.
  *  - `replaceFile`: `FileContext.rename(OVERWRITE)` — the
  *    rename-with-overwrite HDFS exposes only through the FileContext
  *    API (plain `FileSystem.rename` refuses an existing destination).
  *  - `createMarker`: `FileSystem.createNewFile` — namenode-atomic
  *    create-if-absent.
  *  - `listStatus`: one `FileSystem.listStatus` RPC returns every
  *    child's (name, kind, length, mtime) — no per-child stat round
  *    trips, the clause [[graft.sources.Corpus]]'s tree fingerprint
  *    walks depend on.
  *
  * The Hadoop `Configuration` comes from the active Spark session when
  * one exists (so `hdfs://` resolves through the cluster's core-site)
  * and falls back to the classpath default otherwise. Instances cache
  * per scheme; Hadoop itself caches the underlying `FileSystem` per
  * (scheme, authority, ugi).
  *
  * The contract spec ([[graft.IndexFsContractSpec]]) runs this binding
  * and [[LocalFs]] through the SAME assertions, pointing this one at
  * Hadoop's local filesystem — the delegation is what's under test;
  * namenode atomicity is Hadoop's published contract. */
final class HadoopFs(confOf: () => org.apache.hadoop.conf.Configuration)
    extends IndexFs {
  import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

  private def hp(p: String) = new HPath(p)
  private def fs(p: String): FileSystem =
    FileSystem.get(new java.net.URI(p), confOf())

  def exists(p: String): Boolean = fs(p).exists(hp(p))
  def isFile(p: String): Boolean = {
    val f = fs(p)
    f.exists(hp(p)) && f.getFileStatus(hp(p)).isFile
  }
  def isDirectory(p: String): Boolean = {
    val f = fs(p)
    f.exists(hp(p)) && f.getFileStatus(hp(p)).isDirectory
  }
  def mkdirs(p: String): Boolean = {
    val f = fs(p)
    f.mkdirs(hp(p)); f.exists(hp(p)) && f.getFileStatus(hp(p)).isDirectory
  }
  def listStatus(p: String): Seq[IndexFs.Stat] =
    if (!isDirectory(p)) Seq.empty
    else fs(p).listStatus(hp(p)).toSeq.map(st =>
      IndexFs.Stat(st.getPath.getName, st.isDirectory, st.getLen,
        st.getModificationTime))
  def stat(p: String): Option[IndexFs.Stat] = {
    val f = fs(p)
    if (!f.exists(hp(p))) None
    else {
      val st = f.getFileStatus(hp(p))
      Some(IndexFs.Stat(st.getPath.getName, st.isDirectory, st.getLen,
        st.getModificationTime))
    }
  }
  def createMarker(p: String): Boolean =
    try fs(p).createNewFile(hp(p))
    catch { case _: java.io.IOException => false }
  def delete(p: String): Boolean =
    // recursive=false refuses a non-empty directory — HDFS signals the
    // refusal as an IOException, the contract wants `false`
    try fs(p).delete(hp(p), false)
    catch { case _: java.io.IOException => false }
  def deleteTree(p: String): Unit = { fs(p).delete(hp(p), true); () }
  def rename(src: String, dst: String): Boolean = {
    val f = fs(src)
    // see class scaladoc: without this guard the legacy rename would
    // move src INTO an existing directory destination
    if (f.exists(hp(dst))) false
    else try f.rename(hp(src), hp(dst))
    catch { case _: java.io.IOException => false }
  }
  def replaceFile(src: String, dst: String): Unit = {
    val fc = FileContext.getFileContext(new java.net.URI(dst), confOf())
    // throws on failure — no partial success to recover from
    fc.rename(hp(src), hp(dst), Options.Rename.OVERWRITE)
  }
  def writeUtf8(p: String, content: String): Unit = {
    val out = fs(p).create(hp(p), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
  def readUtf8(p: String): String = {
    val in = fs(p).open(hp(p))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}

object HadoopFs {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, HadoopFs]()
  private def sessionConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
  private[graft] def forScheme(scheme: String): HadoopFs =
    cache.computeIfAbsent(scheme, _ => new HadoopFs(() => sessionConf()))
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
  def rename(src: String, dst: String): Boolean =
    // the existing-destination guard is not redundant: POSIX rename(2)
    // SILENTLY REPLACES an existing file destination (and an existing
    // empty-dir destination), so a swap racing a concurrent writer
    // would clobber instead of returning the contract's `false` — the
    // cross-binding contract spec caught exactly this on the first run
    // (HadoopFs refused, LocalFs overwrote)
    !f(dst).exists() && f(src).renameTo(f(dst))
  def replaceFile(src: String, dst: String): Unit =
    // POSIX rename(2) replaces an existing destination atomically
    require(f(src).renameTo(f(dst)), s"atomic replace failed: $src -> $dst")
  def writeUtf8(p: String, content: String): Unit = {
    // Files.write throws on short/failed writes — PrintWriter swallows
    // IOExceptions into an internal error flag, so a full-disk truncation
    // would have been atomically renamed over a version stamp or served
    // as a torn swap manifest (round-14 advice, low)
    java.nio.file.Files.write(f(p).toPath,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8)); ()
  }
  def readUtf8(p: String): String = {
    val src = scala.io.Source.fromFile(f(p), "UTF-8")
    try src.mkString finally src.close()
  }
}
