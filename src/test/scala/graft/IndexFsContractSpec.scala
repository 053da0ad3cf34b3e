package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HadoopFs, IndexFs, LocalFs}

/** The [[IndexFs]] CONTRACT, run verbatim over both shipped bindings
  * (verdict r14 Next #4): [[LocalFs]] and [[HadoopFs]] pointed at
  * Hadoop's local filesystem (`RawLocalFileSystem`, cache-disabled so
  * the impl override cannot leak into Spark's shared `FileSystem`
  * cache). The delegation is what's under test — HDFS namenode
  * atomicity is Hadoop's own published contract; what this spec pins is
  * that every call maps to a Hadoop call with the SAME semantics the
  * lifecycle protocols assume of the local binding:
  *
  *  - `createMarker` is create-if-absent (true exactly once);
  *  - `delete` refuses a non-empty directory with `false`, tree intact;
  *  - `rename` moves a file or WHOLE TREE to a non-existent
  *    destination, and returns `false` (src intact) when the
  *    destination exists — including the existing-DIRECTORY case where
  *    Hadoop's legacy rename would have nested src inside dst;
  *  - `replaceFile` atomically replaces an existing destination;
  *  - `listStatus` returns (name, kind, length, mtime) for every child
  *    in one call, and empty for a non-directory.
  */
class IndexFsContractSpec extends AnyFunSuite {

  private def rawLocalConf() = {
    val c = new org.apache.hadoop.conf.Configuration()
    // RawLocal = no checksum sidecars (HDFS parity); disable the global
    // FileSystem cache so this impl choice stays spec-local
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  // (label, binding, path decorator): HadoopFs needs an explicit scheme
  // to dispatch through Hadoop; LocalFs takes bare paths
  private val bindings: Seq[(String, IndexFs, String => String)] = Seq(
    ("LocalFs", LocalFs, identity[String] _),
    ("HadoopFs(rawlocal)", new HadoopFs(() => rawLocalConf()),
      (p: String) => s"file:$p"))

  private def scratch(): String = {
    val d = s"/tmp/graft_fscontract_${System.nanoTime()}"
    new java.io.File(d).mkdirs()
    d
  }

  for ((label, fs, at) <- bindings) {

    test(s"$label: mkdirs / exists / isFile / isDirectory / stat") {
      val d = scratch()
      assert(fs.mkdirs(at(s"$d/a/b/c")))
      assert(fs.exists(at(s"$d/a/b/c")) && fs.isDirectory(at(s"$d/a/b/c")))
      assert(!fs.isFile(at(s"$d/a/b/c")))
      assert(!fs.exists(at(s"$d/nope")) && fs.stat(at(s"$d/nope")).isEmpty)
      fs.writeUtf8(at(s"$d/a/f.txt"), "hello")
      assert(fs.isFile(at(s"$d/a/f.txt")) && !fs.isDirectory(at(s"$d/a/f.txt")))
      val st = fs.stat(at(s"$d/a/f.txt")).get
      assert(st.name === "f.txt" && !st.isDir && st.len === 5L && st.mtimeMs > 0L)
    }

    test(s"$label: writeUtf8 / readUtf8 roundtrip, overwrite included") {
      val d = scratch()
      val content = "line1\nline2 é中文\n"
      fs.writeUtf8(at(s"$d/u.txt"), content)
      assert(fs.readUtf8(at(s"$d/u.txt")) === content)
      fs.writeUtf8(at(s"$d/u.txt"), "short") // overwrite, not append
      assert(fs.readUtf8(at(s"$d/u.txt")) === "short")
    }

    test(s"$label: createMarker is create-if-absent") {
      val d = scratch()
      assert(fs.createMarker(at(s"$d/_M")))
      assert(!fs.createMarker(at(s"$d/_M")), "second create must report false")
      assert(fs.isFile(at(s"$d/_M")))
    }

    test(s"$label: listStatus one-call children; empty for non-directory") {
      val d = scratch()
      fs.writeUtf8(at(s"$d/one.txt"), "1")
      fs.writeUtf8(at(s"$d/two.txt"), "22")
      fs.mkdirs(at(s"$d/sub"))
      val kids = fs.listStatus(at(d)).sortBy(_.name)
      assert(kids.map(_.name) === Seq("one.txt", "sub", "two.txt"))
      assert(kids.map(_.isDir) === Seq(false, true, false))
      assert(kids.filter(!_.isDir).map(_.len) === Seq(1L, 2L))
      assert(fs.listNames(at(s"$d/one.txt")).isEmpty, "file lists empty")
      assert(fs.listNames(at(s"$d/absent")).isEmpty, "absent lists empty")
    }

    test(s"$label: delete file=true, absent=false, non-empty dir=false (tree intact), empty dir=true") {
      val d = scratch()
      fs.writeUtf8(at(s"$d/f"), "x")
      assert(fs.delete(at(s"$d/f")))
      assert(!fs.delete(at(s"$d/f")), "absent deletes false")
      fs.mkdirs(at(s"$d/full")); fs.writeUtf8(at(s"$d/full/kid"), "y")
      assert(!fs.delete(at(s"$d/full")), "non-empty dir must refuse")
      assert(fs.readUtf8(at(s"$d/full/kid")) === "y", "refusal leaves the tree")
      fs.mkdirs(at(s"$d/empty"))
      assert(fs.delete(at(s"$d/empty")))
    }

    test(s"$label: deleteTree is recursive and idempotent on absent") {
      val d = scratch()
      fs.mkdirs(at(s"$d/t/x")); fs.writeUtf8(at(s"$d/t/x/f"), "z")
      fs.deleteTree(at(s"$d/t"))
      assert(!fs.exists(at(s"$d/t")))
      fs.deleteTree(at(s"$d/t")) // crash-sweep idempotence: no throw
    }

    test(s"$label: rename moves a file or whole tree; existing destination refuses with src intact") {
      val d = scratch()
      fs.writeUtf8(at(s"$d/src.txt"), "payload")
      assert(fs.rename(at(s"$d/src.txt"), at(s"$d/dst.txt")))
      assert(!fs.exists(at(s"$d/src.txt")))
      assert(fs.readUtf8(at(s"$d/dst.txt")) === "payload")

      // whole-tree move (the rebucket/ANALYZE-promote swap shape)
      fs.mkdirs(at(s"$d/tree/deep"))
      fs.writeUtf8(at(s"$d/tree/deep/f"), "leaf")
      assert(fs.rename(at(s"$d/tree"), at(s"$d/tree2")))
      assert(fs.readUtf8(at(s"$d/tree2/deep/f")) === "leaf")
      assert(!fs.exists(at(s"$d/tree")))

      // existing FILE destination: refuse, both sides intact
      fs.writeUtf8(at(s"$d/a"), "A"); fs.writeUtf8(at(s"$d/b"), "B")
      assert(!fs.rename(at(s"$d/a"), at(s"$d/b")))
      assert(fs.readUtf8(at(s"$d/a")) === "A" && fs.readUtf8(at(s"$d/b")) === "B")

      // existing DIRECTORY destination: the case Hadoop's legacy rename
      // would turn into "move src INTO dst" — must refuse instead
      fs.mkdirs(at(s"$d/dstdir"))
      assert(!fs.rename(at(s"$d/tree2"), at(s"$d/dstdir")))
      assert(fs.readUtf8(at(s"$d/tree2/deep/f")) === "leaf", "src intact")
      assert(!fs.exists(at(s"$d/dstdir/tree2")), "and NOT nested inside dst")
    }

    test(s"$label: replaceFile atomically replaces an existing destination") {
      val d = scratch()
      fs.writeUtf8(at(s"$d/stamp"), "v1")
      fs.writeUtf8(at(s"$d/stamp.next"), "v2")
      fs.replaceFile(at(s"$d/stamp.next"), at(s"$d/stamp"))
      assert(fs.readUtf8(at(s"$d/stamp")) === "v2")
      assert(!fs.exists(at(s"$d/stamp.next")))
      // destination absent works too (first-ever stamp)
      fs.writeUtf8(at(s"$d/fresh.next"), "f1")
      fs.replaceFile(at(s"$d/fresh.next"), at(s"$d/fresh"))
      assert(fs.readUtf8(at(s"$d/fresh")) === "f1")
    }
  }
}
