package graft

// Dev-only: re-lay a driver corpus dir with Io.compact so the layout cost
// the round-7 re-baseline measured (single-row-group files serialize
// scans) can be quantified over the full query suite:
//   sbt "Test/runMain graft.CompactSf /root/testdata/sf0.1 /tmp/sf01_compacted"
object CompactSf {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf01_compacted")
    val target = args.lift(2).map(_.toLong).getOrElse(8L * 1024 * 1024)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val files = graft.sources.Io.compact(
        spark, s"$in/$t.parquet", s"$out/$t.parquet", target)
      println(s"[compact] $t -> $files files")
    }
    spark.stop()
  }
}
