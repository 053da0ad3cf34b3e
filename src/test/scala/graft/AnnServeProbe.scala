package graft

import org.apache.spark.sql.functions._

import graft.streaming.{StreamAnnServe, StreamingBench}

/** Throughput probe for the `annserve` leg: same index, same query
  * generator, runnable standalone while sizing the leg. */
object AnnServeProbe {

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.local(args.lift(2).getOrElse("32"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"/tmp/graft_annserve_probe_idx_${System.nanoTime()}"
    val vecs = spark.range(0, 4096).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        ((col("id") * lit(2654435761L) + j * lit(40503L)) % 1000L)
          .cast("double") / 1000.0 + 0.001).as("embedding"))
    graft.operators.IvfIndex.buildFrom(spark, vecs, dir, nCells = 16)

    (1 to 2).foreach { rep =>
      val (events, sec) =
        StreamingBench.throughputForeach[(Long, Seq[Double])](spark,
          ds => StreamAnnServe.serve(spark, dir,
            ds.toDF("query_id", "qv"),
            s"/tmp/graft_annserve_probe_ckpt_${System.nanoTime()}")(
            (res, _) => { res.collect(); () }),
          (b, per) => (0 until per).map { i =>
            val g = b.toLong * per + i
            (1000000000L + g,
              (0 until 16).map(j =>
                ((g * 2654435761L + j * 40503L) % 1000).toDouble / 1000.0
                  + 0.001): Seq[Double])
          }, batches, perBatch)
      println(f"[probe] annserve rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
    }
    spark.stop()
  }
}
