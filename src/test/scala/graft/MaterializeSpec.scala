package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the ONE materialization seam ([[Materialize]] —
  * round-15 verdict, Next #6): every operator's eager checkpoint goes
  * through `graftCheckpoint()`, and one conf
  * (`spark.graft.checkpoint.mode=local|reliable`) flips all sites from
  * local-mode block storage (fast, lost with an executor) to reliable
  * checkpoint files (cluster-safe). Local mode must behave exactly as the
  * bare `localCheckpoint()` it replaced. */
class MaterializeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("local mode (default) truncates lineage like localCheckpoint") {
    spark.conf.unset(Materialize.modeKey)
    val df = Materialize.checkpoint(
      spark.range(100).select(col("id"), (col("id") * 2).as("x")))
    assert(df.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD])
    assert(df.agg(sum(col("x"))).collect()(0).getLong(0) === 9900L)
  }

  test("reliable mode without a checkpoint dir fails loudly") {
    // fresh thread-safety note: sc.checkpointDir is global — only probe
    // when unset, and restore the conf after
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set(Materialize.modeKey, "reliable")
    try {
      val e = intercept[IllegalArgumentException] {
        Materialize.checkpoint(spark.range(10).toDF())
      }
      assert(e.getMessage.contains(Materialize.dirKey))
    } finally spark.conf.unset(Materialize.modeKey)
  }

  test("reliable mode writes checkpoint files and returns identical results") {
    val dir = Files.createTempDirectory("graft_reliable_ckpt").toString
    spark.conf.set(Materialize.modeKey, "reliable")
    spark.conf.set(Materialize.dirKey, dir)
    try {
      // a representative operator THROUGH the seam: dedupFunnel checkpoints
      // three id frames and runs the two-thread overlap — the full
      // discipline, end to end, under reliable mode
      val reliable = graft.operators.Dedup.dedupFunnel(spark, sf).collect()
      assert(Files.list(Paths.get(dir)).iterator().asScala.nonEmpty,
        "reliable mode must land blocks under the checkpoint dir")
      spark.conf.set(Materialize.modeKey, "local")
      val local = graft.operators.Dedup.dedupFunnel(spark, sf).collect()
      assert(reliable.toSeq === local.toSeq,
        "checkpoint mode must not change operator results")
    } finally {
      spark.conf.unset(Materialize.modeKey)
      spark.conf.unset(Materialize.dirKey)
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator().asScala.toSeq.foreach(rm)
        Files.deleteIfExists(p); ()
      }
      rm(Paths.get(dir))
    }
  }

  test("source audit: no operator calls localCheckpoint() directly") {
    // the seam is only a seam if every site goes through it
    val root = Paths.get("src/main/scala/graft")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "Materialize.scala")
      .flatMap { p =>
        new String(Files.readAllBytes(p), "UTF-8").linesIterator.zipWithIndex
          .filter { case (l, _) =>
            val t = l.trim
            // skip pure comment lines; prose references are fine
            !t.startsWith("//") && !t.startsWith("*") &&
              t.contains(".localCheckpoint(")
          }
          .map { case (_, i) => s"$p:${i + 1}" }
      }.toSeq
    assert(offenders.isEmpty,
      s"localCheckpoint outside the Materialize seam:\n${offenders.mkString("\n")}")
  }

  test("recording captures pre-materialization plans (PlanDump evidence)") {
    Materialize.startRecording()
    Materialize.checkpoint(
      spark.range(50).select(col("id"), (col("id") % 7).as("k")))
    val recs = Materialize.drainRecording()
    assert(recs.size === 1)
    assert(recs.head._2.contains("Range"),
      s"pre-materialization plan must show the real operators:\n${recs.head._2}")
    // drained: a second drain is empty (no leak into the next query)
    assert(Materialize.drainRecording().isEmpty)
  }
}
