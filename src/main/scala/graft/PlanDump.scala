package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.{Failure, Success, Try}

/** Optimization-workflow tool: writes `.explain("formatted")` for every
  * declared query to a directory, one file per query, so plan shapes
  * (Exchange count, join strategy, PushedFilters/ReadSchema) can be
  * diffed before/after a change and committed as evidence
  * (`plans/rN/<query>_<suffix>.txt`).
  *
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (core count),
  * SPARK_GRAFT_ONLY (comma-separated query subset), GRAFT_PLAN_DIR
  * (output dir, default plans/r15), GRAFT_PLAN_SUFFIX (default "before").
  *
  * Note: queries whose CONSTRUCTION runs driver-side jobs (index
  * ensure/build, profile collects) execute those while planning here —
  * that is the real cost a caller pays before the returned frame's plan
  * exists, and the dump reflects the frame a consumer would execute.
  *
  * Checkpoint opacity (round-15 verdict, Wrong #3): an eager
  * materialization truncates the dumped plan to `Scan ExistingRDD`,
  * hiding every operator below it. [[Materialize]]'s recorder captures
  * each checkpointed frame's PRE-materialization formatted plan during
  * construction, and this dump appends them after the executed plan —
  * so e.g. the entity family's banded-levenshtein join is visible in
  * its own evidence file. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r15")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        Materialize.startRecording()
        val attempt = Try {
          val df = fn(spark, sfDir)
          df.queryExecution.explainString(mode)
        }
        // drained unconditionally so a failed query can't leak its
        // records into the next query's evidence file
        val pre = Materialize.drainRecording()
        attempt.map { executed =>
          if (pre.isEmpty) executed
          else executed + pre.zipWithIndex.map { case ((label, plan), i) =>
            s"\n=== pre-materialization plan ${i + 1}/${pre.size} [$label] ===\n$plan"
          }.mkString
        } match {
          case Success(txt) =>
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes(StandardCharsets.UTF_8))
            println(s"[plandump] $name ok")
          case Failure(e) =>
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}"
                .getBytes(StandardCharsets.UTF_8))
            println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
