package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderFunctions
import graft.sources.Io

/** Z-order clustering: key correctness, codegen, and the measured
  * multi-dimensional data-skipping advantage over single-column sort.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  test("z key interleaves quantile-bucket bits; nulls rank at the origin") {
    import spark.implicits._
    // 1 boundary per dim at 2 -> 2 buckets -> 1 bit each: z in {0,1,2,3}
    val bnd = Seq(Array(2L), Array(2L))
    val out = Seq[(java.lang.Long, java.lang.Long)]((1L, 1L), (3L, 1L), (1L, 3L), (3L, 3L), (null, 3L))
      .toDF("a", "b")
      .select(ZOrderFunctions.zkey(Seq(col("a"), col("b")), bnd).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit0 = a's bucket, bit1 = b's bucket; null a -> bucket 0
    assert(out === Seq(0L, 1L, 2L, 3L, 2L))
  }

  test("z key stays inside whole-stage codegen (binary search + unrolled interleave)") {
    val bnd = Seq(Array(10L, 20L, 30L), Array(10L, 20L, 30L)) // 4 buckets -> 2 bits
    val df = spark.range(100).select(
      ZOrderFunctions.zkey(Seq(col("id"), (col("id") * 7 % 40)), bnd).as("z"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("WholeStageCodegen"), gen)
    assert(gen.contains("binarySearch"), "bucket lookup not code-generated")
    // deterministic sanity on a known row: id=35 -> bucket 3; 35*7%40=5 -> bucket 0
    val z35 = df.where(col("z") === lit(5L)).count() // 3 interleaved at dim0: 0b0101 = 5
    assert(z35 >= 1, "expected z=5 rows (bucket (3,0))")
  }

  test("z-order layout skips row groups on BOTH columns; single sort only on its own") {
    val sf = "/root/testdata/sf0.01"
    val in = s"$sf/lineitem.parquet"
    val bytes = new java.io.File(in).length()
    val target = math.max(1L, bytes / 32) // ~32 output files
    val zDir = s"/tmp/graft_zorder_${System.nanoTime()}"
    val sDir = s"/tmp/graft_sorted_${System.nanoTime()}"
    Io.compactZ(spark, in, zDir, Seq("l_orderkey", "l_partkey"), bits = 8, targetBytes = target)
    Io.compact(spark, in, sDir, targetBytes = target, sortBy = Seq("l_orderkey"))

    val li = spark.read.parquet(in)
    def pct10(c: String): Long =
      li.stat.approxQuantile(c, Array(0.1), 0.001)(0).toLong

    // predicate "c < t": a row group is skippable iff its min >= t
    def skipFrac(dir: String, c: String, t: Long): Double = {
      val stats = Io.columnRangeStats(spark, dir, c)
      stats.count(_._1 >= t).toDouble / stats.size
    }

    val (tOrder, tPart) = (pct10("l_orderkey"), pct10("l_partkey"))
    val zOrderSkip = skipFrac(zDir, "l_orderkey", tOrder)
    val zPartSkip = skipFrac(zDir, "l_partkey", tPart)
    val sOrderSkip = skipFrac(sDir, "l_orderkey", tOrder)
    val sPartSkip = skipFrac(sDir, "l_partkey", tPart)

    // z-order: both dimensions skip most groups
    assert(zOrderSkip >= 0.5, s"z-order l_orderkey skip $zOrderSkip")
    assert(zPartSkip >= 0.5, s"z-order l_partkey skip $zPartSkip")
    // single sort: own column skips, the other cannot
    assert(sOrderSkip >= 0.5, s"sorted l_orderkey skip $sOrderSkip")
    assert(sPartSkip <= 0.2, s"sorted layout should NOT skip on l_partkey: $sPartSkip")

    // layout preserves content: same rows, same schema
    val zCount = spark.read.parquet(zDir).count()
    assert(zCount === li.count())
    assert(spark.read.parquet(zDir).schema === li.schema)

    Seq(zDir, sDir).foreach { d =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(d), true)
    }
  }
}
