package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CtrAggregators, VectorFunctions}
import graft.model.{AdCtr, AdEvent}

class FunctionsSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark


  test("graft_dot registers into the SQL surface and matches a manual fold") {
    // GraftExtensions wires the same builder via spark.sql.extensions at
    // session build time; on the shared test session, register directly.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d""")
      .collect().head.getDouble(0)
    assert(r === 32.0)
    // null propagation
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("dot column function agrees with the interpreted aggregate/zip_with form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((Seq(0.5, -1.5, 2.0), Seq(4.0, 2.0, 0.25))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow"))
      .as[(Double, Double)].collect().head
    assert(got._1 === got._2)
  }

  test("hyperplane signature packs the same sign bits as per-plane dots") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val planes = VectorFunctions.planesFor(16, 4)
    val df = Seq(
      Seq(0.5, -1.5, 2.0, 0.25),
      Seq(-3.0, 1.0, -0.5, 4.0),
      Seq(1.0, 1.0, 1.0, 1.0)).toDF("v")
    val rows = df.select(
      VectorFunctions.hyperplaneSig(col("v"), planes).as("sig"),
      col("v")).as[(Long, Seq[Double])].collect()
    rows.foreach { case (sig, v) =>
      planes.zipWithIndex.foreach { case (plane, p) =>
        val d = v.zip(plane).map { case (a, b) => a * b }.sum
        val bit = (sig >> p) & 1L
        assert(bit === (if (d >= 0.0) 1L else 0L),
          s"plane $p: dot=$d bit=$bit sig=$sig")
      }
    }
  }

  test("graft_hyperplane_sig SQL surface matches the DSL form") {
    VectorFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val v = (0 until 64).map(i => (i % 7).toDouble - 3.0)
    val dsl = Seq(v).toDF("v")
      .select(VectorFunctions.hyperplaneSig(col("v"), VectorFunctions.planesFor(8)))
      .as[Long].collect().head
    val sql = spark.sql(
      s"SELECT graft_hyperplane_sig(array(${v.mkString("d,")}d), 8)")
      .collect().head.getLong(0)
    assert(dsl === sql)
    // null propagation
    val n = spark.sql("SELECT graft_hyperplane_sig(CAST(NULL AS ARRAY<DOUBLE>), 8)")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("typed capped aggregator clamps per key like the reference semigroup") {
    import spark.implicits._
    val events = Seq(
      AdCtr("ad1", 1, 0), AdCtr("ad1", 1, 0), AdCtr("ad1", 0, 1),
      AdCtr("ad2", 0, 1), AdCtr("ad2", 0, 1)).toDS()
    val out = events.groupByKey(_.id)
      .agg(CtrAggregators.capped.toColumn.name("ctr"))
      .collect().toMap
    assert(out("ad1") === AdCtr("ad1", 1, 1))
    assert(out("ad2") === AdCtr("ad2", 0, 1))
  }

  test("typed total aggregator sums per key") {
    import spark.implicits._
    val events = Seq(
      AdCtr("ad1", 1, 0), AdCtr("ad1", 1, 0), AdCtr("ad1", 0, 1)).toDS()
    val out = events.groupByKey(_.id)
      .agg(CtrAggregators.total.toColumn.name("ctr"))
      .collect().toMap
    assert(out("ad1") === AdCtr("ad1", 2, 1))
  }

  test("hll rho integer-limb form == the regexp-over-hex definition, null-safe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the ORIGINAL regexp tree, replicated verbatim as the reference
    def md5h(v: org.apache.spark.sql.Column) =
      md5(concat(v.cast("string"), lit("|hll")))
    def rhoRegexp(v: org.apache.spark.sql.Column) = {
      val rest = substring(md5h(v), 3, 30)
      val zeros = length(regexp_extract(rest, "^0*", 0))
      val firstNz = rest.substr(zeros + lit(1), lit(1))
      val nlzInDigit = when(firstNz === "1", 3)
        .when(firstNz.isin("2", "3"), 2)
        .when(firstNz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
      when(zeros === 30, lit(121)).otherwise(zeros * 4 + nlzInDigit + 1)
    }
    val vals = (0L until 20000L).map(i => Some(s"v$i")) :+ None
    val df = vals.toDF("v")
      .select(col("v"), rhoRegexp(col("v")).as("old"),
        graft.operators.Sketches.hllRhoCol(col("v")).as("nu"),
        graft.operators.Sketches.hllBucketCol(col("v")).as("b"))
    val bad = df.where(!(col("old") <=> col("nu"))).count()
    assert(bad === 0L, "integer-limb rho diverged from the regexp definition")
    // ranks actually spread (the test isn't vacuous at rho == 1)
    val maxRho = df.agg(max(col("nu"))).collect()(0).getInt(0)
    assert(maxRho >= 10, s"20k values should reach rank >= 10: $maxRho")
    assert(df.where(col("v").isNull && col("nu").isNull).count() === 1L,
      "null value must keep a null rank")
  }

  test("hll packed bytes form == the hex-chain definition, null-safe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the hex chain (the reference derivation the oracles replicate) vs
    // the packed md5-bytes expression: bucket int, rho, AND the persisted
    // state's hex spelling must all agree on every value
    val vals = (0L until 20000L).map(i => Some(s"v$i")) :+ None
    val pk = graft.functions.HashFunctions.hllPackCol(col("v"))
    val df = vals.toDF("v").select(
      col("v"),
      graft.operators.Sketches.hllBucketCol(col("v")).as("hex_bucket"),
      graft.operators.Sketches.hllRhoCol(col("v")).as("hex_rho"),
      conv(graft.operators.Sketches.hllBucketCol(col("v")), 16, 10)
        .cast("int").as("hex_bucket_int"),
      shiftright(pk, 7).as("pk_bucket"),
      pk.bitwiseAND(lit(127)).as("pk_rho"),
      lower(lpad(hex(shiftright(pk, 7)), 2, "0")).as("pk_bucket_hex"))
    assert(df.where(!(col("hex_rho") <=> col("pk_rho"))).count() === 0L,
      "packed rho diverged from the hex-chain definition")
    assert(df.where(!(col("hex_bucket_int") <=> col("pk_bucket"))).count() === 0L,
      "packed bucket diverged from the hex bucket's integer value")
    assert(df.where(!(col("hex_bucket") <=> col("pk_bucket_hex"))).count() === 0L,
      "re-rendered hex bucket diverged from the persisted-state spelling")
    assert(df.where(col("v").isNull && col("pk_bucket").isNull
      && col("pk_rho").isNull && col("pk_bucket_hex").isNull).count() === 1L,
      "null value must stay null through the packed form")
  }

  test("md5 bytes forms == the hex-roundtrip definitions, null-safe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vals = (0L until 20000L).map(i => Some(s"gram $i body")) :+ None
    val df = vals.toDF("v").select(
      col("v"),
      unhex(md5(col("v"))).as("hex_bin"),
      graft.functions.HashFunctions.md5BinCol(col("v")).as("raw_bin"),
      conv(substring(md5(col("v")), 1, 2), 16, 10).cast("int").as("hex_b0"),
      graft.functions.HashFunctions.md5Byte0Col(col("v")).as("raw_b0"))
    assert(df.where(!(col("hex_bin") <=> col("raw_bin"))).count() === 0L,
      "graft_md5_bin diverged from unhex(md5(v))")
    assert(df.where(!(col("hex_b0") <=> col("raw_b0"))).count() === 0L,
      "graft_md5_byte0 diverged from the first two hex chars' value")
    assert(df.where(col("v").isNull && col("raw_bin").isNull
      && col("raw_b0").isNull).count() === 1L,
      "null value must stay null through the bytes forms")
  }

  test("graft_str_bounds == declarative min/max(string), grouped, null-safe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // adversarial strings: empties, NULs, unicode above/below ASCII,
    // prefix pairs, per-group all-NULL — every ordering edge the
    // UTF8String binary compare must reproduce
    val rnd = new scala.util.Random(16)
    val pool = Seq("", " ", " a", "a", "ab", "abc", "ab ",
      "Ω", "ω", "zz", "ßeta", "日本", "0", "00", " leading", "trailing ")
    val rows = (0 until 5000).map { i =>
      val g = i % 37
      val v =
        if (g % 5 == 4) None // group 4 mod 5: all NULL
        else if (rnd.nextInt(10) == 0) None
        else Some(pool(rnd.nextInt(pool.size)) + rnd.nextInt(1000).toString)
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(graft.functions.StrBounds.col(col("v"), col("v")).as("sb"))
      .select(col("g"), col("sb.mn").as("mn"), col("sb.mx").as("mx"))
    val want = df.groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(got.join(want, Seq("g"))
      .where(!(got("mn") <=> want("mn")) || !(got("mx") <=> want("mx")))
      .count() === 0L, "graft_str_bounds diverged from min/max(string)")
    // the two-level merge shape (min-of-mins through the same aggregate)
    val twoLevel = df.withColumn("b", col("g") % 3)
      .groupBy(col("g"), col("b"))
      .agg(graft.functions.StrBounds.col(col("v"), col("v")).as("sb"))
      .groupBy(col("g"))
      .agg(graft.functions.StrBounds.col(col("sb.mn"), col("sb.mx")).as("sb"))
      .select(col("g"), col("sb.mn").as("mn"), col("sb.mx").as("mx"))
    assert(twoLevel.join(want, Seq("g"))
      .where(!(twoLevel("mn") <=> want("mn")) || !(twoLevel("mx") <=> want("mx")))
      .count() === 0L, "two-level graft_str_bounds merge diverged")
    // it must execute hash-based, not sort-based
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"graft_str_bounds must run via ObjectHashAggregateExec:\n$plan")
  }

  test("aggregators are usable from AdEvent streams via fromAdEvent") {
    import spark.implicits._
    val es = Seq(
      AdEvent("ad1", "s1", "Click", java.sql.Timestamp.valueOf("1970-01-01 12:00:00")),
      AdEvent("ad1", "s1", "Impression", java.sql.Timestamp.valueOf("1970-01-01 12:00:01")))
      .toDS().map(AdCtr.fromAdEvent)
    val out = es.groupByKey(_.id).agg(CtrAggregators.capped.toColumn.name("c")).collect()
    assert(out.head._2 === AdCtr("ad1", 1, 1))
  }
}
