package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-memory record construction — the reference's typed-I/O record
  * generators (S1 + P10, `bigquery/SaveSpecificRecord.scala:36-50`,
  * `SaveTypedBigQuery.scala:16-28`): materialize ids 1..100 and build
  * records with string templating, timestamp arithmetic, a nullable
  * description, and a nested attributes array<struct<key,value>>.
  *
  * The reference stamps `Instant.now()`; here the timestamp is a fixed
  * base + id seconds so the oracle is deterministic. The nested attributes
  * are genuinely constructed as array<struct> (the BigQueryRecord REPEATED
  * STRUCT shape, `schema.json:22-38`) and then serialized canonically —
  * the driver's row-sorting compare needs scalar columns. */
object Records {

  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  def recordConstruction(s: SparkSession, dir: String): DataFrame = {
    val attrs = array(
      struct(lit("key 1").as("key"), col("id").cast("string").as("value")),
      struct(lit("key 2").as("key"), (col("id") * 2).cast("string").as("value")))
    s.range(1, 101).toDF()
      .select(
        col("id"),
        concat(lit("some name "), col("id")).as("name"),
        timestamp_micros(lit(baseUs) + col("id") * 1000000L).as("ts"),
        when(col("id") % 2 === 0, concat(lit("desc "), col("id"))).as("description"),
        concat_ws(";",
          transform(attrs, a => concat(a("key"), lit("="), a("value")))).as("attrs"))
  }

  val recordConstructionSql: String =
    """SELECT id,
      |  'some name ' || id AS name,
      |  make_timestamp(1704067200000000 + id * 1000000) AS ts,
      |  CASE WHEN id % 2 = 0 THEN 'desc ' || id END AS description,
      |  'key 1=' || id || ';key 2=' || (id * 2) AS attrs
      |FROM range(1, 101) t(id)""".stripMargin
}
