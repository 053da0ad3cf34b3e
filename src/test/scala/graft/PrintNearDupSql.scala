package graft

// Dev-only: print the embedding_near_dups DuckDB oracle for a given band
// width — the committed oracle entry mirrors the driver's sf0.01 corpus
// (b = 2); a local sf1 verification needs the b the self-sizing picks at
// 20k vectors (b = 4), swapped into oracle_sql.json before check.py runs.
//   sbt "Test/runMain graft.PrintNearDupSql 4"
object PrintNearDupSql {
  def main(args: Array[String]): Unit = {
    val bits = args.headOption.map(_.toInt).getOrElse(4)
    println("[neardupsql-begin]")
    println(graft.operators.Similarity.embeddingNearDupsSqlFor(bits))
    println("[neardupsql-end]")
  }
}
