package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runtime advisory for the CORPUS-COUPLED streaming operators on the
  * wrong state store (verdict r14 Next #6 — turn the streaming matrix's
  * measured guidance into something the engine SAYS at the moment it
  * matters, not prose a user must have read).
  *
  * The r14 three-point trend (BASELINE.md, "Corpus-coupled legs"): every
  * operator keeping per-key state that grows with corpus key cardinality
  * collapsed on the default heap-map store as the corpus scaled —
  * sf1→sf10 throughput ratios 0.25 (pack), 0.45 (repeat), 0.56
  * (lookup_heavy), 0.66 (lookup), 0.68 (wsample) — because the heap
  * store pays a full-map copy per trigger, so cost tracks STANDING state
  * size. Every RocksDB twin held ≥ 0.90 at the same points (incremental
  * writes, no copy). Bounded-window operators (state ∝ keys × window,
  * not corpus) are flat on either store and stay silent here.
  *
  * The check runs at PIPELINE-CONSTRUCTION time (the operators call it
  * while assembling their plan), so the warning lands in the log before
  * the first trigger — when changing the provider is still a one-conf
  * restart, not a stateful-query migration. */
object StoreAdvisory {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Last advisory emitted (None after [[reset]]) — spec observability;
    * suites run sequentially. */
  @volatile private[graft] var last: Option[String] = None
  private[graft] def reset(): Unit = last = None

  /** Called by each corpus-coupled operator as it assembles its stream:
    * warns (once per call site invocation) when the session's state
    * store is the default heap map. Returns the advisory for callers
    * that surface it themselves; None on RocksDB. */
  def corpusCoupled(s: SparkSession, op: String): Option[String] = {
    val provider = s.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .getOrElse("")
    if (provider.contains("RocksDB")) None
    else {
      val msg = s"graft store advisory: '$op' keeps per-key state that " +
        "grows with corpus key cardinality; the default heap-map state " +
        "store pays a full-map copy per trigger and its sf1->sf10 " +
        "throughput ratio measured 0.25-0.68 while every RocksDB twin " +
        "held >= 0.90 (BASELINE.md streaming-matrix three-point trend). " +
        "Set spark.sql.streaming.stateStore.providerClass to " +
        "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider for corpus-coupled state."
      log.warn(msg)
      last = Some(msg)
      Some(msg)
    }
  }
}
