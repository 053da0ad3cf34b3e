package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.EntityResolution

/** At-ingestion entity resolution — the streaming twin of the batch
  * `entity_resolution` / `entity_incremental` pair: name events arrive,
  * each gets an entity label AS IT ARRIVES, and label CORRECTIONS are
  * emitted whenever a later arrival merges standing components (a
  * bridging name would otherwise strand earlier emissions on stale
  * labels — update-mode revision, the W6/W9 late-firing discipline
  * applied to linkage). Downstream consumes latest-per-name, and the
  * spec pins exactly that: the last emission per name equals the batch
  * closure over every event streamed, under arbitrary micro-batching.
  *
  * Shape: one shuffle on the blocking key (the head noun — SAME
  * derivation as the batch operator, `EntityResolution.universeOf`);
  * state per block = its distinct-name membership (name, nid, label) —
  * vocabulary-bounded, the same frame the batch self-join materializes,
  * never the event stream. Matching inside the state handler is the
  * same integer edit-distance ≤ [[EntityResolution.editMax]] contract,
  * and merging rewrites the matched components' labels in place, so the
  * state's labels are ALWAYS the exact closure over the names seen so
  * far — no daily close needed to repair them (that is what buys the
  * strong spec).
  *
  * Preconditions, documented like every incremental entry's:
  *  - ids arrive in increasing order (append-only ingest — the
  *    `dedup_incremental` discipline), so first-arrival id = min id and
  *    labels are batch-identical. A re-delivered name is recognized in
  *    state and re-emits its CURRENT label (at-least-once safe).
  *  - a name with no second token has a null blocking key in batch
  *    (null never equi-joins): the stream twin mirrors it by labelling
  *    such names as singletons without consulting block state.
  *
  * Per-event cost is O(|block|) — the linear match scan over the
  * block's membership (and a membership rewrite when a merge fires),
  * the in-state analog of the batch blocked self-join's per-name
  * candidate list. A pathologically hot blocking key gets the same
  * treatment as batch (`vocab_overlap`'s df-cap discipline: cap or
  * re-key the block), not a different algorithm. */
object StreamEntityResolve {

  final case class Member(name: String, nid: Long, label: Long)
  final case class BlockState(members: List[Member])
  final case class LabelOut(p_name: String, nid: Long, entity_id: Long)

  private def blkOf(name: String): String = {
    val parts = name.split(" ")
    if (parts.length > 1) parts(1) else ""
  }

  /** Plain integer Levenshtein — the in-state twin of the codegen'd
    * `levenshtein` expression the batch verify uses (same value on the
    * same inputs: both are the textbook DP over unicode code units). */
  private[streaming] def editDistance(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var curr = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      curr(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Resolve a stream of (p_partkey, p_name) events. Emits the new
    * name's label on arrival plus a corrected (name, label) row for
    * every standing member a merge relabels. */
  def resolve(s: SparkSession, events: DataFrame): Dataset[LabelOut] = {
    import s.implicits._
    events
      .selectExpr("CAST(p_partkey AS LONG) AS pk", "p_name")
      .as[(Long, String)]
      .groupByKey { case (_, name) => blkOf(name) }
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (blk: String, rows: Iterator[(Long, String)],
         state: GroupState[BlockState]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[LabelOut]
          // id order within the batch: arrival order is the contract,
          // and ids are monotone under append-only ingest
          rows.toSeq.sortBy(_._1).foreach { case (pk, name) =>
            members.find(_.name == name) match {
              case Some(m) =>
                // re-delivery: the name is known; re-emit its CURRENT
                // label (idempotent downstream under latest-wins)
                out += LabelOut(name, m.nid, m.label)
              case None if blk.isEmpty =>
                // null blocking key never matches in batch — singleton,
                // but still remembered so a re-delivery keeps its nid
                members ::= Member(name, pk, pk)
                out += LabelOut(name, pk, pk)
              case None =>
                val matched = members
                  .filter(m => editDistance(m.name, name) <= EntityResolution.editMax)
                val lbls = matched.map(_.label).distinct
                val newLabel = (pk :: lbls).min
                val relabeled = members.filter(m =>
                  lbls.contains(m.label) && m.label != newLabel)
                members = members.map(m =>
                  if (lbls.contains(m.label)) m.copy(label = newLabel) else m)
                members ::= Member(name, pk, newLabel)
                out += LabelOut(name, pk, newLabel)
                // corrections: every member a component merge relabels
                relabeled.foreach(m => out += LabelOut(m.name, m.nid, newLabel))
            }
          }
          state.update(BlockState(members))
          out.iterator
      }
  }
}
