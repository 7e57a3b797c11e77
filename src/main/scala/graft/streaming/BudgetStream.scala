package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document admitted by [[BudgetStream.admit]]: `cum_tokens` is the
  * source's running token total INCLUDING this document (the
  * [[graft.operators.Curation.mixtureSample]] `cum_tokens` convention). */
final case class AdmittedDoc(doc_id: Long, source: String, tokens: Long,
  cum_tokens: Long)

/** Streaming token-budget admission (X164): the ingest-time half of
  * [[graft.operators.Curation.mixtureSample]] — a crawl declares
  * per-source token budgets and the stream admits documents until each
  * source's budget is spent, so the mixture is enforced AS DATA LANDS
  * instead of by a backfill cut. State per source is ONE long (the
  * running token total), kept in `flatMapGroupsWithState` like the
  * [[JobTracker]]/[[NearDupStream]] family.
  *
  * Semantics mirror the batch operator's PREFIX cut exactly: the running
  * total accumulates EVERY arriving document's tokens — admitted or not —
  * and a document is admitted iff the total after adding it still fits.
  * So the first over-budget document closes its source for good (the
  * batch `cum_tokens <= budget` filter over a monotone running sum),
  * rather than letting later small documents squeeze past a dropped big
  * one — admission must not depend on what was REJECTED before, or two
  * runs that disagree on one borderline doc diverge forever after.
  * Within that contract, WHICH documents are admitted is decided by
  * arrival order (the streaming reality); feed the batch operator's
  * (md5 shuffle key, id) order and the admitted set is bit-identical
  * (suite-pinned). Sources without a declared budget drop — the budgets
  * DECLARE the training set (the mixtureSample rule).
  *
  * Scale shape: one shuffle by source (the state partitioning), O(1)
  * state per source, Update-mode emission, no watermark needed (budget
  * state never expires by design — a mixture is for the corpus's
  * lifetime). */
object BudgetStream {

  /** Running token total for one source (admitted AND rejected). */
  final case class SourceSpend(seen: Long)

  /** Admit a (doc_id, source, tokens) stream (or batch Dataset — same
    * code path) against declared per-source budgets. */
  def admit(docs: Dataset[(Long, String, Long)],
      budgets: Map[String, Long]): Dataset[AdmittedDoc] = {
    require(budgets.nonEmpty, "need at least one source budget")
    budgets.foreach { case (s, b) =>
      require(b > 0, s"budget for '$s' must be positive, got $b") }
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(r => budgets.contains(r._2))
      .groupByKey(_._2)
      .flatMapGroupsWithState[SourceSpend, AdmittedDoc](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(Long, String, Long)],
            state: GroupState[SourceSpend]) =>
          var seen = state.getOption.map(_.seen).getOrElse(0L)
          val budget = budgets(src)
          val out = rows.flatMap { case (id, _, toks) =>
            seen += toks
            if (seen <= budget) Some(AdmittedDoc(id, src, toks, seen)) else None
          }.toList
          state.update(SourceSpend(seen))
          out.iterator
      }
  }
}
