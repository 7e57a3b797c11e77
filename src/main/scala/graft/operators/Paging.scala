package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyset ("search-after") pagination (X179) — the scale-honest form of
  * the reference's LIMIT/OFFSET listing (SURVEY §2 T9,
  * `VectorTableQueue.php` paged stats): OFFSET p·n forces every
  * partition to produce and discard the first p·n rows of its sort on
  * EVERY page, so walking a 100 TB result set is quadratic in pages —
  * while a keyset cursor turns the page boundary into a plain
  * PREDICATE on the sort key, which pushes down to the parquet scan
  * (row groups before the cursor never decode) and leaves per-page work
  * ∝ one page plus the scan's pruned remainder.
  *
  * The cursor is the last row of the previous page under a TOTAL order
  * — the caller includes a unique tiebreaker (the id) as the final sort
  * key, exactly as every keyset-paginated API requires; with a total
  * order, chained pages are provably equal to the OFFSET answer
  * (q219's oracle states that equivalence literally).
  *
  * Plan shape: filter(lexicographic-after) → orderBy → limit compiles
  * to PushedFilters on the leading key + TakeOrderedAndProject (partial
  * per-partition top-n, merged on the driver) — no global sort, no
  * offset discard, suite plan-audited.
  */
object Paging {

  /** One page of `n` rows strictly after the `after` cursor in the
    * total order given by `keys` (column name, ascending?).
    *
    * @param after the previous page's last row's key values, in `keys`
    *              order; None = the first page. Values must be non-null
    *              (keyset cursors over nullable keys need a null-rank
    *              convention the caller encodes first).
    */
  def keysetPage(df: DataFrame, keys: Seq[(String, Boolean)],
      after: Option[Seq[Any]], n: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one sort key")
    require(keys.map(_._1).distinct.size == keys.size,
      s"duplicate sort key in ${keys.map(_._1)}")
    require(n > 0, s"page size must be positive, got $n")
    after.foreach(a => require(a.size == keys.size,
      s"cursor has ${a.size} values for ${keys.size} keys"))
    val pred: Column = after.map { a =>
      // lexicographic strict-after: key i breaks the tie of keys 0..i-1
      keys.indices.map { i =>
        val tiePrefix = (0 until i)
          .map(j => col(keys(j)._1) === lit(a(j)))
          .foldLeft(lit(true))(_ && _)
        val (k, asc) = keys(i)
        tiePrefix && (if (asc) col(k) > lit(a(i)) else col(k) < lit(a(i)))
      }.reduce(_ || _)
    }.getOrElse(lit(true))
    val order = keys.map { case (k, asc) =>
      if (asc) col(k).asc else col(k).desc }
    df.filter(pred).orderBy(order: _*).limit(n)
  }
}
