package graft.query

import java.sql.Timestamp

/** Typed query AST replacing the reference's string-based SQL assembly
  * (`src/query/QueryBuilder.php`, `src/query/parts/Filter.php`,
  * `src/query/parts/Sort.php`). Invalid operators/types are unrepresentable
  * (the reference throws at runtime, `Filter.php:45-47,64-66`).
  */
sealed abstract class FilterOp(val sql: String)
object FilterOp {
  // Filter.php:14-32 comparison operators
  case object Eq extends FilterOp("=")
  case object Ne extends FilterOp("!=")
  case object Gt extends FilterOp(">")
  case object Lt extends FilterOp("<")
  case object Ge extends FilterOp(">=")
  case object Le extends FilterOp("<=")
  // Filter.php:33-38 set membership
  case object In    extends FilterOp("IN")
  case object NotIn extends FilterOp("NOT IN")
  // Filter.php:39-44 substring match (value wrapped '%v%', Filter.php:111)
  case object Like    extends FilterOp("LIKE")
  case object NotLike extends FilterOp("NOT LIKE")
}

/** Typed literal (Filter.php:50-73 accepts string/int/float/DateTime/array). */
sealed trait FilterValue
object FilterValue {
  final case class I(v: Long)            extends FilterValue
  final case class F(v: Double)          extends FilterValue
  final case class S(v: String)          extends FilterValue
  final case class T(v: Timestamp)       extends FilterValue
  final case class L(vs: Seq[FilterValue]) extends FilterValue
}

/** One predicate. `meta=true` targets the postmeta EAV table
  * (Filter.php:96-100); otherwise a posts column (Filter.php:99 path). */
final case class Filter(field: String, op: FilterOp, value: FilterValue, meta: Boolean = false)

sealed abstract class SortDir(val asc: Boolean)
object SortDir { case object Asc extends SortDir(true); case object Desc extends SortDir(false) }

/** Cast applied to EAV meta values before sorting (Sort.php:42-49). */
sealed trait MetaCast
object MetaCast {
  case object AsText    extends MetaCast
  case object AsDecimal extends MetaCast // CAST(x AS DECIMAL), Sort.php:44
  case object AsDate    extends MetaCast // CAST(x AS DATE),    Sort.php:46
}

/** One sort key. `meta=Some(cast)` sorts by a postmeta value
  * (MAX-collapsed per post, `VectorTable.php:203`). */
final case class Sort(field: String, dir: SortDir, meta: Option[MetaCast] = None)

/** AND-of-OR filter groups + ordered sort keys
  * (`QueryBuilder.php:27-49,108-129`): members of a group are OR'd,
  * groups are AND'd. */
final case class QueryBuilder(
    groups: Seq[Seq[Filter]] = Seq.empty,
    sorts: Seq[Sort] = Seq.empty) {
  def withGroup(filters: Filter*): QueryBuilder = copy(groups = groups :+ filters.toSeq)
  def withSort(s: Sort): QueryBuilder = copy(sorts = sorts :+ s)
  def hasFilters: Boolean = groups.exists(_.nonEmpty)
  def hasSorts: Boolean = sorts.nonEmpty
  /** Distinct meta (field, op, value) predicates across all groups. */
  def metaFilters: Seq[Filter] = groups.flatten.filter(_.meta).distinct
  def metaSortKeys: Seq[String] = sorts.filter(_.meta.isDefined).map(_.field).distinct
}
