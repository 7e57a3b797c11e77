package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the [[QueryBuilder]] AST into a Spark plan.
  *
  * The reference concatenates SQL strings and lets MySQL plan them
  * (`src/query/QueryBuilder.php:108-129`); here every predicate becomes a
  * `Column` so Catalyst gets a fully declarative plan — predicate pushdown,
  * column pruning and join planning are automatic.
  *
  * EAV meta predicates (`src/query/parts/Filter.php:96-100`:
  * `pm.meta_key = f AND pm.meta_value <op> v` over the joined fan-out, then
  * `DISTINCT p.ID` — i.e. EXISTS semantics) are compiled to per-predicate
  * boolean flag columns: postmeta is filtered down to the tiny matching id
  * set first, then joined back. This supports meta predicates mixed into OR
  * groups, which a plain chain of semi joins cannot express. At scale the
  * postmeta scan is filtered by `meta_key` before the shuffle, so each flag
  * join moves only matching post ids.
  */
object QueryCompiler {

  /** Literal -> Column (Filter.php:106-131 typed literal handling). */
  def literal(v: FilterValue): Column = v match {
    case FilterValue.I(x)  => lit(x)
    case FilterValue.F(x)  => lit(x)
    case FilterValue.S(x)  => lit(x)
    case FilterValue.T(x)  => lit(x)
    case FilterValue.L(xs) => lit(xs.map(raw).toArray)
  }

  private def raw(v: FilterValue): Any = v match {
    case FilterValue.I(x)  => x
    case FilterValue.F(x)  => x
    case FilterValue.S(x)  => x
    case FilterValue.T(x)  => x
    case FilterValue.L(xs) => xs.map(raw)
  }

  /** One non-meta predicate over a resolvable column.
    * LIKE wraps '%v%' like the reference (Filter.php:111) => contains.
    * Empty IN-lists degenerate to literal true (Filter.php:87-93) — for
    * NOT IN too, matching the reference's (vacuously-true) behavior. */
  def predicate(f: Filter, resolve: String => Column): Column = {
    val c = resolve(f.field)
    f.op match {
      case FilterOp.Eq => c === literal(f.value)
      case FilterOp.Ne => c =!= literal(f.value)
      case FilterOp.Gt => c > literal(f.value)
      case FilterOp.Lt => c < literal(f.value)
      case FilterOp.Ge => c >= literal(f.value)
      case FilterOp.Le => c <= literal(f.value)
      case FilterOp.In =>
        f.value match {
          case FilterValue.L(xs) if xs.isEmpty => lit(true) // Filter.php:87-93
          case FilterValue.L(xs)               => c.isin(xs.map(raw): _*)
          case other                           => c === literal(other)
        }
      case FilterOp.NotIn =>
        f.value match {
          case FilterValue.L(xs) if xs.isEmpty => lit(true) // vacuous NOT IN ()
          case FilterValue.L(xs)               => !c.isin(xs.map(raw): _*)
          case other                           => c =!= literal(other)
        }
      case FilterOp.Like =>
        f.value match { case FilterValue.S(s) => c.contains(s); case v => c.contains(literal(v)) }
      case FilterOp.NotLike =>
        f.value match { case FilterValue.S(s) => !c.contains(s); case v => !c.contains(literal(v)) }
    }
  }

  /** Same predicate applied to a postmeta `meta_value` column. NB the
    * reference compares `meta_value` as a raw string (Filter.php:97) —
    * lexicographic for numbers — replicated here on purpose; see
    * SURVEY.md §7 "EAV semantics". */
  private def metaValuePredicate(f: Filter): Column = predicate(f, _ => col("meta_value"))

  private def flagName(i: Int): String = s"__meta_flag_$i"

  /** posts + one boolean flag column per distinct meta predicate.
    * Each flag = EXISTS(postmeta row with that key matching that predicate). */
  def withMetaFlags(posts: DataFrame, postmeta: DataFrame, metaFilters: Seq[Filter]): DataFrame =
    metaFilters.zipWithIndex.foldLeft(posts) { case (acc, (f, i)) =>
      val matching = postmeta
        .filter(col("meta_key") === f.field && metaValuePredicate(f))
        .select(col("post_id").as("__mf_post_id"))
        .distinct()
        .withColumn(flagName(i), lit(true))
      acc.join(matching, acc("ID") === col("__mf_post_id"), "left")
        .drop("__mf_post_id")
        .withColumn(flagName(i), coalesce(col(flagName(i)), lit(false)))
    }

  /** Full AND-of-OR condition (QueryBuilder.php:108-116) over a frame that
    * already has meta flags attached. */
  def condition(qb: QueryBuilder, resolve: String => Column): Column = {
    val metaIdx = qb.metaFilters.zipWithIndex.toMap
    val groups = qb.groups.filter(_.nonEmpty).map { g =>
      g.map { f =>
        if (f.meta) col(flagName(metaIdx(f)))
        else predicate(f, resolve)
      }.reduce(_ || _)
    }
    if (groups.isEmpty) lit(true) else groups.reduce(_ && _)
  }

  /** Candidate post ids satisfying the builder's filters — the Spark form of
    * the reference's stage-1 subquery (`src/VectorTable.php:104-114`).
    * Returns a single-column `post_id` frame, deduplicated. */
  def candidatePosts(posts: DataFrame, postmeta: DataFrame, qb: QueryBuilder): DataFrame = {
    val flagged = withMetaFlags(posts, postmeta, qb.metaFilters)
    flagged
      .filter(condition(qb, flagged.apply))
      .select(col("ID").as("post_id"))
      .distinct()
  }

  /** Meta sort-key casts (Sort.php:42-49). MySQL's bare `CAST(x AS DECIMAL)`
    * is DECIMAL(10,0); we keep fractional precision intentionally
    * (documented divergence — MySQL truncates to integer). `try_cast`, not
    * `cast`: EAV meta values are arbitrary user strings, and MySQL casts
    * garbage leniently (-> 0/NULL) where ANSI Spark would fail the whole
    * query; garbage here sorts as NULL. */
  def castMeta(c: Column, cast: MetaCast): Column = cast match {
    case MetaCast.AsText    => c
    case MetaCast.AsDecimal => c.try_cast(DecimalType(38, 10))
    case MetaCast.AsDate    => c.try_cast(DateType)
  }

  /** Attach one `__meta_sort_<key>` column per meta sort key via the
    * aggregated-join rewrite of the reference's N-way postmeta self-join
    * (`src/VectorTable.php:198-205`): MAX(meta_value) per post per key
    * (the MAX-collapse at `VectorTable.php:203`), one aggregated join per
    * key instead of a row-multiplying fan-out + GROUP BY. */
  def withMetaSortKeys(df: DataFrame, postmeta: DataFrame, keys: Seq[String],
      postIdCol: String = "post_id"): DataFrame =
    keys.foldLeft(df) { (acc, k) =>
      val agg = postmeta
        .filter(col("meta_key") === k)
        .groupBy(col("post_id").as("__ms_post_id"))
        .agg(max(col("meta_value")).as(s"__meta_sort_$k"))
      acc.join(agg, acc(postIdCol) === col("__ms_post_id"), "left").drop("__ms_post_id")
    }

  /** Sort expressions (Sort.php:39-53 + QueryBuilder.php:123-129). */
  def sortColumns(qb: QueryBuilder, resolve: String => Column): Seq[Column] =
    qb.sorts.map { s =>
      val base = s.meta match {
        case Some(c) => castMeta(col(s"__meta_sort_${s.field}"), c)
        case None    => resolve(s.field)
      }
      s.dir match { case SortDir.Asc => base.asc; case SortDir.Desc => base.desc }
    }
}
