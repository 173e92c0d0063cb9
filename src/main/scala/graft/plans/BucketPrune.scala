package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, In, InSet, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.DataType

/**
 * Driver-side bucket-id evaluation shared by the table API
 * ([[graft.table.GraftTable.lookupKey]]) and the optimizer rule below: the
 * exact expression the write path's `xxhash64` column uses (XxHash64,
 * seed 42, after a cast to the bucket column's type), evaluated on a
 * literal — zero Spark jobs.
 */
object BucketHash {

  def bucketIdOf(lit: Literal, dt: DataType, n: Int, timeZone: String): Int = {
    val cast: Expression = if (lit.dataType == dt) lit else Cast(lit, dt, Option(timeZone))
    val h = new XxHash64(Seq(cast)).eval(null).asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }

  /** External (Scala-typed) value variant for driver API calls. */
  def bucketId(value: Any, dt: DataType, n: Int, timeZone: String): Int =
    bucketIdOf(Literal(value), dt, n, timeZone)
}

object BucketPruneRule {
  /** Reader options [[graft.table.GraftTable]] attaches to bucketed scans. */
  val KeyOption = "graft.bucket.key"
  val CountOption = "graft.bucket.count"

  private val BucketDir = ".*__bucket=(\\d+)$".r

  private[plans] def bucketOf(p: org.apache.hadoop.fs.Path): Option[Int] =
    p.toString match {
      case BucketDir(b) => Some(b.toInt)
      case _ => None
    }
}

/**
 * Catalyst optimizer rule: PLAN-LEVEL bucket pruning for graft tables. A
 * filter that pins the bucket key to literal values (`key = v`,
 * `key IN (...)`) over a bucketed-table scan is rewritten to scan ONLY the
 * matching `__bucket=k` leaf dirs — the automatic form of
 * [[graft.table.GraftTable.lookupKey]]: a user filtering a plain `read()`
 * by key gets the 1/numBuckets scan without knowing the layout exists.
 *
 * Registered via [[GraftExtensions]]
 * (`spark.sql.extensions=graft.plans.GraftExtensions`). The rule runs
 * inside the operator-optimization fixed point, after predicate pushdown
 * has placed the filter against the relation; it is idempotent (an
 * already-pruned scan keeps all its paths and is left untouched). Paths
 * without a bucket marker are conservatively kept.
 */
case class BucketPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import BucketPruneRule._

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case rel: HadoopFsRelation if rel.options.contains(KeyOption) =>
          val bk = rel.options(KeyOption)
          val n = rel.options(CountOption).toInt
          val dt = rel.dataSchema.find(_.name == bk).map(_.dataType)
          keyLiterals(cond, bk) match {
            case Some(vals) if dt.isDefined && vals.nonEmpty =>
              val tz = spark.sessionState.conf.sessionLocalTimeZone
              val buckets = vals.map(v => BucketHash.bucketIdOf(v, dt.get, n, tz))
              val roots = rel.location.rootPaths
              val kept = roots.filter(p => bucketOf(p).forall(buckets.contains))
              if (kept.size == roots.size) f
              else {
                val idx = new InMemoryFileIndex(spark, kept, rel.options, Some(rel.dataSchema))
                Filter(cond, lr.copy(relation = rel.copy(location = idx)(spark)))
              }
            case _ => f
          }
        case _ => f
      }
  }

  /**
   * Literal values the bucket key is pinned to, if some conjunct of the
   * filter restricts it: every row the filter accepts has `key ∈ result`.
   * NULL literals are skipped (the filter is vacuous; no pruning needed).
   */
  private def keyLiterals(cond: Expression, bk: String): Option[Set[Literal]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).collectFirst {
      case EqualTo(a: AttributeReference, l: Literal) if a.name == bk && l.value != null =>
        Set(l)
      case EqualTo(l: Literal, a: AttributeReference) if a.name == bk && l.value != null =>
        Set(l)
      case In(a: AttributeReference, vs) if a.name == bk &&
          vs.forall(v => v.isInstanceOf[Literal] && v.asInstanceOf[Literal].value != null) =>
        vs.map(_.asInstanceOf[Literal]).toSet
      case InSet(a: AttributeReference, vs) if a.name == bk && !vs.contains(null) =>
        vs.map(v => Literal(v, a.dataType))
    }
  }
}

/** `spark.sql.extensions` entry point (also usable via `.withExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(BucketPruneRule.apply)
    ext.injectOptimizerRule(MergeKeyPruneRule.apply)
  }
}
