package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/**
 * Exact per-group interpolated percentiles (Spark `percentile` — the
 * hash-verified twin of DuckDB `quantile_cont`, gate `x_quantiles`) — the
 * ONE implementation behind the HTTP `/quantiles` endpoint and the shell
 * `quantiles` verb, so validation and alias rules cannot diverge between
 * surfaces.
 */
object Quantiles {

  /** `0.25 -> q25`; probs landing on the same rounded percent dedupe with
    * an ordinal suffix (`q25, q25_2`) — duplicate column names would emit
    * duplicate JSON keys on the HTTP face. */
  private[ops] def aliases(probs: Seq[Double]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    probs.map { q =>
      val base = s"q${(q * 100).round}"
      val n = seen.updateWith(base)(c => Some(c.getOrElse(0) + 1)).get
      if (n == 1) base else s"${base}_$n"
    }
  }

  def of(df: DataFrame, value: String, group: Option[String],
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(q => q >= 0.0 && q <= 1.0),
      "probs must be fractions in [0, 1]")
    val aggs = probs.zip(aliases(probs)).map { case (q, a) =>
      expr(s"percentile($value, $q)").as(a)
    }
    group match {
      case Some(g) => df.groupBy(g).agg(aggs.head, aggs.tail: _*).orderBy(g)
      case None => df.agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Parse a comma-separated prob list; None when `s` is not one (the
    * shell uses this to disambiguate an optional group column from an
    * optional prob list — `1` and `.5,.9` are probs, `status` is not). */
  def parseProbs(s: String): Option[Seq[Double]] =
    scala.util.Try(s.split(',').toSeq.map(_.trim.toDouble)).toOption
      .filter(ps => ps.nonEmpty && ps.forall(q => q >= 0.0 && q <= 1.0))
}
