package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Zone-FREE timestamp ↔ micros conversions. Spark stores both timestamp
 * kinds as a long micros value — micros since epoch UTC for session-TZ
 * `TimestampType`, wall-clock micros for `TimestampNTZType` — so extracting
 * or injecting that value is the identity function on the internal
 * representation. The built-in routes are NOT zone-free where NTZ is
 * involved: `unix_micros` rejects NTZ outright, and `cast` between the two
 * kinds re-renders through the session time zone, which shifts values under
 * a non-UTC zone and is non-injective across DST transitions. These two
 * expressions make the events pipeline (gap sessionization, CDC envelope
 * round-trips, the NTZ gate outputs) independent of
 * `spark.sql.session.timeZone` entirely.
 */
case class WallMicrosExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires timestamp or timestamp_ntz, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "wall_micros"

  override protected def withNewChildInternal(newChild: Expression): WallMicrosExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
}

/** Long micros → `TimestampNTZType`, interpreting the value as wall-clock
  * micros since the epoch (the NTZ internal representation) — the zone-free
  * dual of [[WallMicrosExpr]]; `timestamp_micros` only builds session-TZ
  * timestamps. */
case class MicrosToNtzExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint micros, got ${dt.catalogString}")
  }

  override def dataType: DataType = TimestampNTZType
  override def prettyName: String = "micros_to_ntz"

  override protected def withNewChildInternal(newChild: Expression): MicrosToNtzExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
}

object TimestampMicrosExprs {
  /** Internal micros of either timestamp kind (zone-free). */
  def wallMicros(c: Column): Column =
    ColumnBridge.column(WallMicrosExpr(ColumnBridge.expression(c)))

  /** Long micros → NTZ wall-clock timestamp (zone-free). */
  def microsToNtz(c: Column): Column =
    ColumnBridge.column(MicrosToNtzExpr(ColumnBridge.expression(c)))
}
