package graft.expr

import graft.kernel.Hashing
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the kernel's hash functions.
  *
  * These are the custom-`Expression` tier of the extension ladder (compose
  * built-ins → native Expression → custom plan): unlike a Scala UDF or a
  * typed `Dataset.map`, they participate in whole-stage codegen — the
  * generated Java calls the kernel's static method directly on the
  * column's UTF8String, with no row deserialization, no closure dispatch
  * and no typed-boundary `DeserializeToObject`/`SerializeFromObject` pair
  * around them. Used by Dedup.simhashNearDups so the whole candidate
  * pipeline stays inside codegen. (Scala objects emit static forwarders,
  * so `graft.kernel.Hashing.simhash64(String)` is a valid Java call in
  * generated code.)
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    Hashing.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernel.Hashing.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override def nullSafeEval(input: Any): Any =
    Hashing.rollingFingerprint(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernel.Hashing.rollingFingerprint($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

/** splitmix64 finisher over a LONG column — the engine-independent row
  * hash behind deterministic sampling (ScalePatterns.stratifiedSample):
  * unlike `rand()` it is replayable under task retry, and unlike
  * `xxhash64` it is re-derivable in the DuckDB oracle's HUGEINT mod-2^64
  * SQL (the same mixCtes used by q33). */
case class Mix64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint argument")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override def nullSafeEval(input: Any): Any =
    Hashing.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernel.Hashing.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64Expr =
    copy(child = newChild)
}

/** Kernel FNV-1a (with the splitmix64 finisher baked in — see
  * Hashing.fnv1a) over a STRING column: the per-gram hash behind DSIR
  * bucket assignment (TextOps.dsirBucketWeights). Engine-independent and
  * re-derivable in the oracle's HUGEINT per-character fold + mix chain. */
case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv1a64"

  override def nullSafeEval(input: Any): Any =
    Hashing.fnv1a(input.asInstanceOf[UTF8String].toString, 0L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernel.Hashing.fnv1a($c.toString(), 0L)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
}

/** Q20 fixed-point integer log2 (Hashing.ilog2Q20) over a positive LONG
  * column — the float-free log behind DSIR's importance weights. The
  * DuckDB oracle unrolls the identical 20-step digit recurrence in
  * HUGEINT SQL, so log-ratio scores are integer-exact cross-engine. */
case class Ilog2Q20Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint argument")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ilog2q20"

  override def nullSafeEval(input: Any): Any =
    Hashing.ilog2Q20(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernel.Hashing.ilog2Q20($c)")

  override protected def withNewChildInternal(newChild: Expression): Ilog2Q20Expr =
    copy(child = newChild)
}

object KernelExpressions {

  /** Idempotent registration in the session's function registry; the
    * expressions are then usable from SQL and via the Column helpers. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64Expr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_fingerprint64",
      exprs => RollingFingerprintExpr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_mix64",
      exprs => Mix64Expr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_fnv1a64",
      exprs => Fnv1a64Expr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_ilog2q20",
      exprs => Ilog2Q20Expr(exprs.head), "built-in")
  }

  /** Column helpers (register + refer by name — version-stable across the
    * Spark 4 Column/ColumnNode split). */
  def simhash64(spark: SparkSession, colName: String): Column = {
    register(spark)
    expr(s"graft_simhash64($colName)")
  }

  def fingerprint64(spark: SparkSession, colName: String): Column = {
    register(spark)
    expr(s"graft_fingerprint64($colName)")
  }

  def mix64(spark: SparkSession, colName: String): Column = {
    register(spark)
    expr(s"graft_mix64($colName)")
  }
}
