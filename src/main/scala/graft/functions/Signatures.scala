package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signature expressions over a shingle-id array (`array<long>`, from
  * [[ShingleHashes]]): per-row MinHash and SimHash computed in a single
  * array pass each, replacing per-permutation / per-bit interpreted
  * higher-order folds. Both are bit-identical to the formulations they
  * replace, which is what the DuckDB oracles re-derive. Codegen
  * participates by reference — the generated stage calls `compute`
  * directly, no interpreted lambdas.
  */

/** MinHash signature: `min((h*a_j + b_j) mod prime)` over the array for
  * each permutation j — one array pass for all permutations, replacing
  * `array_min(transform(...))` × perms.length interpreted folds. Empty
  * input yields nulls-free `prime` sentinels (matches `array_min` of an
  * empty transform being null — callers filter empty arrays out first;
  * the sentinel keeps the output type containsNull=false). */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)], prime: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<long>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val as = perms.map(_._1).toArray
  private val bs = perms.map(_._2).toArray

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val mins = Array.fill(perms.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = input.getLong(i)
      var j = 0
      while (j < mins.length) {
        val v = (h * as(j) + bs(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, perms: Seq[(Long, Long)], prime: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), perms, prime))
}

/** SimHash: bit j of the result is set when the ±1 votes of `(h >> j) & 1`
  * over the array sum positive — one array pass accumulating all `bits`
  * vote counters, replacing `bits` interpreted aggregate folds plus the
  * bit-assembly expression. */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires array<long>, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  def compute(input: ArrayData): Long = {
    val votes = new Array[Long](bits)
    val n = input.numElements()
    var i = 0
    while (i < n) {
      val h = input.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashBits", this, classOf[SimHashBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(c: Column, bits: Int): Column =
    Bridge.column(SimHashBits(Bridge.expression(c), bits))
}
