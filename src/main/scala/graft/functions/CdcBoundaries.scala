package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression finding content-defined chunk boundaries —
  * the Karp-Rabin rolling-hash cut-point detector behind CDC dedup
  * pipelines: a position is a boundary when the hash of the `w`-byte
  * window ending there is ≡ 0 (mod `mask`), so chunk edges are decided by
  * CONTENT, not offsets, and an insertion early in a document only
  * perturbs the one chunk it lands in (fixed-stride chunking would shift
  * every later chunk and defeat chunk-level dedup).
  *
  * Returns the 1-based END positions of boundary windows, ascending;
  * empty array when the document is shorter than one window. The window
  * hash is the same `acc*31 + byte (mod 1e9+7)` byte fold as
  * [[PolyHash]], maintained incrementally — the oldest byte leaves via a
  * precomputed `31^w mod M` multiplier, so the whole document costs O(n)
  * instead of the O(n·w) a per-window refold (or the higher-order-lambda
  * formulation over `sequence()`) would pay. Byte positions equal char
  * positions on the ASCII corpus the oracles are pinned to
  * (LlmOpsSpec) — the same contract [[ShingleHashes]] documents.
  *
  * Codegen participates by reference: the generated stage calls
  * [[compute]] directly — one virtual call per row, no interpreted
  * lambdas in the scan stage.
  */
case class CdcBoundaries(child: Expression, w: Int = 16, mask: Int = 64)
    extends UnaryExpression {

  require(w >= 1, s"window width must be >= 1, got $w")
  require(mask >= 1, s"boundary modulus must be >= 1, got $mask")

  private val M = 1000000007L

  /** 31^w mod M — the outgoing byte's coefficient after each shift. */
  private val pw: Long = {
    var r = 1L; var i = 0
    while (i < w) { r = r * 31 % M; i += 1 }
    r
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  /** The rolling-hash scan — public so generated code can call it. */
  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31 + (bytes(i) & 0xff)) % M
      if (i >= w) // expel the byte that just left the window
        h = (h + M - (bytes(i - w) & 0xff) * pw % M) % M
      if (i >= w - 1 && h % mask == 0) out += i + 1
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcBoundaries", this, classOf[CdcBoundaries].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Column-level entry point: window 16, modulus 64 → ~64-byte expected
    * chunks; real deployments tune both (and add min/max clamps) to the
    * store's dedup granularity. */
  def apply(c: Column): Column = apply(c, 16, 64)
  def apply(c: Column, w: Int, mask: Int): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(c), w, mask))
}
