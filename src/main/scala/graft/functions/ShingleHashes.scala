package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing a document's distinct n-gram
  * shingle ids (width 4 by default) — the signature primitive the whole
  * dedup family keys on ([[graft.ops.DedupOps]]); decontamination
  * ([[graft.ops.Curation.textDecontam]]) uses width 8, where a collision
  * with a benchmark shingle is rare enough to mean real overlap.
  *
  * One pass replaces a five-stage interpreted chain
  * (`split(lower(text)) → filter empties → transform(poly_hash) →
  * transform(sequence, combine) → array_distinct`) whose higher-order
  * lambdas pay closure dispatch and per-token UTF8String allocation and
  * never join whole-stage codegen. Arithmetic is bit-identical to that
  * chain and to the DuckDB oracles: tokens split on single spaces of the
  * lowercased text, per-token byte fold `acc*31 + byte mod 1e9+7`, 4-gram
  * combine `(((h1*31+h2)%M*31+h3)%M*31+h4)%M`, distinct keeping first
  * occurrence. A document with fewer than 4 tokens yields an empty array
  * (callers filter `size > 0`, equivalent to the old `size(th) >= 4`
  * pre-filter).
  *
  * Codegen participates by reference: the generated stage calls
  * [[compute]] directly instead of inlining the loop — one virtual call
  * per row, no interpreted lambdas.
  */
case class ShingleHashes(child: Expression, n: Int = 4) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  private val M = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  /** The fused tokenizer/hasher — public so generated code can call it. */
  def compute(input: UTF8String): ArrayData = {
    // Locale.ROOT lowering matches Spark's lower() on the ASCII corpus the
    // oracles are defined over (LlmOpsSpec pins the corpus to ASCII)
    val str = input.toString.toLowerCase(Locale.ROOT)
    val th = new scala.collection.mutable.ArrayBuffer[Long]()
    val len = str.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) {
          val bytes = str.substring(start, i).getBytes(StandardCharsets.UTF_8)
          var acc = 0L
          var k = 0
          while (k < bytes.length) { acc = (acc * 31 + (bytes(k) & 0xff)) % M; k += 1 }
          th += acc
        }
        start = i + 1
      }
      i += 1
    }
    if (th.length < n) new GenericArrayData(Array.empty[Long])
    else {
      val seen = new java.util.HashSet[java.lang.Long](th.length * 2)
      val out = new scala.collection.mutable.ArrayBuffer[Long](th.length - n + 1)
      var j = 0
      while (j + n - 1 < th.length) {
        // fold seeded with the first token hash — for n=4 this is exactly the
        // historical (((h1*31+h2)%M*31+h3)%M*31+h4)%M chain the oracles use
        var v = th(j)
        var k = 1
        while (k < n) { v = (v * 31 + th(j + k)) % M; k += 1 }
        if (seen.add(v)) out += v
        j += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column-level entry point: `shingle_hashes(c [, n])`. Width 4 is the
    * dedup default; decontamination uses wider (rarer) shingles. */
  def apply(c: Column): Column = apply(c, 4)
  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n))
}
