package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared grid-window Karp-Rabin hashing for span-level dedup.
  *
  * Emits the [[RollingHash]] fold (`h = fold(bytes, (h*31+b) mod 1e9+7)`)
  * of every `window`-byte substring starting at byte offsets
  * `0, stride, 2*stride, …` — the fixed sampling grid that makes
  * cross-document repeated-span detection a bucketed equi-join instead of
  * an all-substrings comparison. One O(n) pass per document: the hash
  * slides by one byte (subtract the outgoing byte times `31^(window-1)`,
  * multiply by 31, add the incoming byte) and only grid positions are
  * emitted, so `stride` controls output density (and downstream shuffle
  * volume), not scan cost.
  *
  * Bit-parity contract for the DuckDB oracle: each emitted value equals
  * [[RollingHash]] of `substr(text, pos+1, window)` — for ASCII corpora
  * the byte fold equals the `ascii` codepoint fold the oracle replays
  * (same caveat as [[RollingHash]]).
  */
object WindowHashing {

  private val Mod = 1000000007L

  /** Grid-window hashes; empty array when the text is shorter than
    * `window` (such docs can never share a full span).
    */
  def windowHashes(text: UTF8String, window: Int, stride: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long]((n - window) / stride + 1)
    var pow = 1L // 31^(window-1) mod Mod — the outgoing byte's weight
    var k = 1
    while (k < window) { pow = pow * 31L % Mod; k += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = (h * 31L + (bytes(i) & 0xff)) % Mod; i += 1 }
    out(0) = h
    var p = 1
    var emitted = 1
    while (p <= n - window) {
      h = ((h + Mod - (bytes(p - 1) & 0xff) * pow % Mod) % Mod * 31L +
        (bytes(p + window - 1) & 0xff)) % Mod
      if (p % stride == 0) { out(emitted) = h; emitted += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `window_rolling_hashes(text)`: grid-window Karp-Rabin hashes (see
  * [[WindowHashing]]). Codegen emits a single static call — the loop
  * lives in compiled Scala (the [[ShingleHashes]] pattern).
  */
case class WindowRollingHashes(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window > 0 && stride > 0, "window and stride must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    ShingleHashes.checkText(child.dataType, "window_rolling_hashes")

  override def nullSafeEval(input: Any): Any =
    WindowHashing.windowHashes(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WindowHashing.windowHashes($x, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowRollingHashes {
  def of(text: Column, window: Int, stride: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(WindowRollingHashes(expression(text), window, stride))
  }
}
