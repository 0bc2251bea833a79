package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All word n-gram shingle hashes of a token array in ONE pass:
  * `array<string> → array<long>`, one 64-bit hash per n-consecutive-token
  * window (empty array when the document has fewer than n tokens —
  * standard w-shingle semantics).
  *
  * Why a native `Expression`: the obvious Spark-level spellings are both
  * orders of magnitude off the pace at 100 TB. Concatenating shingle
  * STRINGS (zip_with+concat) allocates every window's text — the
  * round-5 dedup scaling measured that stage allocation-bound (2→8
  * efficiency 0.73). Hashing windows with higher-order functions
  * (`transform`+`xxhash64`) avoids the allocation but drops out of
  * whole-stage codegen into per-element interpreted eval — measured 40×
  * SLOWER than the string path on the same corpus. This expression does
  * the only sensible thing: FNV-1a each token's bytes once, combine n
  * token hashes per window with an odd-multiplier polynomial, and
  * murmur-finalize (fmix64) — all inside the codegen span, zero
  * allocation beyond the output array.
  *
  * Collision behavior: 64-bit window keys; two distinct windows collide
  * with p≈2⁻⁶⁴ — the same regime as hashing the concatenated string with
  * xxhash64 (TrainingSpec asserts pair/jaccard parity vs the
  * string-shingle baseline).
  */
/** @param distinct dedup the window hashes per row (sort + compact —
  *   primitive, still zero boxing). With it, `explode` yields the DOC'S
  *   DISTINCT shingle set directly: the downstream global
  *   `.distinct()` exchange over (doc_id, shingle) becomes redundant,
  *   because cross-row duplicates of the pair cannot exist (doc_id is
  *   the row). Output order is sorted, which no consumer depends on
  *   (set semantics after explode).
  */
case class ShingleHashes(child: Expression, n: Int,
    distinct: Boolean = false) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      // FNV-1a: xor-then-multiply mixes every byte through the full 64
      // bits (a 31-polynomial collides trivially — "Aa"/"BB" — which
      // would MERGE distinct shingles and inflate verified jaccard)
      var h = 0xcbf29ce484222325L
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val nb = s.numBytes()
        var j = 0
        while (j < nb) {
          h = (h ^ (s.getByte(j) & 0xffL)) * 0x100000001b3L; j += 1
        }
      }
      th(i) = h
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var w = 0L
      var k = 0
      while (k < n) { w = w * 0x9E3779B97F4A7C15L + th(i + k); k += 1 }
      w ^= w >>> 33; w *= 0xff51afd7ed558ccdL
      w ^= w >>> 33; w *= 0xc4ceb9fe1a85ec53L
      w ^= w >>> 33
      out(i) = w
      i += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      java.util.Arrays.sort(out)
      var u = 0
      var j = 1
      while (j < m) {
        if (out(j) != out(u)) { u += 1; out(u) = out(j) }
        j += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, u + 1))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val nb = ctx.freshName("nb")
      val h = ctx.freshName("h")
      val w = ctx.freshName("w")
      s"""
         |int $len = $c.numElements();
         |int $m = $len - $n + 1;
         |if ($m < 0) $m = 0;
         |long[] $th = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  long $h = 0xcbf29ce484222325L;
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    int $nb = $s.numBytes();
         |    for (int $j = 0; $j < $nb; $j++) {
         |      $h = ($h ^ ($s.getByte($j) & 0xffL)) * 0x100000001b3L;
         |    }
         |  }
         |  $th[$i] = $h;
         |}
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $w = 0L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $w = $w * 0x9E3779B97F4A7C15L + $th[$i + $k];
         |  }
         |  $w ^= $w >>> 33; $w *= 0xff51afd7ed558ccdL;
         |  $w ^= $w >>> 33; $w *= 0xc4ceb9fe1a85ec53L;
         |  $w ^= $w >>> 33;
         |  $out[$i] = $w;
         |}
         |${if (distinct) {
             val u = ctx.freshName("u")
             val j2 = ctx.freshName("j2")
             s"""if ($m > 1) {
                |  java.util.Arrays.sort($out);
                |  int $u = 0;
                |  for (int $j2 = 1; $j2 < $m; $j2++) {
                |    if ($out[$j2] != $out[$u]) { $u++; $out[$u] = $out[$j2]; }
                |  }
                |  if ($u + 1 < $m) $out = java.util.Arrays.copyOf($out, $u + 1);
                |}""".stripMargin
           } else ""}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graft.bridge
  def apply(tokens: Column, n: Int): Column =
    bridge.column(ShingleHashes(bridge.expression(tokens), n))
  def distinct(tokens: Column, n: Int): Column =
    bridge.column(ShingleHashes(bridge.expression(tokens), n, distinct = true))
}
