package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking boundary finder: one pass over a
  * string column returning the 1-based positions of every 8-char gram
  * whose Rabin–Karp hash is divisible by `divisor` — the LBFS/FastCDC
  * boundary rule (a boundary is a property of the CONTENT, so an
  * insertion early in a document shifts chunk bytes but re-synchronizes
  * at the next content boundary, which is what makes chunk-level dedup
  * robust where fixed-stride chunking (q61) is not).
  *
  * Hash semantics are [[RollingHash]]'s verbatim (same base/mod, same
  * left-fold seeding, same code-point stepping), so the positions are
  * bit-equal to the portable SQL formulation over q49's per-position
  * gram-hash list — CdcBoundariesSpec pins the parity property-style.
  * With hashes ~uniform on [0, 1e9+7), a divisor D yields expected
  * chunk length ~D characters; production CDC additionally clamps
  * min/max chunk sizes, a consumer-side policy deliberately left out of
  * the boundary primitive (documented at q244).
  *
  * Why an Expression: the SQL form is q49's interpreted per-position
  * `aggregate` lambda over a `slice` (~5 ms/doc measured, O(n) allocs);
  * this is the same arithmetic in one primitive loop inside
  * WholeStageCodegen — the [[RollingHash]]/[[DotProduct]] playbook.
  * 18th native node.
  */
case class CdcBoundaries(child: Expression, divisor: Int)
  extends UnaryExpression {

  require(divisor > 0, "divisor must be positive")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("cdcBoundaries", CdcBoundaries,
      "graft.plans.CdcBoundaries$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $obj.compute($c, $divisor);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CdcBoundaries = copy(child = newChild)
}

object CdcBoundaries {
  import RollingHash.{Base, Gram, Mod}

  /** Shared by interpreted eval and generated code. The gram hash is
    * maintained by a TRUE rolling update (drop codes(p)·B^7, shift,
    * add the entering code — all mod M, so each residue is exactly the
    * per-position left fold's; CdcBoundariesSpec pins the parity):
    * O(n) multiplies instead of the recompute loop's O(8n), and the
    * boundary buffer is a growable primitive array — no boxing on the
    * scan stage's hot path. */
  def compute(s: UTF8String, divisor: Int): GenericArrayData = {
    // public entry (codegen calls it with the constructor-checked value,
    // but plain Scala can reach it directly) — fail loud, never mask
    require(divisor > 0, "divisor must be positive")
    val str = s.toString
    // code points, stepping over surrogate pairs (the RollingHash walk)
    var cn = 0
    var i = 0
    while (i < str.length) { i += Character.charCount(str.codePointAt(i)); cn += 1 }
    if (cn < Gram) return new GenericArrayData(Array.emptyIntArray)
    val codes = new Array[Long](cn)
    i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      codes(j) = cp.toLong
      i += Character.charCount(cp)
      j += 1
    }
    // B^(Gram-1) mod M: the drop term's multiplier
    var bPow = 1L
    var k = 1
    while (k < Gram) { bPow = (bPow * Base) % Mod; k += 1 }
    // seed: the first gram's left fold (code points < M, so the seed
    // code needs no reduction — the RollingHash seeding convention)
    var g = codes(0)
    k = 1
    while (k < Gram) { g = (g * Base + codes(k)) % Mod; k += 1 }
    var out = new Array[Int](math.max(4, cn / divisor + 2))
    var m = 0
    var p = 0
    var more = true
    while (more) {
      if (g % divisor == 0L) {
        if (m == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(m) = p + 1 // 1-based gram position
        m += 1
      }
      if (p < cn - Gram) {
        g = (((g - (codes(p) * bPow) % Mod + Mod) % Mod) * Base
          + codes(p + Gram)) % Mod
        p += 1
      } else more = false
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Column-API entry point. */
  def apply(c: Column, divisor: Int): Column =
    org.apache.spark.sql.graft.bridge.column(CdcBoundaries(
      org.apache.spark.sql.graft.bridge.expression(c), divisor))
}
