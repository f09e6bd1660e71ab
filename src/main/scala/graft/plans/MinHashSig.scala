package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for a shingle array, computes all K
  * signature slots in one pass — slot i is the lexicographic minimum of
  * md5("i:" || shingle) over the shingles (a salted hash ≙ one random
  * permutation per slot). Output is array<string> of K lowercase-hex
  * minima, byte-identical to the SQL formulation
  * `array_min(transform(sh, s -> md5(concat('i:', s))))` repeated K
  * times (lowercase-hex md5 compares identically as bytes and as text).
  *
  * Why native: the SQL shape walks the shingle array K times through
  * interpreted lambdas, allocating a K-th hash array per pass; this
  * node hashes each (slot, shingle) pair once in a tight loop with a
  * reused digest and keeps only the running minima — the signature step
  * dominates the MinHash+LSH pipeline's scan cost.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // An empty shingle array yields null (no minimum exists), so the
  // expression is nullable regardless of the child's nullability, and
  // generated code must propagate the null flag itself — nullSafeCodeGen
  // alone only handles null INPUTS.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("minHashSig", MinHashSig,
      "graft.plans.MinHashSig$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $obj.compute($c, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval and generated code. Returns null for an
    * empty shingle array (no minimum exists — mirrors array_min on an
    * empty array being null-ish; callers filter empties first). */
  def compute(shingles: ArrayData, k: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val digest = md5.get()
    val mins = new Array[String](k)
    var i = 0
    while (i < k) {
      val salt = (i.toString + ":").getBytes("UTF-8")
      var best: String = null
      var j = 0
      while (j < n) {
        digest.reset()
        digest.update(salt)
        digest.update(shingles.getUTF8String(j).getBytes)
        val d = digest.digest()
        val sb = new Array[Char](32)
        var b = 0
        while (b < 16) {
          sb(2 * b) = hex((d(b) >> 4) & 0xf)
          sb(2 * b + 1) = hex(d(b) & 0xf)
          b += 1
        }
        val h = new String(sb)
        if (best == null || h.compareTo(best) < 0) best = h
        j += 1
      }
      mins(i) = best
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  /** Column-API entry point. */
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(MinHashSig(
      org.apache.spark.sql.graft.bridge.expression(c), k))
}
