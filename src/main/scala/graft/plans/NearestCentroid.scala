package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native k-means assignment kernel: argmin of exact squared L2 between
  * one quantized vector (`array<bigint>`) and a centroid table
  * (`array<struct<cid: int, cv: array<bigint>>>`), lowest-cid tiebreak —
  * i.e. exactly `array_min(transform(cents, c -> struct(dist, c.cid)))`
  * with the integer-fold distance, as ONE codegen'd nested loop.
  *
  * Why native: the HOF form evaluates interpreted (the ~50x penalty
  * [[MatVec]] documents), and k-means pays it k times per row per Lloyd
  * round on EVERY corpus scan. When the centroid side is FOLDABLE (the
  * assignUnder path embeds the k-row table as a literal — k rows is
  * dimension-sized driver state, the ivfSqParams doctrine), the struct
  * array is decoded ONCE into primitive `long[][]` at codegen time and
  * shipped as a reference object, so the per-row work is a pure
  * primitive-array scan: without this, every row re-walked k
  * UnsafeRow/UnsafeArrayData views (measured 81 s for the adaptive-k
  * 800-centroid assign over 200k vectors at the 100x probe — decode
  * dominated, not arithmetic). A STRICT early exit (abandon a centroid
  * only once its partial sum EXCEEDS the best — `>` not `>=`, so an
  * exact tie still reaches the cid comparison) prunes most of the k·dim
  * work per row without touching the argmin result.
  *
  * Bit-exact vs the DuckDB oracle's unrolled SQL: pure integer
  * arithmetic, associative and order-free; micro-unit inputs keep
  * (x-y)^2 sums far below 2^63. Length mismatches truncate to the
  * common prefix (the DotProduct convention); an empty centroid list is
  * a caller bug and fails loudly.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid"

  private def checkTypes(): Unit = {
    left.dataType match {
      case ArrayType(LongType, _) => ()
      case other => throw new IllegalArgumentException(
        s"graft_nearest_centroid expects array<bigint> vector, got $other")
    }
    right.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, IntegerType, _, _),
        StructField(_, ArrayType(LongType, _), _, _))), _) => ()
      case other => throw new IllegalArgumentException(
        "graft_nearest_centroid expects array<struct<int, array<bigint>>> " +
          s"centroids, got $other")
    }
  }

  /** Decoded-once centroids when the right side folds (the literal
    * path); None keeps the per-row decode for a non-constant table. */
  @transient private lazy val folded: Option[(Array[Int], Array[Array[Long]])] = {
    checkTypes()
    if (right.foldable) {
      val v = right.eval(null)
      require(v != null, "graft_nearest_centroid: null centroid literal")
      Some(NearestCentroid.decode(v.asInstanceOf[ArrayData]))
    } else None
  }

  private def decode(cents: ArrayData) = NearestCentroid.decode(cents)

  override def nullSafeEval(a: Any, b: Any): Any = {
    checkTypes()
    val qv = a.asInstanceOf[ArrayData]
    val (cids, cvs) = folded.getOrElse(decode(b.asInstanceOf[ArrayData]))
    NearestCentroid.best(qv, cids, cvs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    checkTypes()
    // The generated code is ONE static call into the compiled kernel —
    // an inline multi-statement block here gets split across helper
    // methods by GeneratePredicate/GenerateUnsafeProjection when the
    // surrounding projection is large (local variables then dangle and
    // Janino fails, silently dropping the whole stage to interpreted
    // eval — the exact regression this node exists to prevent). The
    // kernel method is small, monomorphic and JIT-hot, so the call
    // costs nothing against the k·dim loop behind it.
    val mod = "graft.plans.NearestCentroid$.MODULE$"
    val preDecoded = folded.map { case (cids, cvs) =>
      (ctx.addReferenceObj("ncCids", cids, "int[]"),
        ctx.addReferenceObj("ncCvs", cvs, "long[][]"))
    }
    nullSafeCodeGen(ctx, ev, (a, b) => preDecoded match {
      case Some((cidsRef, cvsRef)) =>
        s"${ev.value} = $mod.best($a, $cidsRef, $cvsRef);"
      case None =>
        s"${ev.value} = $mod.bestDecoding($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** Column-API entry point: struct(d: bigint, cid: int). */
  def apply(qv: Column, cents: Column): Column =
    org.apache.spark.sql.graft.bridge.column(NearestCentroid(
      org.apache.spark.sql.graft.bridge.expression(qv),
      org.apache.spark.sql.graft.bridge.expression(cents)))

  private[plans] def decode(
      cents: ArrayData): (Array[Int], Array[Array[Long]]) = {
    val k = cents.numElements()
    require(k > 0, "graft_nearest_centroid: empty centroid list")
    val cids = new Array[Int](k)
    val cvs = new Array[Array[Long]](k)
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      cids(c) = row.getInt(0)
      cvs(c) = row.getArray(1).toLongArray()
      c += 1
    }
    (cids, cvs)
  }

  /** The argmin kernel (also the codegen target — generated code makes
    * ONE call here). Strict early exit: a centroid is abandoned only
    * once its partial sum EXCEEDS the current best (`>` not `>=`), so
    * an exact distance tie still reaches the lowest-cid comparison. */
  def best(qv: ArrayData, cids: Array[Int],
      cvs: Array[Array[Long]]): GenericInternalRow = {
    val q = qv.toLongArray()
    var bestD = Long.MaxValue
    var bestCid = Int.MaxValue
    var c = 0
    while (c < cids.length) {
      val cv = cvs(c)
      val n = math.min(q.length, cv.length)
      var d = 0L
      var i = 0
      while (i < n && d <= bestD) {
        val diff = q(i) - cv(i)
        d += diff * diff
        i += 1
      }
      if (i == n && (d < bestD || (d == bestD && cids(c) < bestCid))) {
        bestD = d; bestCid = cids(c)
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestCid))
  }

  /** Per-row decode + argmin — the codegen target for a NON-constant
    * centroid table (the grouped/PQ paths, whose lists are 16 entries). */
  def bestDecoding(qv: ArrayData, cents: ArrayData): GenericInternalRow = {
    val (cids, cvs) = decode(cents)
    best(qv, cids, cvs)
  }
}
