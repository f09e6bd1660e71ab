package graft.plans

import java.security.MessageDigest

/** Shared per-thread MD5 digest + hex plumbing for the native nodes
  * (MinHashSig, SimHashAgg) — one definition to keep in sync. */
private[plans] object Digests {
  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  val hex: Array[Char] = "0123456789abcdef".toCharArray

  def md5(): MessageDigest = {
    val d = md5Local.get()
    d.reset()
    d
  }

  def toHex(d: Array[Byte]): String = {
    val sb = new Array[Char](d.length * 2)
    var b = 0
    while (b < d.length) {
      sb(2 * b) = hex((d(b) >> 4) & 0xf)
      sb(2 * b + 1) = hex(d(b) & 0xf)
      b += 1
    }
    new String(sb)
  }

  /** Unsigned lexicographic byte comparison — identical ordering to
    * comparing the lowercase-hex renderings as text. */
  def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}
