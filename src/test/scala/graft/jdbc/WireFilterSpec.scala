package graft.jdbc

import java.io.ObjectInputFilter

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[Protocol.wireFilter]]'s two defense layers: the
  * class allowlist (JdbcProxySpec proves it over a live socket, both
  * directions) and the resource ceilings added in round 15 — without
  * which a peer could exhaust memory with an ALLOWED shape, e.g. a
  * `long[Integer.MAX_VALUE]` header (16 GiB allocation from 17 bytes)
  * or an arbitrarily deep `Object[]` nest. The over-limit cases are
  * unit-tested here because provoking them over the wire would require
  * allocating the attack payload in the test JVM; the depth case is
  * additionally covered end-to-end in JdbcProxySpec with a 70-deep
  * nest.
  */
class WireFilterSpec extends AnyFunSuite {

  // NB: field names must not collide with the interface's methods —
  // `override def depth(): Long = depth` self-recurses (and Scala turns
  // the tail call into an infinite loop)
  private def info(cl: Class[_], arrayLen: Long = -1, nestDepth: Long = 1) =
    new ObjectInputFilter.FilterInfo {
      override def serialClass(): Class[_] = cl
      override def arrayLength(): Long = arrayLen
      override def depth(): Long = nestDepth
      override def references(): Long = 1L
      override def streamBytes(): Long = 128L
    }

  private val A = ObjectInputFilter.Status.ALLOWED
  private val R = ObjectInputFilter.Status.REJECTED
  private val U = ObjectInputFilter.Status.UNDECIDED

  test("protocol classes and boxed values pass; arbitrary classes do not") {
    assert(Protocol.wireFilter.checkInput(info(classOf[Protocol.Rows])) == A)
    assert(Protocol.wireFilter.checkInput(info(classOf[java.lang.Long])) == A)
    assert(Protocol.wireFilter.checkInput(info(classOf[java.math.BigDecimal])) == A)
    assert(Protocol.wireFilter.checkInput(info(classOf[java.util.ArrayList[_]])) == R)
    assert(Protocol.wireFilter.checkInput(info(classOf[ProcessBuilder])) == R)
  }

  test("primitive/allowlisted arrays pass at sane sizes, reject over the ceiling") {
    val longArr = classOf[Array[Long]]
    assert(Protocol.wireFilter.checkInput(info(longArr, arrayLen = 1024)) == A)
    assert(Protocol.wireFilter.checkInput(info(longArr, arrayLen = 1L << 26)) == A)
    assert(Protocol.wireFilter.checkInput(info(longArr, arrayLen = (1L << 26) + 1)) == R)
    assert(Protocol.wireFilter.checkInput(
      info(longArr, arrayLen = Integer.MAX_VALUE.toLong)) == R)
    // the limit guards REJECTED classes too (reject wins regardless)
    assert(Protocol.wireFilter.checkInput(
      info(classOf[Array[java.util.ArrayList[_]]], arrayLen = 10)) == R)
  }

  test("graph depth rejects past the ceiling even for allowed classes") {
    val objArr = classOf[Array[AnyRef]]
    assert(Protocol.wireFilter.checkInput(info(objArr, arrayLen = 1, nestDepth = 64)) == A)
    assert(Protocol.wireFilter.checkInput(info(objArr, arrayLen = 1, nestDepth = 65)) == R)
  }

  test("null serialClass stays UNDECIDED (primitives/back-refs) unless over-limit") {
    assert(Protocol.wireFilter.checkInput(info(null)) == U)
    assert(Protocol.wireFilter.checkInput(info(null, nestDepth = 65)) == R)
  }
}
