package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.wire.{Cbor, MsgPack}

/** MessagePack / CBOR codec properties: encode→extract round-trips for
  * every leaf type across the width boundaries (fixint/8/16/32/64,
  * fixstr/str8/16), path navigation through nested maps, first-key-wins,
  * and the never-crash contract on malformed bytes. */
class WireCodecSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def mpBytes(v: Seq[(String, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    MsgPack.writeValue(out, v)
    out.toByteArray
  }
  private def cbBytes(v: Seq[(String, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Cbor.writeValue(out, v)
    out.toByteArray
  }

  private def s(u: org.apache.spark.unsafe.types.UTF8String): String =
    if (u == null) null else u.toString

  test("roundtrip: ints across all width boundaries, strings, bools, doubles") {
    val gen = for {
      l <- Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue),
        Gen.oneOf(0L, 1L, 127L, 128L, 255L, 256L, 65535L, 65536L,
          -1L, -32L, -33L, -128L, -129L, -32768L, -32769L,
          Int.MaxValue.toLong, Int.MaxValue + 1L, Long.MaxValue, Long.MinValue))
      str <- Gen.alphaNumStr
      b <- Gen.oneOf(true, false)
      d <- Gen.chooseNum(-1e12, 1e12)
    } yield (l, str, b, d)
    forAll(gen) { case (l, str, b, d) =>
      val m = Seq[(String, Any)]("l" -> l, "s" -> str, "b" -> b, "d" -> d)
      for ((bytes, name) <- Seq((mpBytes(m), "msgpack"), (cbBytes(m), "cbor"))) {
        val ex: (Array[Byte], String) => String =
          if (name == "msgpack") (p, q) => s(MsgPack.extract(p, q))
          else (p, q) => s(Cbor.extract(p, q))
        assert(ex(bytes, "l") == l.toString, s"$name long $l")
        assert(ex(bytes, "s") == str, s"$name str")
        assert(ex(bytes, "b") == b.toString, s"$name bool")
        assert(ex(bytes, "d").toDouble == d, s"$name double $d")
        assert(ex(bytes, "nope") == null, s"$name missing key")
      }
    }
  }

  test("nested path navigation; composite leaves and nil are NULL; first key wins") {
    val inner = Seq[(String, Any)]("zone" -> "z1", "rack" -> 4L)
    val m = Seq[(String, Any)](
      "pos" -> null, // nil
      "deep" -> inner,
      "deep2" -> Seq[(String, Any)]("deep" -> inner), // not on the path
      "arrs" -> Array[Any]("a", "b"),
      "deep" -> Seq[(String, Any)]("zone" -> "SHADOWED")) // duplicate key
    for ((bytes, name) <- Seq((mpBytes(m), "msgpack"), (cbBytes(m), "cbor"))) {
      val ex: String => String =
        if (name == "msgpack") q => s(MsgPack.extract(bytes, q))
        else q => s(Cbor.extract(bytes, q))
      assert(ex("deep.zone") == "z1", s"$name first-wins")
      assert(ex("deep.rack") == "4", name)
      assert(ex("pos") == null, s"$name nil leaf")
      assert(ex("arrs") == null, s"$name composite leaf")
      assert(ex("deep") == null, s"$name map leaf")
      assert(ex("deep.zone.too.far") == null, s"$name over-deep path")
      assert(ex("arrs.x") == null, s"$name path into array")
    }
  }

  test("malformed payloads never crash the expression (NULL instead)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val junkGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray)
    forAll(junkGen, n = 300) { junk =>
      val mp = graft.wire.MsgPackExtractExpression(
        Literal.create(junk, org.apache.spark.sql.types.BinaryType), "a.b")
      val cb = graft.wire.CborExtractExpression(
        Literal.create(junk, org.apache.spark.sql.types.BinaryType), "a.b")
      mp.eval(null) // must not throw
      cb.eval(null)
    }
  }

  test("cbor specifics: tags are transparent, float16 decodes, uint64 > Long.MaxValue") {
    // a tag wrapping the top-level map; the path sees through it
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xc6) // tag(6): the tagged item (our map) follows directly
    Cbor.writeValue(out, Seq[(String, Any)]("k" -> 42L))
    assert(s(Cbor.extract(out.toByteArray, "k")) == "42")

    // float16 1.5 == 0x3e00 (RFC 8949 appendix A has 1.5 -> 0xf93e00)
    val manual = Array[Byte](0xa1.toByte, 0x61, 0x66, 0xf9.toByte, 0x3e, 0x00)
    assert(s(Cbor.extract(manual, "f")).toDouble == 1.5)

    // uint64 with the sign bit set renders unsigned
    val big = Array[Byte](0xa1.toByte, 0x61, 0x75, 0x1b.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    assert(s(Cbor.extract(big, "u")) == "18446744073709551615")
  }

  test("msgpack specifics: uint64 unsigned text, bin leaf as utf-8, neg fixint") {
    // map {"u": uint64 0xffffffffffffffff}
    val big = Array[Byte](0x81.toByte, 0xa1.toByte, 0x75, 0xcf.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    assert(s(MsgPack.extract(big, "u")) == "18446744073709551615")
    // {"n": -5} via negative fixint
    val neg = Array[Byte](0x81.toByte, 0xa1.toByte, 0x6e, 0xfb.toByte)
    assert(s(MsgPack.extract(neg, "n")) == "-5")
    // {"b": bin8 "hi"}
    val bin = Array[Byte](0x81.toByte, 0xa1.toByte, 0x62, 0xc4.toByte,
      0x02, 0x68, 0x69)
    assert(s(MsgPack.extract(bin, "b")) == "hi")
  }
}
