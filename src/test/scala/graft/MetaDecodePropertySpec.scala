package graft

import graft.decode.{BlockDecode, MetaDecode}
import graft.decode.MetaDecode._
import graft.functions.Codec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the metadata tier: for RANDOM type trees over the
  * full shape language (primitives, compact, accounts, bytes/strings,
  * Vec/Option/tuple/struct/enum, fixed byte arrays), a test-side SCALE
  * encoder produces bytes + the expected JSON, and `decodeValue` must
  * reproduce that JSON exactly with no bytes left over. This is the
  * guarantee that lets a user onboard an arbitrary pallet definition
  * and trust the decode — the fixture specs only cover the shapes we
  * thought to write down. */
class MetaDecodePropertySpec extends AnyFunSuite {

  private def b(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray
  private def leBytes(v: BigInt, n: Int): Array[Byte] = {
    val le = v.toByteArray.dropWhile(_ == 0).reverse
    le ++ Array.fill[Byte](n - le.length)(0)
  }
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private val genName: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaChar))
      .map(_.mkString)

  /** Random type tree; depth bounds the recursion. */
  private def genType(depth: Int): Gen[SType] = {
    val leaves = Gen.oneOf[SType](U8, U16, U32, U64, U128, Bool,
      CompactInt, AccountId, MultiAddress, Bytes, Str,
      FixedBytes(7), FixedBytes(32))
    if (depth <= 0) leaves
    else Gen.frequency(
      4 -> leaves,
      1 -> genType(depth - 1).map(Vec(_)),
      1 -> genType(depth - 1).map(Opt(_)),
      1 -> Gen.choose(1, 3)
        .flatMap(n => Gen.listOfN(n, genType(depth - 1)))
        .map(ts => Tup(ts)),
      1 -> Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, genName.flatMap(nm =>
          genType(depth - 1).map(nm -> _)))).map(fs => Struct(fs)),
      1 -> Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, for {
          nm <- genName
          nf <- Gen.choose(0, 2)
          fs <- Gen.listOfN(nf, genName.flatMap(fn =>
            genType(depth - 1).map(fn -> _)))
        } yield nm -> fs)).map(vs => Enum(vs)))
  }

  /** Random (bytes, expectedJson) for one value of shape `t`. */
  private def genValue(t: SType): Gen[(Array[Byte], String)] = t match {
    case U8 => Gen.choose(0, 255).map(v =>
      (Array(v.toByte), v.toString))
    case U16 => Gen.choose(0, 0xffff).map(v =>
      (Array((v & 0xff).toByte, (v >> 8).toByte), v.toString))
    case U32 => Gen.choose(0L, 0xffffffffL).map(v =>
      (Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte), v.toString))
    case U64 => Gen.choose(Long.MinValue, Long.MaxValue).map { s =>
      val v = BigInt(s) & ((BigInt(1) << 64) - 1)
      (leBytes(v, 8), v.toString)
    }
    case U128 => Gen.listOfN(16, Gen.choose(0, 255)).map { bs =>
      val v = BigInt(1, bs.map(_.toByte).reverse.toArray)
      (leBytes(v, 16), v.toString)
    }
    case Bool => Gen.oneOf(false, true).map(v =>
      (Array((if (v) 1 else 0).toByte), v.toString))
    case CompactInt => Gen.choose(0L, Long.MaxValue).map { v0 =>
      val v = BigInt(v0)
      (Codec.compactEncode(v), v.toString)
    }
    case AccountId => Gen.listOfN(32, Gen.choose(0, 255)).map { bs =>
      val raw = bs.map(_.toByte).toArray
      (raw, s""""${Codec.bytesToHex(raw)}"""")
    }
    case MultiAddress => Gen.listOfN(32, Gen.choose(0, 255)).map { bs =>
      val raw = bs.map(_.toByte).toArray
      (b(Array(0.toByte), raw), s""""${Codec.bytesToHex(raw)}"""")
    }
    case Bytes => Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255))).map { bs =>
      val raw = bs.map(_.toByte).toArray
      (b(Codec.compactEncode(BigInt(raw.length)), raw),
        s""""${Codec.bytesToHex(raw)}"""")
    }
    case FixedBytes(n) => Gen.listOfN(n, Gen.choose(0, 255)).map { bs =>
      val raw = bs.map(_.toByte).toArray
      (raw, s""""${Codec.bytesToHex(raw)}"""")
    }
    case Str => Gen.choose(0, 10).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('"'),
        1 -> Gen.const('\\'), 1 -> Gen.const('\n')))).map { cs =>
      val s = cs.mkString
      val utf8 = s.getBytes("UTF-8")
      (b(Codec.compactEncode(BigInt(utf8.length)), utf8),
        s""""${jsonEscape(s)}"""")
    }
    case Vec(elem) => Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, genValue(elem))).map { vs =>
      (b(Codec.compactEncode(BigInt(vs.length)) +: vs.map(_._1): _*),
        vs.map(_._2).mkString("[", ",", "]"))
    }
    case Opt(elem) => Gen.oneOf(
      Gen.const((Array(0.toByte): Array[Byte], "null")),
      genValue(elem).map { case (bs, j) => (b(Array(1.toByte), bs), j) })
    case Tup(elems) => seqGen(elems.map(genValue).toList).map { vs =>
      (b(vs.map(_._1): _*), vs.map(_._2).mkString("[", ",", "]"))
    }
    case Struct(fields) =>
      seqGen(fields.map(f => genValue(f._2)).toList).map { vs =>
        val json = fields.zip(vs).map { case ((nm, _), (_, j)) =>
          s""""$nm":$j"""
        }.mkString("{", ",", "}")
        (b(vs.map(_._1): _*), json)
      }
    case Enum(variants) => Gen.choose(0, variants.length - 1).flatMap {
      tag =>
        val (vname, vfields) = variants(tag)
        seqGen(vfields.map(f => genValue(f._2)).toList).map { vs =>
          val bytes = b(Array(tag.toByte) +: vs.map(_._1): _*)
          val json =
            if (vfields.isEmpty)
              s"""{"variant":"${jsonEscape(vname)}"}"""
            else {
              val body = vfields.zip(vs).map { case ((fn, _), (_, j)) =>
                s""""$fn":$j"""
              }.mkString(",")
              s"""{"variant":"${jsonEscape(vname)}",$body}"""
            }
          (bytes, json)
        }
    }
    case CallType => throw new IllegalArgumentException(
      "CallType not generated here")
  }

  private def seqGen(gs: List[Gen[(Array[Byte], String)]])
      : Gen[List[(Array[Byte], String)]] =
    gs.foldRight(Gen.const(List.empty[(Array[Byte], String)])) {
      (g, acc) => for { h <- g; t <- acc } yield h :: t
    }

  test("decodeValue inverts the encoder over random type trees") {
    val cases = for {
      t <- genType(3)
      v <- genValue(t)
    } yield (t, v._1, v._2)
    val prop = Prop.forAllNoShrink(cases) { case (t, bytes, expected) =>
      val c = new BlockDecode.Cursor(bytes)
      val got = MetaDecode.decodeValue(c, t,
        _ => throw new IllegalArgumentException("no calls here"),
        scala.collection.mutable.Buffer.empty)
      got == expected && c.remaining == 0
    }
    // fixed seed: 200 deterministic cases — a suite that explores new
    // random space per run can redden a later round on a generator
    // corner, which is a flake, not a finding
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(20260812L)), prop)
    assert(res.passed, res.status.toString)
  }
}
