package graft

import graft.decode.AbiDecode
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the ABI function-calldata compiler: for RANDOM
  * argument type trees over the ABI shape language (value leaves,
  * static/dynamic tuples, `T[]`, `T[k]` with static AND dynamic
  * elements, string/bytes tails, empties), a test-side ABI encoder
  * built straight from the spec's head/tail layout produces calldata
  * plus the expected value tree, and `decodeCalldata`'s column program
  * must reproduce it exactly. The hand goldens (EvmSpec) cover shapes
  * we thought of; this covers the composition space — offsets of
  * offsets, dynamic members at arbitrary positions, sign extension.
  */
class AbiPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ---- the random type/value language ----

  /** (abi type JSON fragment, generator of (value, expected, encoder
    * thunk)) — expected is the canonical Seq/primitive tree the decoded
    * Row must equal. */
  private sealed trait T { def json: String; def isDyn: Boolean }
  private case class Leaf(typ: String, isDyn: Boolean) extends T {
    def json: String = s"""{"name":"","type":"$typ"}"""
  }
  private case class Tup(members: List[T]) extends T {
    def isDyn: Boolean = members.exists(_.isDyn)
    def json: String =
      s"""{"name":"","type":"tuple","components":[${members.map(_.json).mkString(",")}]}"""
  }
  private case class Arr(elem: T, fixed: Option[Int]) extends T {
    def isDyn: Boolean = fixed.isEmpty || elem.isDyn
    private def suffix = fixed.map(k => s"[$k]").getOrElse("[]")
    def json: String = elem match {
      case Tup(ms) =>
        s"""{"name":"","type":"tuple$suffix","components":[${ms.map(_.json).mkString(",")}]}"""
      case Leaf(t, _) => s"""{"name":"","type":"$t$suffix"}"""
      case a: Arr =>
        // nested arrays of leaves only (bytes[][]-style): splice the
        // suffix onto the inner rendering
        val inner = a.json
        val tq = "\"type\":\""
        val i = inner.indexOf(tq) + tq.length
        val j = inner.indexOf('"', i)
        inner.substring(0, j) + suffix + inner.substring(j)
    }
  }

  private val genLeaf: Gen[T] = Gen.oneOf(
    Leaf("address", isDyn = false), Leaf("bool", isDyn = false),
    Leaf("uint32", isDyn = false), Leaf("uint256", isDyn = false),
    Leaf("int32", isDyn = false), Leaf("bytes8", isDyn = false),
    Leaf("string", isDyn = true), Leaf("bytes", isDyn = true))

  private def genT(depth: Int): Gen[T] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, genT(depth - 1)).map(Tup(_))),
      1 -> genT(depth - 1).map(Arr(_, None)),
      1 -> Gen.zip(genT(depth - 1), Gen.choose(1, 3))
        .map { case (e, k) => Arr(e, Some(k)) })

  /** Random value for a type: (expected canonical tree, 32-byte-word
    * encoder output as (static hex) or (dynamic hex)). */
  private def genValue(t: T): Gen[(Any, String)] = t match {
    case Leaf("address", _) =>
      Gen.listOfN(20, Gen.choose(0, 255)).map { bs =>
        val hex = bs.map(b => f"$b%02x").mkString
        ("0x" + hex, "0" * 24 + hex)
      }
    case Leaf("bool", _) => Gen.oneOf(true, false).map(b =>
      (b, "0" * 63 + (if (b) "1" else "0")))
    case Leaf("uint32", _) => Gen.choose(0L, 0xffffffffL).map(v =>
      (v, f"$v%064x"))
    case Leaf("uint256", _) =>
      Gen.listOfN(32, Gen.choose(0, 255)).map { bs =>
        val v = BigInt(1, bs.map(_.toByte).toArray)
        (v.toString, f"$v%064x")
      }
    case Leaf("int32", _) =>
      Gen.choose(Int.MinValue.toLong, Int.MaxValue.toLong).map { v =>
        val tc = if (v >= 0) BigInt(v)
          else (BigInt(1) << 256) + BigInt(v)
        (v, f"$tc%064x")
      }
    case Leaf("bytes8", _) =>
      Gen.listOfN(8, Gen.choose(0, 255)).map { bs =>
        val hex = bs.map(b => f"$b%02x").mkString
        ("0x" + hex, hex + "0" * 48)
      }
    case Leaf("string", _) =>
      Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)).map { s =>
        val hex = s.getBytes("UTF-8").map(b => f"$b%02x").mkString
        (s, f"${s.length}%064x" + pad64(hex))
      }
    case Leaf("bytes", _) =>
      Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 255))).map { bs =>
        val hex = bs.map(b => f"$b%02x").mkString
        ("0x" + hex, f"${bs.length}%064x" + pad64(hex))
      }
    case Tup(ms) =>
      Gen.sequence[List[(Any, String)], (Any, String)](ms.map(genValue))
        .map { vs =>
          (vs.map(_._1), encodeTuple(ms.zip(vs.map(_._2))))
        }
    case Arr(e, Some(k)) =>
      Gen.listOfN(k, genValue(e)).map { vs =>
        (vs.map(_._1),
          encodeTuple(List.fill(k)(e).zip(vs.map(_._2))))
      }
    case Arr(e, None) =>
      Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genValue(e))).map {
        vs =>
          (vs.map(_._1),
            f"${vs.length}%064x" +
              encodeTuple(List.fill(vs.length)(e).zip(vs.map(_._2))))
      }
    case Leaf(other, _) => sys.error(s"no generator for $other")
  }

  private def pad64(hex: String): String =
    hex + "0" * ((64 - hex.length % 64) % 64)

  /** The spec's head/tail layout for a tuple of (type, encodedValue):
    * static members inline, dynamic members contribute an offset word
    * (relative to the tuple start) and their encoding goes to the tail
    * region after all heads. */
  private def encodeTuple(items: List[(T, String)]): String = {
    val headLen = items.map { case (t, enc) =>
      if (t.isDyn) 64 else enc.length
    }.sum
    var tail = new StringBuilder
    val heads = new StringBuilder
    for ((t, enc) <- items) {
      if (t.isDyn) {
        val offBytes = (headLen + tail.length) / 2
        heads.append(f"$offBytes%064x")
        tail.append(enc)
      } else heads.append(enc)
    }
    heads.append(tail).toString
  }

  private def canon(v: Any): Any = v match {
    case r: org.apache.spark.sql.Row => r.toSeq.map(canon).toList
    case s: scala.collection.Seq[_] => s.map(canon).toList
    case x => x
  }

  /** Normalize the expected tree to the decoder's runtime types. */
  private def canonExpected(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.map(canonExpected).toList
    case b: BigInt => b.toString
    case x => x
  }

  test("decodeCalldata round-trips random ABI argument trees") {
    import spark.implicits._
    val genArgs = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, genT(2)))
    val params = Gen.Parameters.default.withSize(60)
    var exercisedDyn = false; var exercisedNested = false
    for (caseIdx <- 0 until 40) {
      val s = org.scalacheck.rng.Seed(7L + caseIdx)
      val args = genArgs.apply(params, s).get
      val vals = args.map(t => genValue(t).apply(params, s.next).get)
      val abi =
        s"""{"type":"function","name":"f$caseIdx","inputs":[${args.map(_.json).mkString(",")}]}"""
      val f = AbiDecode.parseFunction(abi)
      val input = AbiDecode.selectorOf(f) +
        encodeTuple(args.zip(vals.map(_._2)))
      val txs = Seq(Tuple1(input)).toDF("input")
      val cols = AbiDecode.decodedCallColumns(f,
        org.apache.spark.sql.functions.col("input"))
        .zipWithIndex.map { case ((_, c), i) => c.as(s"a$i") }
      val row = txs.select(cols: _*).collect().head
      val got = row.toSeq.map(canon).toList
      val expected = vals.map(v => canonExpected(v._1))
      assert(got == expected,
        s"case $caseIdx: types=${args.map(_.json)}\ninput=$input")
      if (args.exists(_.isDyn)) exercisedDyn = true
      if (args.exists { case Tup(_) | Arr(_, _) => true; case _ => false })
        exercisedNested = true
    }
    assert(exercisedDyn && exercisedNested,
      "generator failed to exercise dynamic/nested shapes")
  }
}
