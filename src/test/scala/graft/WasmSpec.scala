package graft

import graft.decode.WasmDecode
import graft.functions.Codec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ink!/WASM message decode golden cases — the testWASMContractDecode.js
  * shapes: a 4-byte selector followed by a 32-byte AccountId arg, plus
  * the fixed-width/compact integer family and the guarded-null edges.
  */
class WasmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val acct =
    "d0de16fdeebddc2a8db91e4d6af79f1cc9ee4a225c417b6cb56e27226271000c"

  test("decodeArgs: selector-style payloads") {
    // AccountId arg (the set_fee_to_setter / transfer_ownership shape)
    val a = WasmDecode.decodeArgs(Codec.hexToBytes(acct), Seq("accountid"))
    assert(a.contains(Seq("0x" + acct)))
    // u128 LE + bool
    val b = WasmDecode.decodeArgs(
      Codec.hexToBytes("0a000000000000000000000000000000" + "01"),
      Seq("u128", "bool"))
    assert(b.contains(Seq("10", "true")))
    // compact + u32
    val c = WasmDecode.decodeArgs(
      Codec.compactEncode(BigInt(1000)) ++ Codec.hexToBytes("2a000000"),
      Seq("compact", "u32"))
    assert(c.contains(Seq("1000", "42")))
  }

  test("decodeArgs rejects malformed payloads outright") {
    // short AccountId
    assert(WasmDecode.decodeArgs(new Array[Byte](16), Seq("accountid")).isEmpty)
    // trailing garbage after the declared args
    assert(WasmDecode.decodeArgs(new Array[Byte](5), Seq("u32")).isEmpty)
    // bool out of domain
    assert(WasmDecode.decodeArgs(Array(7.toByte), Seq("bool")).isEmpty)
    // unknown type tag
    assert(WasmDecode.decodeArgs(new Array[Byte](4), Seq("h256")).isEmpty)
  }

  test("decodeEvents: ink! Transfer event shape (index + Option args)") {
    val from = "aa" * 32
    val to = "bb" * 32
    // event idx 0 ++ Some(from) ++ Some(to) ++ u128-LE value 434
    val transferData = "0x00" + "01" + from + "01" + to +
      "b201" + "00" * 14
    // idx 1: Approval(None owner — the mint-style edge)
    val approvalData = "0x01" + "00" + "01" + to + "0a" + "00" * 15
    val events = Seq(
      ("0xc0de01", transferData),
      ("0xc0de01", approvalData),
      ("0xc0de01", "0x07" + "ff")  // unknown event index
    ).toDF("code_hash", "data")
    val specs = Seq(
      ("0xc0de01", 0, "Transfer",
        Seq("option_accountid", "option_accountid", "u128")),
      ("0xc0de01", 1, "Approval",
        Seq("option_accountid", "option_accountid", "u128"))
    ).toDF("code_hash", "event_idx", "method", "arg_types")
    val out = WasmDecode.decodeEvents(events, specs)
      .select("event_idx", "method", "args").collect()
      .map(r => (r.getInt(0), r.getString(1),
        Option(r.getSeq[String](2)).map(_.toSeq)))
    assert(out.contains((0, "Transfer",
      Some(Seq("0x" + from, "0x" + to, "434")))))
    assert(out.contains((1, "Approval",
      Some(Seq("null", "0x" + to, "10")))))
    assert(out.contains((7, null, None)))
  }

  test("decodeMessages joins the broadcast registry and keeps unknowns") {
    val calls = Seq(
      ("0xc0de01", "0x80999559" + acct),  // known: set_fee_to_setter
      ("0xc0de02", "0x11f43efd" + acct),  // known: transfer_ownership
      ("0xc0de01", "0xdeadbeef" + acct),  // unknown selector
      ("0xc0de02", "0x11f43efd" + "ff")   // known selector, short args
    ).toDF("code_hash", "data")
    val specs = Seq(
      ("0xc0de01", "0x80999559", "set_fee_to_setter", Seq("accountid")),
      ("0xc0de02", "0x11f43efd", "transfer_ownership", Seq("accountid"))
    ).toDF("code_hash", "selector", "method", "arg_types")
    val out = WasmDecode.decodeMessages(calls, specs)
      .select("code_hash", "selector", "method", "args").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getSeq[String](3)).map(_.toSeq)))
    assert(out.length == 4)
    assert(out.contains(("0xc0de01", "0x80999559", "set_fee_to_setter",
      Some(Seq("0x" + acct)))))
    // good payload decodes; short payload keeps the method but null args
    assert(out.contains(("0xc0de02", "0x11f43efd", "transfer_ownership",
      Some(Seq("0x" + acct)))))
    assert(out.contains(("0xc0de02", "0x11f43efd", "transfer_ownership",
      None)))
    // unknown selector survives with null method/args
    assert(out.contains(("0xc0de01", "0xdeadbeef", null, None)))
  }
}
