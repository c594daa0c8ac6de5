package graft

import graft.functions.CallFlatten
import org.scalatest.funsuite.AnyFunSuite

/** Recursion/suppression semantics of the call flattener (SURVEY P4/P5;
  * golden shapes per FIXTURES.md §2/§4: nested utility.batch with noise
  * children, fee only on root). */
class CallFlattenSpec extends AnyFunSuite {

  private val nested =
    """{"section":"utility","method":"batch","args":{},
      |"calls":[
      | {"section":"balances","method":"transfer","args":{"amount":5}},
      | {"section":"utility","method":"batchAll","args":{},
      |  "calls":[
      |   {"section":"system","method":"remark","args":{}},
      |   {"section":"staking","method":"bond","args":{"value":9}}
      |  ]},
      | {"section":"proxy","method":"proxy","args":{},
      |  "calls":[{"section":"balances","method":"transferKeepAlive","args":{}}]}
      |]}""".stripMargin

  test("deep nesting produces path ids, root/leaf flags, root-only fee") {
    val rows = CallFlatten.flatten(nested, Some(0.5))
    val byId = rows.map(r => r.call_id -> r).toMap
    assert(byId.keySet == Set("0", "0_0", "0_1", "0_1_1", "0_2", "0_2_0"))
    assert(byId("0").root && !byId("0").leaf && byId("0").fee.contains(0.5))
    assert(!byId("0_0").root && byId("0_0").leaf && byId("0_0").fee.isEmpty)
    // suppressed system.remark child dropped but its index slot kept
    assert(!byId.contains("0_1_0"))
    assert(byId("0_1_1").call_method == "bond")
    assert(!byId("0_1").leaf) // batchAll keeps children
    assert(byId("0_2_0").call_section == "balances")
    assert(rows.count(_.fee.isDefined) == 1)
  }

  test("single leaf call") {
    val rows = CallFlatten.flatten(
      """{"section":"balances","method":"transfer","args":{"a":1}}""",
      Some(1.0))
    assert(rows.size == 1)
    val r = rows.head
    assert(r.root && r.leaf && r.call_id == "0" && r.fee.contains(1.0))
    assert(r.call_args == """{"a":1}""")
  }

  test("root is never suppressed even if noise-named") {
    val rows = CallFlatten.flatten(
      """{"section":"timestamp","method":"set","args":{}}""", None)
    assert(rows.size == 1 && rows.head.root)
  }

  test("custom suppression set") {
    val rows = CallFlatten.flatten(nested, None, suppressed = Set("proxy:proxy"))
    // proxy subtree (incl. its child) gone; system.remark kept this time
    assert(rows.map(_.call_id).toSet ==
      Set("0", "0_0", "0_1", "0_1_0", "0_1_1"))
  }
}
