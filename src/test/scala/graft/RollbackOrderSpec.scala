package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineReplay
import graft.streaming.{Purchase, SessionState, Sessionizer}

/** Round-14 verdict "what's wrong" #1: q241's reverse migration regrouped
  * each session's lines with NO contractual order, and the in-code claim
  * "line order is irrelevant to the oracle" was overstated —
  * [[Sessionizer.classify]] reads `lines.head` for `time`/`customerId`
  * and folds an IEEE `prices.sum`, both order-sensitive. The gate only
  * stayed deterministic because the replay fixture's per-invoice values
  * are shared. This spec drives the NOW-contractual reassembly
  * ([[PipelineReplay.reassembleLines]]) with an adversarial fixture whose
  * per-invoice hours, customers, and prices genuinely differ, so the
  * order-sensitivity is TESTED, not assumed. */
class RollbackOrderSpec extends AnyFunSuite {

  // one invoice, four lines, every classify-relevant field DISTINCT per
  // line: head-dependent fields (hour 7/9/13/21, customer) and one price
  // at 1e16 — beyond 2^53, where adding 1.0 is below ulp, so the IEEE
  // sum provably depends on whether the small terms combine before or
  // after the big one (1e16 + 1 + 1 + 1 = 1e16 by ties-to-even;
  // 1 + 1 + 1 + 1e16 = 1e16 + 4)
  private val adversarial = List(
    Purchase("INV1", 1, "1/2/2024 7:15", 1.0e16, "C-a", "ES"),
    Purchase("INV1", 2, "1/2/2024 9:30", 1.0, "C-b", "FR"),
    Purchase("INV1", 3, "1/2/2024 13:05", 1.0, "C-c", "DE"),
    Purchase("INV1", 4, "1/2/2024 21:45", 1.0, "C-d", "PT"))

  test("classify IS order-sensitive on data whose per-invoice values " +
    "differ — the premise the contractual sort exists for") {
    val bigFirst = adversarial
    val bigLast = adversarial.tail :+ adversarial.head
    val a = Sessionizer.classify("INV1", SessionState(bigFirst, None))
    val b = Sessionizer.classify("INV1", SessionState(bigLast, None))
    // head-derived fields flip with the order…
    assert(a.time !== b.time)
    assert(a.customerId !== b.customerId)
    // …and the IEEE sum genuinely differs: 1e16 absorbs trailing 1.0s,
    // but 1+1+1 summed first survives (avg differs by exactly 1.0)
    assert(a.avgUnitPrice !== b.avgUnitPrice)
  }

  test("reassembleLines is order-INDEPENDENT: any read order of the " +
    "flattened state rows rebuilds the same session, so rollback is " +
    "deterministic on ANY data") {
    val canonical = PipelineReplay.reassembleLines(adversarial.iterator)
    // every permutation of a 4-line session — the regrouping shuffle is
    // free to hand the iterator over in any of them
    adversarial.permutations.foreach { perm =>
      assert(PipelineReplay.reassembleLines(perm.iterator) === canonical)
    }
    // and the downstream classify result is therefore one fixed row
    val want = Sessionizer.classify("INV1", SessionState(canonical, None))
    adversarial.permutations.foreach { perm =>
      val got = Sessionizer.classify("INV1",
        SessionState(PipelineReplay.reassembleLines(perm.iterator), None))
      assert(got === want)
    }
  }

  test("reassembleLines survives null customer/country (poison-adjacent " +
    "lines must reach classify, which flags them — not NPE in the sort)") {
    val withNulls = List(
      Purchase("INV2", 1, "1/2/2024 7:15", 2.0, null, "ES"),
      Purchase("INV2", 2, "1/2/2024 9:30", 1.0, "C-x", null))
    val rebuilt = PipelineReplay.reassembleLines(withNulls.reverse.iterator)
    assert(rebuilt === PipelineReplay.reassembleLines(withNulls.iterator))
    val res = Sessionizer.classify("INV2", SessionState(rebuilt, None))
    assert(res.status === "error")
  }
}
