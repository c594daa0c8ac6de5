package graft.model

import java.sql.Timestamp

/** Nested raw-block model — the decoded sidecar payload shape the
  * reference stores per block and flattens during export
  * (ref README.md:203-222 block JSON; consumer substrateetl.js:6293-6473;
  * FIXTURES.md §1-§4 for the flattened twins). */
case class RawEvent(
    event_idx: Int,
    section: String,
    method: String,
    data: String)

case class RawTransfer(
    from_pub: String,
    to_pub: String,
    asset: String,
    raw_amount_hex: String,
    decimals: Int)

case class RawExtrinsic(
    idx: Int,
    hash: String,
    section: String,
    method: String,
    params: String, // nested call-tree JSON (CallFlatten input)
    signed: Boolean,
    signer_pub: String,
    fee: Double,
    events: Seq[RawEvent],
    transfers: Seq[RawTransfer])

case class RawLog(log_type: String, value: String)

case class RawBlock(
    chain_id: Int,
    number: Long,
    hash: String,
    parent_hash: String,
    block_time: Timestamp,
    spec_version: Int,
    author_pub: String,
    finalized: Boolean,
    extrinsics: Seq[RawExtrinsic],
    logs: Seq[RawLog])

/** One raw storage-diff trace cell — the reference's BigTable `trace`
  * column family stores the per-block k/v storage diff next to the
  * block (ref README.md:171-183; consumed by parse_trace,
  * substrateetl.js:6605-6773). Kept FLAT (one row per k/v, not nested
  * in the block): trace volume is independent of block structure and
  * the decode path (prefix dim join + key slice + value decode) is
  * row-wise, so the flat grain is the natural 100 TB layout —
  * partition-prunable on (chain_id, number) without exploding
  * anything. */
case class RawTrace(
    chain_id: Int,
    number: Long,
    block_hash: String,
    block_time: Timestamp,
    trace_idx: Int,
    k: String,
    v: String,
    finalized: Boolean)
