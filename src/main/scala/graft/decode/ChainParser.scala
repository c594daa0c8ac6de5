package graft.decode

import graft.functions.Codec

/** Per-chain parser specialization seam — SURVEY.md §2.2 P13.
  *
  * The reference carries an 11k-LoC zoo of per-chain parser subclasses
  * (ref chains/chainparser.js base, chains/acala.js, chains/moonbeam.js,
  * dispatch at indexer.js:6697 setup_chainParser). We keep the *seam*,
  * not the zoo: a pure trait with the generic implementation plus one
  * specialization to prove the dispatch, selected by chain_id. All
  * methods are pure functions safe to call inside UDFs/flatMap.
  */
trait ChainParser extends Serializable {
  def chainId: Int

  /** Canonical asset key for an event's currency field
    * (ref chainparser.js getAssetKey shapes). */
  def assetKey(currency: String): String =
    Codec.makeAssetChain(currency, chainId)

  /** Classify an event (section, method) into a transfer kind, if any
    * (ref indexer.js:6291 processFeedTransfer event patterns). */
  def transferKind(section: String, method: String): Option[String] =
    (section, method) match {
      case ("balances", "Transfer") => Some("native")
      case ("currencies", "Transferred") => Some("currencies")
      case ("assets", "Transferred") => Some("assets")
      case ("tokens", "Transfer") => Some("tokens")
      case _ => None
    }

  /** Whether a call is per-chain noise (ref substrateetl.js:6446). */
  def suppressCall(section: String, method: String): Boolean =
    graft.functions.CallFlatten.DefaultSuppressed.contains(s"$section:$method")
}

/** Generic substrate parser — the default for every chain. */
case class GenericParser(chainId: Int) extends ChainParser

/** Acala-style specialization: ORML tokens use a JSON currency object as
  * the asset id (ref chains/acala.js token handling). */
case class AcalaParser(chainId: Int) extends ChainParser {
  override def assetKey(currency: String): String = {
    val norm =
      if (currency.startsWith("{")) currency // already a token JSON
      else s"""{"Token":"$currency"}"""
    Codec.makeAssetChain(norm, chainId)
  }
}

/** Moonbeam-style EVM parachain (AccountId20 chains): the ethereum
  * pallet's Executed events are transfers, ERC-20 contract H160s are the
  * asset keys, and substrate↔EVM account mapping goes through
  * pubkeyToH160 / h160ToPubkey (ref chains/moonbeam.js — the 1.1 kLoC
  * EVM-chain parser; paraTool.js:517,522). */
case class MoonbeamParser(chainId: Int) extends ChainParser {
  override def transferKind(section: String, method: String): Option[String] =
    (section, method) match {
      case ("ethereum", "Executed") => Some("evm")
      case _ => super.transferKind(section, method)
    }

  /** ERC-20 asset ids are H160 contract addresses — canonicalized
    * lowercase (ref chains/moonbeam.js asset handling). */
  override def assetKey(currency: String): String = {
    val norm =
      if (currency.startsWith("0x") && currency.length == 42)
        currency.toLowerCase
      else currency
    Codec.makeAssetChain(norm, chainId)
  }

  /** The chain-native address of a substrate pubkey on an AccountId20
    * chain (ref paraTool.js:536 pubkey_to_evm_ss58's first step). */
  def accountH160(pubkeyHex: String): String =
    Codec.bytesToHex(Codec.pubkeyToH160(Codec.hexToBytes(pubkeyHex)))
}

object ChainParser {
  /** Dispatch (ref indexer.js:6697 setup_chainParser). */
  def forChain(chainId: Int): ChainParser = chainId match {
    case 2000 | 22000 => AcalaParser(chainId)    // Acala / Karura
    case 2004 | 22023 => MoonbeamParser(chainId) // Moonbeam / Moonriver
    case id => GenericParser(id)
  }
}
