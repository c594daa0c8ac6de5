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

  /** Whether an asset symbol denotes an AMM liquidity-pair token
    * (ref chains/parallel.js:1187 isParallelLiquidityPair; generic
    * chains have no LP convention). */
  def isLiquidityPair(symbol: String): Boolean = false

  /** Whether an event feeds the reward extraction (ref
    * chainparser.js:3898 rewardFilter — Rewarded AND Slashed;
    * astar.js:880 widens it). Must stay in lockstep with
    * [[graft.etl.Rewards.isRewardEvent]], the Column twin (slashes
    * negate downstream and the positive-amount skip drops them, like
    * the reference's end-to-end path). */
  def isRewardEvent(section: String, method: String): Boolean =
    section == "staking" && (method == "Rewarded" || method == "Slashed")
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

/** Parallel-style money-market parachain (ref chains/parallel.js — the
  * 1.2 kLoC loans/AMM/liquid-staking parser). Distinctives kept:
  * numeric currency ids (possibly digit-grouped, parallel.js:14
  * tokenID_to_string) canonicalize to `{"Token":"<id>"}` asset keys
  * (parallel.js:1195 getAssetByCurrencyID); `LP-` symbols mark AMM
  * liquidity-pair assets (parallel.js:1187); loans positions normalize
  * by 1e18 fixed-point indices (parallel.js:340-346 borrowIndex,
  * :120-121 exchangeRate). */
case class ParallelParser(chainId: Int) extends ChainParser {
  override def assetKey(currency: String): String = {
    val cleaned = currency.replace(",", "")
    val norm =
      if (cleaned.nonEmpty && cleaned.forall(_.isDigit))
        s"""{"Token":"$cleaned"}"""
      else currency
    Codec.makeAssetChain(norm, chainId)
  }

  override def isLiquidityPair(symbol: String): Boolean =
    symbol.contains("LP-")

  /** True borrowed balance of a loans position: the stored principal
    * adjusted by the 1e18 fixed-point borrow index; zero once repaid
    * (ref parallel.js:340-346 getLoanBorrowedVal). */
  def adjustedPrincipal(principal: BigInt, borrowIndex: BigInt): Double =
    if (principal <= 0 || borrowIndex <= 0) 0.0
    else principal.toDouble / (borrowIndex.toDouble / 1e18)

  /** Underlying amount of a voucher (cToken-style) balance at the 1e18
    * exchange rate (ref parallel.js:120-121 loan deposit valuation). */
  def voucherToUnderlying(voucher: BigInt, exchangeRate: BigInt): Double =
    voucher.toDouble * (exchangeRate.toDouble / 1e18)
}

/** Interlay-style ORML-tokens parachain (ref chains/interlay.js):
  * token symbols normalize to the ORML `{"Token":…}` JSON like Acala,
  * and a 2-element JSON-array asset denotes a DexShare liquidity pair
  * (interlay.js processTokensTotalIssuance's Array.isArray branch). */
case class InterlayParser(chainId: Int) extends ChainParser {
  override def assetKey(currency: String): String = {
    val norm =
      if (currency.startsWith("{") || currency.startsWith("["))
        currency // token JSON or DexShare pair array
      else s"""{"Token":"$currency"}"""
    Codec.makeAssetChain(norm, chainId)
  }

  override def isLiquidityPair(symbol: String): Boolean =
    symbol.trim.startsWith("[") // DexShare pair = 2-element array asset
}

/** Astar-style EVM+WASM hybrid (ref chains/astar.js): dappsStaking
  * Reward events join the reward feed (astar.js:880 rewardFilter), and
  * each reward names a smart contract as an Evm(H160)/Wasm(AccountId)
  * enum (astar.js:889 prepareFeedReward) — the extraction projects the
  * variant into (kind, key) columns from the metadata-tier JSON
  * (StandardPallets.dappsStaking). */
case class AstarParser(chainId: Int) extends ChainParser {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  override def isRewardEvent(section: String, method: String): Boolean =
    (section == "dappsStaking" && method == "Reward") ||
      super.isRewardEvent(section, method)

  /** dApp-staking reward rows from the decoded events table:
    * (account, contract kind evm|wasm, contract key, era, amount). */
  def dappRewards(events: DataFrame): DataFrame =
    events
      .filter(col("section") === "dappsStaking" &&
        col("method") === "Reward")
      .select(
        col("event_id"),
        get_json_object(col("data"), "$.account").as("account_pub"),
        lower(get_json_object(col("data"), "$.contract.variant"))
          .as("contract_kind"),
        coalesce(
          get_json_object(col("data"), "$.contract.address"),
          get_json_object(col("data"), "$.contract.account"))
          .as("contract_key"),
        get_json_object(col("data"), "$.era").cast("long").as("era"),
        get_json_object(col("data"), "$.amount").cast("decimal(38,0)")
          .as("amount"))
}

/** Bifrost-style liquid-staking parachain (ref chains/bifrost.js, whose
  * behavior lives in the base chainparser.js bifrost branches:89-109 —
  * native/stable/vsToken currency normalization; substrateetl.js:
  * 1070-1080 VSBond digit-group cleanup; chainparser.js:5346-5351 the
  * VS symbol prefix; xcmgarlib3.js:539 VToken voucher symbols). The
  * ORML currency enum's liquid-staking variants normalize into the
  * canonical registry key space:
  *  - `{"native":X}` / `{"stable":X}` → `{"Token":X}`;
  *  - `{"vsToken":X}` (voucher slot) → `{"Token":"VSX"}`;
  *  - `{"vToken":X}` (voucher) → `{"VToken":X}`, symbol `vX`;
  *  - VSBond values drop digit-grouping commas
  *    (`"02,000,6,13"` → `"02000613"`). */
case class BifrostParser(chainId: Int) extends ChainParser {

  /** Single-key ORML currency object, e.g. `{"vsToken":"KSM"}`. */
  private val KeyVal =
    """\{\s*"([A-Za-z0-9]+)"\s*:\s*(.+?)\s*\}""".r

  private def unq(v: String): String = v.stripPrefix("\"").stripSuffix("\"")
  private def q(v: String): String = s""""$v""""

  override def assetKey(currency: String): String = {
    val trimmed = currency.trim
    val norm = trimmed match {
      case KeyVal(k, v) => k.toLowerCase match {
        case "native" | "stable" | "token" => s"""{"Token":${q(unq(v))}}"""
        case "vstoken" => s"""{"Token":"VS${unq(v)}"}"""
        case "vtoken" => s"""{"VToken":${q(unq(v))}}"""
        case "vtoken2" => s"""{"VToken2":${q(unq(v))}}"""
        case "token2" => s"""{"Token2":${q(unq(v))}}"""
        case kb if kb.startsWith("vsbond") =>
          // strip digit-grouping commas only (between digits), keeping
          // JSON array separators intact: ["2,000","6"] → ["2000","6"]
          s"""{"VSBond2":${v.replaceAll("(?<=\\d),(?=\\d)", "")}}"""
        case _ => trimmed // unknown currency shape: pass through
      }
      case j if j.startsWith("{") || j.startsWith("[") => trimmed
      case sym => s"""{"Token":"$sym"}"""
    }
    Codec.makeAssetChain(norm, chainId)
  }

  /** Registry symbol for a voucher token (xcmgarlib3.js:539 vBNC/vKSM). */
  def voucherSymbol(sym: String): String = s"v$sym"

  /** Registry symbol/name for a voucher-SLOT token — the "erroneous/
    * ambiguous symbol representation" fixup (chainparser.js:5346-5351):
    * symbol gains `VS`, name gains the Bifrost Voucher Slot prefix. */
  def voucherSlot(sym: String, name: String): (String, String) =
    (s"VS$sym", s"Bifrost Voucher Slot $name")
}

object ChainParser {
  /** Dispatch (ref indexer.js:6697 setup_chainParser). */
  def forChain(chainId: Int): ChainParser = chainId match {
    case 2000 | 22000 => AcalaParser(chainId)    // Acala / Karura
    case 2004 | 22023 => MoonbeamParser(chainId) // Moonbeam / Moonriver
    case 2006 | 22007 => AstarParser(chainId)    // Astar / Shiden
    case 2012 | 22085 => ParallelParser(chainId) // Parallel / Heiko
    case 2030 | 22001 => BifrostParser(chainId)  // Bifrost DOT / KSM
    case 2032 | 22092 => InterlayParser(chainId) // Interlay / Kintsugi
    case id => GenericParser(id)
  }
}
