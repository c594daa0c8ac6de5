package graft.decode

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.{Codec, Keccak}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** ABI-JSON-driven EVM event decode — the generic tier above
  * [[EvmDecode]]'s hand ERC selector tables (ref tools/udfs.sql:19-64
  * parse_UniswapV3Pool_event_Swap, which instantiates an ethers.js
  * Interface from an ABI fragment per row-batch; ethTool.js:1624
  * parseAbiSignature). Given one event's ABI JSON, ANY matching log
  * decodes into typed columns.
  *
  * Spark-first shape: the ABI is known at PLAN time, so the decoder
  * emits per-parameter `Column`s — static params are constant-offset
  * `substring`/`conv` expressions (whole-stage codegen'd, no UDF);
  * only u/int wider than 64 bits (decimal string render) and the
  * 256-bit two's complement touch a scalar UDF. Dynamic values of ANY
  * composition (string/bytes, T[], T[k], tuples, arbitrarily nested —
  * `bytes[][]`, `(uint32,uint32)[]`, tuples with string members)
  * decode through [[valueAt]]'s recursive Column-offset arithmetic
  * over `substr`/`conv`, still inside codegen. The reference pays a
  * JS engine + ABI parse per batch instead.
  *
  * Conventions mirror the reference UDF: addresses lowercase; an
  * INDEXED dynamic param is represented by its topic hash (udfs.sql:48
  * `isIndexed → value.hash`); ints render as decimal strings when they
  * can exceed a long.
  */
object AbiDecode {

  final case class AbiParam(name: String, typ: String, indexed: Boolean,
      components: Seq[AbiParam])
  final case class AbiEvent(name: String, inputs: Seq[AbiParam],
      anonymous: Boolean)

  private val mapper = new ObjectMapper

  /** Parse one event ABI fragment, e.g.
    * `{"name":"Swap","type":"event","inputs":[{"indexed":true,
    * "name":"sender","type":"address"}, ...]}`. */
  def parseEvent(json: String): AbiEvent = {
    val n = mapper.readTree(json)
    require(n.path("type").asText("event") == "event",
      s"not an event ABI: ${n.path("type").asText}")
    AbiEvent(n.path("name").asText,
      param(n.path("inputs")), n.path("anonymous").asBoolean(false))
  }

  private def param(inputs: JsonNode): Seq[AbiParam] = {
    import scala.jdk.CollectionConverters._
    inputs.elements.asScala.map { p =>
      AbiParam(p.path("name").asText, p.path("type").asText,
        p.path("indexed").asBoolean(false),
        if (p.has("components")) param(p.path("components")) else Seq.empty)
    }.toSeq
  }

  /** Canonical signature → keccak topic0 (tuples expand to component
    * lists, per the ABI spec). */
  def signature(e: AbiEvent): String =
    s"${e.name}(${e.inputs.map(canonType).mkString(",")})"

  private def canonType(p: AbiParam): String =
    if (p.typ.startsWith("tuple"))
      s"(${p.components.map(canonType).mkString(",")})" +
        p.typ.stripPrefix("tuple")
    else canonAlias(p.typ)

  /** Solidity aliases canonicalize before hashing (`uint` → `uint256`,
    * `int` → `int256`, incl. array suffixes) — ethers.js does the same;
    * skipping it yields a wrong topic0 that silently matches nothing. */
  private def canonAlias(t: String): String = {
    val (base, suffix) = t.indexOf('[') match {
      case -1 => (t, "")
      case i => (t.substring(0, i), t.substring(i))
    }
    val canon = base match {
      case "uint" => "uint256"
      case "int" => "int256"
      case b => b
    }
    canon + suffix
  }

  def topic0(e: AbiEvent): String = Keccak.topic(signature(e))

  // ---- word decoders (a "word" is 64 hex chars; `data` is 0x-hex) ----

  private def intBits(typ: String, prefix: String): Option[Int] =
    if (!typ.startsWith(prefix)) None
    else typ.stripPrefix(prefix) match {
      case "" => Some(256)
      case d if d.forall(_.isDigit) => Some(d.toInt)
      case _ => None
    }

  /** Unsigned > 64-bit: decimal string via BigInt (Decimal(38) cannot
    * hold a full u256 — sqrtPriceX96-class values overflow it). */
  private val uintBig = udf(
    new org.apache.spark.sql.api.java.UDF1[String, String] {
      override def call(w: String): String =
        if (w == null) null
        else BigInt(1, Codec.hexToBytes(w)).toString
    }, DataTypes.StringType)

  /** Signed: ABI sign-extends intN to 256 bits, so two's complement at
    * 256 bits is correct for every declared width. */
  private val intBig = udf(
    new org.apache.spark.sql.api.java.UDF1[String, String] {
      override def call(w: String): String =
        if (w == null) null
        else {
          val v = BigInt(1, Codec.hexToBytes(w))
          (if (v.testBit(255)) v - (BigInt(1) << 256) else v).toString
        }
    }, DataTypes.StringType)

  /** Decode one 32-byte word column to its ABI type. */
  private def wordValue(word: Column, typ: String,
      components: Seq[AbiParam]): Column = typ match {
    case "address" => concat(lit("0x"), lower(substring(word, 25, 40)))
    case "bool" => conv(substring(word, 63, 2), 16, 10) === "1"
    case t if t.startsWith("bytes") && t.length > 5 =>
      val n = t.stripPrefix("bytes").toInt
      concat(lit("0x"), lower(substring(word, 1, 2 * n)))
    case t => (intBits(t, "uint"), intBits(t, "int")) match {
      case (Some(b), _) if b <= 63 => conv(word, 16, 10).cast("long")
      case (Some(_), _) => uintBig(word)
      case (_, Some(b)) if b < 64 =>
        // small signed: sign-extended word's low bits via two's
        // complement at the declared width, still codegen arithmetic
        val raw = conv(substring(word, 49, 16), 16, 10).cast("decimal(20,0)")
        val width = BigInt(1) << 64
        when(conv(substring(word, 1, 1), 16, 10).cast("int") >= 8,
          (raw - lit(width.toString).cast("decimal(21,0)")).cast("long"))
          .otherwise(raw.cast("long"))
      case (_, Some(_)) => intBig(word)
      case _ => throw new IllegalArgumentException(
        s"unsupported ABI type $typ")
    }
  }

  /** Spark SQL type a static ABI type decodes to (for empty-array
    * casts). */
  private def sqlType(typ: String): String = typ match {
    case "address" => "STRING"
    case "bool" => "BOOLEAN"
    case t if t.startsWith("bytes") && t.length > 5 => "STRING"
    case "string" | "bytes" => "STRING"
    case t => (intBits(t, "uint"), intBits(t, "int")) match {
      case (Some(b), _) if b <= 63 => "BIGINT"
      case (Some(_), _) => "STRING"
      case (_, Some(b)) if b < 64 => "BIGINT"
      case (_, Some(_)) => "STRING"
      case _ => throw new IllegalArgumentException(
        s"unsupported ABI element type $typ")
    }
  }

  /** Fixed-size array form `T[k]` → (T, k). */
  private def fixedArray(typ: String): Option[(String, Int)] = {
    val m = "^(.*)\\[(\\d+)\\]$".r
    typ match {
      case m(elem, k) => Some((elem, k.toInt))
      case _ => None
    }
  }

  private def isDynamic(p: AbiParam): Boolean = p.typ match {
    case "string" | "bytes" => true
    case t if t.endsWith("[]") => true
    case t => fixedArray(t) match {
      // per the ABI spec T[k] is STATIC iff T is static
      case Some((elem, _)) => isDynamic(p.copy(typ = elem))
      case None =>
        p.typ.startsWith("tuple") && p.components.exists(isDynamic)
    }
  }

  /** Whether a type is an ABI VALUE type — an indexed param of any
    * other (reference) type is stored as its keccak hash in the topic,
    * not as a decodable word. */
  private def isValueType(p: AbiParam): Boolean =
    !p.typ.startsWith("tuple") && !p.typ.contains("[") &&
      p.typ != "string" && p.typ != "bytes"

  /** Words a static param occupies (static tuples/arrays flatten).
    * Fixed-array form checks FIRST — `tuple[k]` starts with "tuple"
    * but occupies k × the component sum, and staticValue advances by
    * this count, so the two must agree on the same precedence. */
  private def staticSlots(p: AbiParam): Int =
    fixedArray(p.typ) match {
      case Some((elem, k)) => k * staticSlots(p.copy(typ = elem))
      case None if p.typ.startsWith("tuple") =>
        p.components.map(staticSlots).sum
      case None => 1
    }

  /** Head slots a param occupies in its enclosing tuple/array: any
    * dynamic type takes ONE offset word; static types inline. */
  private def headSlots(p: AbiParam): Int =
    if (isDynamic(p)) 1 else staticSlots(p)

  private def fieldName(p: AbiParam, i: Int): String =
    if (p.name.isEmpty) s"_$i" else p.name

  /** Spark DDL type of any decodable param — the empty-array cast for
    * arbitrarily nested shapes. */
  private def sqlTypeOf(p: AbiParam): String =
    if (p.typ == "string" || p.typ == "bytes") "STRING"
    else if (p.typ.endsWith("[]"))
      s"ARRAY<${sqlTypeOf(p.copy(typ = p.typ.dropRight(2)))}>"
    else fixedArray(p.typ) match {
      case Some((e, _)) => s"ARRAY<${sqlTypeOf(p.copy(typ = e))}>"
      case None if p.typ.startsWith("tuple") =>
        p.components.zipWithIndex
          .map { case (c, i) => s"`${fieldName(c, i)}`: ${sqlTypeOf(c)}" }
          .mkString("STRUCT<", ", ", ">")
      case None => sqlType(p.typ)
    }

  /** Static decode rooted at a DATA-DEPENDENT char offset `base` —
    * the twin of the constant-offset `staticValue` fast path, for
    * static values living inside dynamic regions (e.g. the elements
    * of a `(uint32,uint32)[]`). */
  private def staticValueAt(p: AbiParam, base: Column,
      data: Column): Column =
    fixedArray(p.typ) match {
      case Some((et, k)) =>
        val ep = p.copy(typ = et)
        val es = staticSlots(ep)
        array((0 until k).map(i =>
          staticValueAt(ep, base + i.toLong * 64 * es, data)): _*)
      case None if p.typ.startsWith("tuple") =>
        var off = 0L
        struct(p.components.zipWithIndex.map { case (cp, i) =>
          val c = staticValueAt(cp, base + off * 64, data)
            .as(fieldName(cp, i))
          off += staticSlots(cp)
          c
        }: _*)
      case None =>
        wordValue(data.substr((base + 3).cast("int"), lit(64)), p.typ,
          p.components)
    }

  /** Fully general decode of `p` whose ABI encoding starts at 0-based
    * char offset `base` within `data`'s hex body. Implements the
    * spec's recursive layout — a dynamic value is [its own heads ‖
    * tails] with offsets relative to ITS start:
    *   string/bytes  len ‖ payload
    *   T[]           len ‖ enc(T[len])  (element offsets rel. to
    *                 after-length when T is dynamic; inline strides of
    *                 staticSlots(T) words when static)
    *   T[k], dyn T   k offset words rel. to base ‖ tails
    *   tuple, dyn    component heads (offsets rel. to base) ‖ tails
    * Every offset is Column arithmetic over substr/conv, so the whole
    * tree stays inside whole-stage codegen — no UDF, no JSON hop. */
  private def valueAt(p: AbiParam, base: Column, data: Column): Column = {
    def uintAt(off: Column): Column =
      conv(data.substr((off + 3).cast("int"), lit(64)), 16, 10)
        .cast("long")
    if (!isDynamic(p)) staticValueAt(p, base, data)
    else p.typ match {
      case "string" | "bytes" =>
        val lenChars = uintAt(base) * 2
        val pay = data.substr((base + 3 + 64).cast("int"),
          lenChars.cast("int"))
        if (p.typ == "string") decode(unhex(pay), "UTF-8")
        else concat(lit("0x"), lower(pay))
      case t if t.endsWith("[]") =>
        val ep = p.copy(typ = t.dropRight(2))
        val len = uintAt(base).cast("int")
        val elems = base + 64
        val arr = transform(sequence(lit(0), len - 1), i => {
          val iL = i.cast("long")
          val eBase =
            if (isDynamic(ep)) elems + uintAt(elems + iL * 64) * 2
            else elems + iL * (64L * staticSlots(ep))
          valueAt(ep, eBase, data)
        })
        // sequence(0, -1) would DESCEND — empty arrays need a guard
        when(len === 0, array().cast(s"ARRAY<${sqlTypeOf(ep)}>"))
          .otherwise(arr)
      case t => fixedArray(t) match {
        case Some((et, k)) =>
          // T[k] with dynamic T encodes like a k-tuple of T: k offset
          // words relative to base, tails after
          val ep = p.copy(typ = et)
          array((0 until k).map(i =>
            valueAt(ep, base + uintAt(base + i.toLong * 64) * 2,
              data)): _*)
        case None => // tuple with >=1 dynamic component
          var slot = 0L
          struct(p.components.zipWithIndex.map { case (cp, i) =>
            val hOff = base + slot * 64
            slot += headSlots(cp)
            val c =
              if (isDynamic(cp))
                valueAt(cp, base + uintAt(hOff) * 2, data)
              else staticValueAt(cp, hOff, data)
            c.as(fieldName(cp, i))
          }: _*)
      }
    }
  }

  /** Decoded (name, Column) pairs for one log's `topics` (array of
    * 0x-hex words) and `data` (0x-hex). */
  def decodedColumns(e: AbiEvent, topics: Column,
      data: Column): Seq[(String, Column)] = {
    var topicIdx = if (e.anonymous) 0 else 1
    var slot = 0
    def dataWord(k: Int): Column = substring(data, 3 + 64 * k, 64)
    e.inputs.map { p =>
      if (p.indexed) {
        val t = topics(topicIdx); topicIdx += 1
        val c =
          // an indexed REFERENCE type (tuple/array/string/bytes) is
          // stored as its keccak hash — the topic IS the value
          if (!isValueType(p)) t
          else wordValue(regexp_replace(t, "^0x", ""), p.typ, p.components)
        p.name -> c
      } else if (isDynamic(p)) {
        // head slot holds the byte offset of the value's own encoding
        // (relative to the data start at top level); everything at and
        // below that offset is the fully general recursive layout
        val headSlot = slot; slot += 1
        val offChars = conv(dataWord(headSlot), 16, 10).cast("long") * 2
        p.name -> valueAt(p, offChars, data)
      } else {
        // the literal offset constant-folds, so this stays the same
        // constant-offset substring/conv codegen as the old local path
        val c = staticValueAt(p, lit(64L * slot), data)
        slot += staticSlots(p)
        p.name -> c
      }
    }
  }

  /** Filter+decode a logs frame on one ABI event: keeps rows whose
    * topic0 matches the ABI signature and appends a `decoded` struct.
    * `logs` needs `topics` (array<string>) and `data` columns. */
  def decodeLogs(logs: DataFrame, abiJson: String,
      topicsCol: String = "topics", dataCol: String = "data"): DataFrame = {
    val e = parseEvent(abiJson)
    val matched =
      if (e.anonymous) logs
      else logs.filter(col(topicsCol)(0) === topic0(e))
    val cols = decodedColumns(e, col(topicsCol), col(dataCol))
      .map { case (n, c) => c.as(n) }
    matched.withColumn("decoded", struct(cols: _*))
  }

  // ---- function fragments: arbitrary calldata decode ----
  // (ref ethTool.js decodeTransactionInput — abiDecoder resolves the
  // 4-byte selector against the held ABI and decodes the remaining
  // calldata; here the fragment compiles at PLAN time into the same
  // recursive Column-offset arithmetic the event tier uses, so any
  // method — multicall, ERC-4337 handleOps, nested tuples — decodes
  // inside whole-stage codegen with no per-row ABI machinery.)

  final case class AbiFunction(name: String, inputs: Seq[AbiParam])

  /** Parse one function ABI fragment, e.g.
    * `{"type":"function","name":"transfer","inputs":[
    *   {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}`. */
  def parseFunction(json: String): AbiFunction = {
    val n = mapper.readTree(json)
    require(n.path("type").asText("function") == "function",
      s"not a function ABI: ${n.path("type").asText}")
    AbiFunction(n.path("name").asText, param(n.path("inputs")))
  }

  /** Canonical signature (aliases normalized, tuples expanded) —
    * the keccak preimage of the selector. */
  def signature(f: AbiFunction): String =
    s"${f.name}(${f.inputs.map(canonType).mkString(",")})"

  /** 4-byte selector: first 4 bytes of keccak256(signature),
    * lowercase 0x-hex (the EVM call convention). */
  def selectorOf(f: AbiFunction): String =
    "0x" + Keccak.topic(signature(f)).drop(2).take(8)

  /** Decoded (name, Column) pairs for one function's calldata `input`
    * (0x-hex incl. the 4-byte selector). The argument tuple is encoded
    * exactly like a non-indexed event body starting after the
    * selector, so the event machinery is reused verbatim on a
    * re-prefixed body column. */
  def decodedCallColumns(f: AbiFunction,
      input: Column): Seq[(String, Column)] = {
    val body = concat(lit("0x"), input.substr(lit(11), length(input)))
    decodedColumns(
      AbiEvent(f.name, f.inputs.map(_.copy(indexed = false)),
        anonymous = true),
      lit(null).cast("array<string>"), body)
  }

  /** ABI registry dimension: one row per fragment —
    * (fingerprint, kind, name, signature, abi) — where the fingerprint
    * is the 4-byte selector for functions and the 32-byte topic0 for
    * events, the reference's fingerprintID convention (ref
    * evmManager.js contractABIs / buildSchemaInfoFromFingerprintID:
    * `length == 10 → 'call', else 'evt'`). Persist it with the writer
    * tier and broadcast-join it to decoded frames to resolve held
    * ABIs. */
  def registryFrame(spark: org.apache.spark.sql.SparkSession,
      abiJsons: Seq[String]): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    abiJsons.flatMap { json =>
      // a whole contract ABI passed as ONE array string expands into
      // its fragments (the common caller shape); anything that is
      // neither an object nor an array cannot be a fragment — reject
      // loudly instead of emitting a bogus selector-of-"()" row
      val root = mapper.readTree(json)
      val nodes: Seq[JsonNode] =
        if (root.isArray) root.elements().asScala.toSeq
        else if (root.isObject) Seq(root)
        else throw new IllegalArgumentException(
          s"ABI fragment is not a JSON object or array: " +
            s"${root.getNodeType} in ${json.take(80)}")
      nodes.flatMap { n =>
        require(n.isObject, s"ABI array element is not an object: " +
          s"${n.getNodeType} in ${json.take(80)}")
        // full contract ABIs carry constructor/fallback/receive/error
        // entries too — only functions and events have a fingerprint,
        // the rest are skipped like the reference's call/evt
        // convention; a missing 'type' defaults to 'function' ONLY
        // for nodes that carry a 'name' (the solc pre-0.6 shorthand)
        val kind =
          if (n.hasNonNull("type")) n.path("type").asText
          else if (n.hasNonNull("name")) "function"
          else "" // typeless nameless node: not a fragment
        val text = if (root.isArray) mapper.writeValueAsString(n) else json
        kind match {
          case "event" =>
            val e = parseEvent(text)
            Some((topic0(e), "evt", e.name, signature(e), text))
          case "function" =>
            val f = parseFunction(text)
            Some((selectorOf(f), "call", f.name, signature(f), text))
          case _ => None
        }
      }
    }.toDF("fingerprint", "kind", "name", "signature", "abi")
  }

  /** Decode a tx frame's `input` calldata against a set of function ABI
    * fragments: appends `selector`, `method` (null when no fragment
    * matches — the reference stores the selector and moves on), and
    * `decoded_call` (JSON text of the decoded argument struct; JSON
    * because different methods decode to different shapes and one
    * column must carry them all, mirroring the reference's decoded
    * params JSON). Each fragment's decode expressions sit behind their
    * selector's `when` guard, so only the matching branch evaluates. */
  def decodeCalldata(txs: DataFrame, abiJsons: Seq[String],
      inputCol: String = "input"): DataFrame = {
    val fns = abiJsons.map(parseFunction)
    val dup = fns.groupBy(selectorOf).collect { case (s, fs) if fs.size > 1 =>
      s"$s (${fs.map(_.name).mkString(", ")})" }
    require(dup.isEmpty, s"duplicate selectors: ${dup.mkString("; ")}")
    val sel = lower(substring(col(inputCol), 1, 10))
    val method = fns.foldLeft(lit(null).cast("string")) { (acc, f) =>
      when(sel === selectorOf(f), lit(f.name)).otherwise(acc)
    }
    val decoded = fns.foldLeft(lit(null).cast("string")) { (acc, f) =>
      val cols = decodedCallColumns(f, col(inputCol))
        .map { case (n, c) => c.as(n) }
      when(sel === selectorOf(f), to_json(struct(cols: _*))).otherwise(acc)
    }
    txs.withColumn("selector", sel)
      .withColumn("method", method)
      .withColumn("decoded_call", decoded)
  }
}
