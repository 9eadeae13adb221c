package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Translator for the expr-lang subset the reference's plugins and
  * processors use (expr/expression.go:129-137 CreateBoolExpression /
  * CreateValueExpression) into Catalyst `Column` trees.
  *
  * Supported (the operators observed across plugins/ and processor
  * configs): `==  !=  >  >=  <  <=`, `and or not ! && ||`, `matches`
  * (regex), `contains`, `startsWith`, `endsWith`, `nil` comparisons,
  * parentheses, string/number/bool literals, identifiers with dotted paths
  * and `map["key"]` indexing.
  *
  * Error semantics parity: expr-lang evaluates with AllowUndefinedVariables
  * and `ExpressionMap` silently skips failed/nil expressions
  * (expr/map.go:31-34) — here unresolved identifiers become null columns
  * (`when(false, ...)`), which Catalyst folds, and comparisons with null
  * yield null → filtered rows drop, matching Match()'s false-on-error.
  */
object ExprLang {

  // ---- lexer ----
  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Num(s: String) extends Tok
  private case class Op(s: String) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val j = s.indexOf(c, i + 1)
        require(j > 0, s"unterminated string at $i in: $s")
        out += Str(s.substring(i + 1, j)); i = j + 1
      } else if (c.isDigit) {
        val j = s.indexWhere(ch => !(ch.isDigit || ch == '.'), i)
        val end = if (j < 0) s.length else j
        out += Num(s.substring(i, end)); i = end
      } else if (c.isLetter || c == '_') {
        val j = s.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_' || ch == '.'), i)
        val end = if (j < 0) s.length else j
        out += Ident(s.substring(i, end)); i = end
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("==", "!=", ">=", "<=", "&&", "||").contains(two)) {
          out += Op(two); i += 2
        } else {
          out += Op(c.toString); i += 1
        }
      }
    }
    out.toList
  }

  // ---- parser (recursive descent) ----
  private class P(var toks: List[Tok], resolve: String => Option[Column]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expect(op: String): Unit = next() match {
      case Op(`op`) =>
      case t => throw new IllegalArgumentException(s"expected '$op', got $t")
    }

    /** expr-lang ternary `cond ? a : b` — lowest precedence. */
    def parseTernary(): Column = {
      val c = parseOr()
      peek match {
        case Some(Op("?")) =>
          next()
          val a = parseTernary()
          expect(":")
          val b = parseTernary()
          when(coalesce(c, lit(false)), a).otherwise(b)
        case _ => c
      }
    }

    def parseOr(): Column = {
      var l = parseAnd()
      while (peek.contains(Op("||")) || peek.contains(Ident("or"))) {
        next(); l = l || parseAnd()
      }
      l
    }

    def parseAnd(): Column = {
      var l = parseNot()
      while (peek.contains(Op("&&")) || peek.contains(Ident("and"))) {
        next(); l = l && parseNot()
      }
      l
    }

    def parseNot(): Column = peek match {
      case Some(Op("!")) => next(); !parseNot()
      case Some(Ident("not")) => next(); !parseNot()
      case _ => parseCmp()
    }

    def parseCmp(): Column = {
      val l = parseAdd()
      peek match {
        case Some(Op(o)) if Set("==", "!=", ">", ">=", "<", "<=").contains(o) =>
          next()
          val isNil = peek.contains(Ident("nil"))
          if (isNil) {
            next()
            if (o == "==") l.isNull else l.isNotNull
          } else {
            val r = parseAdd()
            o match {
              case "==" => l === r
              case "!=" => l =!= r
              case ">" => l > r
              case ">=" => l >= r
              case "<" => l < r
              case "<=" => l <= r
            }
          }
        case Some(Ident("matches")) => next(); l.rlike(str())
        case Some(Ident("contains")) => next(); l.contains(lit(str()))
        case Some(Ident("startsWith")) => next(); l.startsWith(str())
        case Some(Ident("endsWith")) => next(); l.endsWith(str())
        // expr-lang membership: `x in ['a', 'b']` / `x not in [...]`
        case Some(Ident("in")) => next(); l.isin(inList(): _*)
        case Some(Ident("not")) if toks.drop(1).headOption.contains(Ident("in")) =>
          next(); next(); !l.isin(inList(): _*)
        case _ => l
      }
    }

    private def inList(): Seq[Any] = {
      expect("[")
      val vals = scala.collection.mutable.ListBuffer[Any]()
      def one(): Unit = next() match {
        case Str(s) => vals += s
        case Num(s) => vals += (if (s.contains('.')) s.toDouble else s.toLong)
        case t => throw new IllegalArgumentException(s"expected literal in list, got $t")
      }
      if (!peek.contains(Op("]"))) {
        one()
        while (peek.contains(Op(","))) { next(); one() }
      }
      expect("]")
      vals.toSeq
    }

    private def str(): String = next() match {
      case Str(s) => s
      case t => throw new IllegalArgumentException(s"expected string, got $t")
    }

    /** Arithmetic (expr-lang precedence: `* / %` over `+ -`;
      * expr/expression.go:134-137 CreateValueExpression compiles the full
      * expr grammar, whose `/` is always float division).
      */
    def parseAdd(): Column = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case Some(Op("+")) => next(); l = l + parseMul()
        case Some(Op("-")) => next(); l = l - parseMul()
        case _ => go = false
      }
      l
    }

    def parseMul(): Column = {
      var l = parseUnary()
      var go = true
      while (go) peek match {
        case Some(Op("*")) => next(); l = l * parseUnary()
        // expr-lang `/` is float division (int/int would silently truncate
        // in Spark); `%` stays in the operands' native type
        case Some(Op("/")) => next(); l = l.cast("double") / parseUnary().cast("double")
        case Some(Op("%")) => next(); l = l % parseUnary()
        case _ => go = false
      }
      l
    }

    def parseUnary(): Column = peek match {
      case Some(Op("-")) => next(); negate(parseUnary())
      case _ => parseTerm()
    }

    def parseTerm(): Column = next() match {
      case Str(s) => lit(s)
      case Num(s) => if (s.contains('.')) lit(s.toDouble) else lit(s.toLong)
      case Ident("true") => lit(true)
      case Ident("false") => lit(false)
      case Ident("nil") => lit(null)
      case Ident(name) =>
        peek match {
          // OTTL converter call: Name(arg, ...) (expr/ottl.go:92-143 exposes
          // the upstream converter set; this is the subset plugins use)
          case Some(Op("(")) if Converters.contains(name) =>
            next()
            val args = scala.collection.mutable.ListBuffer[Column]()
            // OTTL slice args (`Format("%s=%s", [k, v])`) flatten into the
            // converter's positional argument list
            def parseArg(): Unit = peek match {
              case Some(Op("[")) =>
                next()
                if (!peek.contains(Op("]"))) {
                  args += parseTernary()
                  while (peek.contains(Op(","))) { next(); args += parseTernary() }
                }
                expect("]")
              case _ => args += parseTernary()
            }
            if (!peek.contains(Op(")"))) {
              parseArg()
              while (peek.contains(Op(","))) { next(); parseArg() }
            }
            expect(")")
            ContextRequires.get(name).foreach { req =>
              if (resolve(req).isEmpty) throw new IllegalArgumentException(
                s"$name() is context-scoped: the expression env must provide " +
                  s"'$req' (e.g. a span env from AggOps.spanHierarchy)")
            }
            Converters(name)(args.toList)
          case _ =>
            val base = resolve(name).getOrElse(
              // AllowUndefinedVariables: undefined → null column
              when(lit(false), lit("")))
            // optional ["key"] map indexing
            peek match {
              case Some(Op("[")) =>
                next()
                val k = str()
                expect("]")
                base.getItem(k)
              case _ => base
            }
        }
      case Op("(") =>
        val e = parseTernary() // full grammar inside parens, incl. `?:`
        expect(")")
        e
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }
  }

  /** OTTL converter functions ≈ built-in SQL functions (SURVEY §2B): the
    * "return nil on failure" contract maps to null-propagating casts.
    */
  /** Context-scoped converters: name → env column the expression env must
    * resolve for the call to be legal (upstream registers these only for
    * specific ottl contexts, e.g. IsRootSpan for ottlspan). The parser
    * rejects a call whose env lacks the column — loud and at compile time,
    * never a silent bind to an unrelated same-named column.
    */
  val ContextRequires: Map[String, String] = Map("IsRootSpan" -> "parent_span_id")

  val Converters: Map[String, List[Column] => Column] = Map(
    "Concat" -> (args => concat_ws("", args: _*)),
    "Substring" -> {
      case c :: start :: len :: Nil =>
        c.substr(start.cast("int") + 1, len.cast("int")) // OTTL start is 0-based
      case args => throw new IllegalArgumentException(
        s"Substring(value, start, length) expects 3 args, got ${args.length}")
    },
    "Int" -> (args => args.head.cast("long")),
    "Double" -> (args => args.head.cast("double")),
    "String" -> (args => args.head.cast("string")),
    "Len" -> (args => length(args.head).cast("long")),
    "ToLowerCase" -> (args => lower(args.head)),
    "ToUpperCase" -> (args => upper(args.head)),
    "Time" -> {
      case c :: fmt :: Nil =>
        to_timestamp(c, graft.parse.ParseOps.strptimeToJava(extractLit(fmt)))
      case args => throw new IllegalArgumentException(
        s"Time(value, format) expects 2 args, got ${args.length}")
    },
    "UnixMilli" -> (args => unix_millis(args.head.cast("timestamp"))),
    "ParseJSON" -> (args => args.head), // parsed lazily by downstream getItem
    "IsMatch" -> {
      case c :: pat :: Nil => c.rlike(extractLit(pat))
      case args => throw new IllegalArgumentException(
        s"IsMatch(value, pattern) expects 2 args, got ${args.length}")
    },
    // ---- upstream ottlfuncs.StandardConverters breadth (expr/ottl.go:92-100
    // registers the ENTIRE set; these are the commonly-configured ones) ----
    "SHA256" -> (args => sha2(args.head.cast("string"), 256)),
    "SHA1" -> (args => sha1(args.head.cast("string"))),
    "MD5" -> (args => md5(args.head.cast("string"))),
    "FNV" -> (args => xxhash64(args.head.cast("string"))), // 64-bit keyed hash stand-in
    // Go fmt %x is lowercase; Spark hex() is uppercase
    "Hex" -> (args => lower(hex(args.head))),
    "Split" -> {
      case c :: sep :: Nil =>
        split(c, java.util.regex.Pattern.quote(extractLit(sep)))
      case args => throw new IllegalArgumentException(
        s"Split(value, delimiter) expects 2 args, got ${args.length}")
    },
    "TrimSpace" -> (args => trim(args.head)),
    "Trim" -> {
      case c :: Nil => trim(c)
      case c :: cut :: Nil => trim(c, extractLit(cut))
      case args => throw new IllegalArgumentException(
        s"Trim(value[, cutset]) expects 1-2 args, got ${args.length}")
    },
    // Format(fmt, [args...]) — the slice literal flattens in the parser
    "Format" -> (args => format_string(extractLit(args.head), args.tail: _*)),
    "ConvertCase" -> {
      case c :: cs :: Nil => extractLit(cs) match {
        case "lower" => lower(c)
        case "upper" => upper(c)
        case "snake" => snakeCase(c)
        case "camel" => camelCase(c)
        case other => throw new IllegalArgumentException(s"ConvertCase '$other'")
      }
      case args => throw new IllegalArgumentException(
        s"ConvertCase(value, case) expects 2 args, got ${args.length}")
    },
    "ReplacePattern" -> {
      case c :: pat :: rep :: Nil =>
        regexp_replace(c, extractLit(pat), extractLit(rep))
      case args => throw new IllegalArgumentException(
        s"ReplacePattern(value, pattern, replacement) expects 3 args, got ${args.length}")
    },
    // time-part converters (int64 per upstream)
    "Year" -> (args => year(args.head.cast("timestamp")).cast("long")),
    "Month" -> (args => month(args.head.cast("timestamp")).cast("long")),
    "Day" -> (args => dayofmonth(args.head.cast("timestamp")).cast("long")),
    "Hour" -> (args => hour(args.head.cast("timestamp")).cast("long")),
    "Minute" -> (args => minute(args.head.cast("timestamp")).cast("long")),
    "Second" -> (args => second(args.head.cast("timestamp")).cast("long")),
    "UnixSeconds" -> (args => unix_seconds(args.head.cast("timestamp"))),
    "UnixMicro" -> (args => unix_micros(args.head.cast("timestamp"))),
    "UnixNano" -> (args => unix_micros(args.head.cast("timestamp")) * 1000L),
    "TruncateTime" -> {
      case c :: d :: Nil => extractLit(d) match {
        // Go duration strings the configs use
        case "1h" => date_trunc("hour", c.cast("timestamp"))
        case "1m" => date_trunc("minute", c.cast("timestamp"))
        case "1s" => date_trunc("second", c.cast("timestamp"))
        case "24h" => date_trunc("day", c.cast("timestamp"))
        case other => throw new IllegalArgumentException(s"TruncateTime '$other'")
      }
      case args => throw new IllegalArgumentException(
        s"TruncateTime(time, duration) expects 2 args, got ${args.length}")
    },
    // URL(url_string) → struct of parts (upstream URL converter returns a
    // map with scheme/host/port/path/query/fragment)
    "URL" -> (args => urlStruct(args.head)),
    "ParseURL" -> (args => urlStruct(args.head)),
    "ExtractPatterns" -> {
      case c :: pat :: Nil =>
        // named-group extraction → map; upstream returns a pcommon.Map of
        // the named capture groups
        val p = extractLit(pat)
        val names = namedGroups(p)
        map_from_arrays(
          array(names.map(lit): _*),
          array(names.zipWithIndex.map { case (n, _) =>
            regexp_extract(c, p, groupIndex(p, n)) }: _*))
      case args => throw new IllegalArgumentException(
        s"ExtractPatterns(value, pattern) expects 2 args, got ${args.length}")
    },
    "Keys" -> (args => map_keys(args.head)),
    "Values" -> (args => map_values(args.head)),
    "Log" -> (args => log(args.head.cast("double"))),
    "Sqrt" -> (args => sqrt(args.head.cast("double"))),
    "Abs" -> (args => abs(args.head)),
    "SHA512" -> (args => sha2(args.head.cast("string"), 512)),
    "Base64Decode" -> (args => unbase64(args.head).cast("string")),
    // ParseKeyValue(target[, delimiter[, pair_delimiter]]) — defaults "=", " "
    "ParseKeyValue" -> {
      case c :: Nil => kvParse(c, "=", " ")
      case c :: delim :: Nil => kvParse(c, extractLit(delim), " ")
      case c :: delim :: pair :: Nil =>
        kvParse(c, extractLit(delim), extractLit(pair))
      case args => throw new IllegalArgumentException(
        s"ParseKeyValue(value[, delimiter[, pair_delimiter]]) expects 1-3 args, got ${args.length}")
    },
    // ParseCSV(target, headers[, delimiter[, header_delimiter[, mode]]])
    // → header→field map. Mode parity with ottlfuncs ParseCSV: the DEFAULT
    // "strict" mode requires the field count to match the header count —
    // a mismatch errors upstream, which no-ops the statement for that
    // record, represented here as a null map. "lax" zip-pads short rows
    // with nulls and drops extra fields.
    "ParseCSV" -> {
      case c :: headers :: rest if rest.size <= 3 =>
        val delim = rest.headOption.map(extractLit).getOrElse(",")
        val headerDelim = rest.drop(1).headOption.map(extractLit).getOrElse(",")
        val mode = rest.drop(2).headOption.map(extractLit).getOrElse("strict")
        val hs = split(lit(extractLit(headers)),
          java.util.regex.Pattern.quote(headerDelim))
        val fields = split(c, java.util.regex.Pattern.quote(delim))
        // zip_with pads the SHORTER side with nulls: a long row pads the
        // headers array, and a null key would crash map_from_entries —
        // filter padded entries out so lax mode truly drops extra fields
        val zipped = map_from_entries(filter(
          zip_with(hs, fields, (h, v) => struct(h.as("key"), v.as("value"))),
          e => e.getField("key").isNotNull))
        mode match {
          case "strict" => when(size(fields) === size(hs), zipped)
          case "lax"    => zipped
          case other => throw new IllegalArgumentException(
            s"ParseCSV: unknown mode '$other' (strict|lax)")
        }
      case args => throw new IllegalArgumentException(
        s"ParseCSV(value, headers[, delimiter[, header_delimiter[, mode]]]) expects 2-5 args, got ${args.length}")
    },
    // Go time.ParseDuration: "1h30m", "100ms" → nanoseconds; an invalid
    // duration string returns nil (null), matching the converter contract.
    // REPEATED units sum ('1m30m' = 90m), exactly as Go accumulates
    // components left to right.
    "Duration" -> (args => {
      val c = args.head.cast("string")
      def part(unit: String, mult: Double): Column =
        aggregate(regexp_extract_all(c, lit(s"(\\d+(?:\\.\\d+)?)$unit"), lit(1)),
          lit(0.0), (acc, x) => acc + coalesce(x.try_cast("double"), lit(0.0))) * mult
      val ns = part("h", 3600e9) + part("m(?!s)", 60e9) + part("s(?![a-z])", 1e9) +
        part("ms", 1e6) + part("us", 1e3) + part("ns", 1.0)
      when(c.rlike("^(\\d+(?:\\.\\d+)?(h|m|s|ms|us|ns))+$"), ns.cast("long"))
        .otherwise(lit(null).cast("long"))
    }),
    // Duration-unit extractors over Duration() nanos — Go parity:
    // Hours/Minutes/Seconds return float64, Milliseconds/Microseconds/
    // Nanoseconds truncating int64
    "Hours" -> (args => args.head.cast("double") / 3600e9),
    "Minutes" -> (args => args.head.cast("double") / 60e9),
    "Seconds" -> (args => args.head.cast("double") / 1e9),
    "Milliseconds" -> (args => {
      val n = args.head.cast("long")
      ((n - pmod(n, lit(1000000L))) / 1000000L).cast("long")
    }),
    "Microseconds" -> (args => {
      val n = args.head.cast("long")
      ((n - pmod(n, lit(1000L))) / 1000L).cast("long")
    }),
    "Nanoseconds" -> (args => args.head.cast("long")),
    // upstream registers dedicated case converters beside ConvertCase;
    // both share ONE implementation with ConvertCase's branches
    "ToSnakeCase" -> (args => snakeCase(args.head)),
    "ToCamelCase" -> (args => camelCase(args.head)),
    // GetXML(target, xpath) — XML text extraction via the engine's native
    // xpath evaluator (the ottlfuncs XML tier's read path; the write path
    // Insert/RemoveXML stays out until a config needs it)
    "GetXML" -> {
      case c :: path :: Nil => xpath_string(c, lit(extractLit(path)))
      case args => throw new IllegalArgumentException(
        s"GetXML(value, xpath) expects 2 args, got ${args.length}")
    },
    // ---- converter tail batch 3: the remaining StandardConverters tiers
    // (upstream ottlfuncs registry; expr/ottl.go:96 registers the full set).
    // Engine-context deviations are documented per converter. ----
    // Decode(value, encoding) — supersedes the deprecated Base64Decode
    "Decode" -> {
      case c :: enc :: Nil => extractLit(enc) match {
        case "base64" => unbase64(c.cast("string")).cast("string")
        case "base64url" | "base64-url" =>
          unbase64(translate(c.cast("string"), "-_", "+/")).cast("string")
        case "hex" => unhex(c.cast("string")).cast("string")
        case "us-ascii" | "utf-8" | "utf8" => c.cast("string")
        case other => throw new IllegalArgumentException(
          s"Decode: unsupported encoding '$other'")
      }
      case args => throw new IllegalArgumentException(
        s"Decode(value, encoding) expects 2 args, got ${args.length}")
    },
    // Go time.Weekday numbering: Sunday=0 .. Saturday=6
    "Weekday" -> (args =>
      (dayofweek(args.head.cast("timestamp")) - 1).cast("long")),
    // Unix(seconds[, nanoseconds]) → time
    "Unix" -> {
      case sec :: Nil => timestamp_seconds(sec.cast("long"))
      case sec :: nanos :: Nil =>
        timestamp_micros(sec.cast("long") * 1000000L +
          (nanos.cast("long") / 1000L).cast("long"))
      case args => throw new IllegalArgumentException(
        s"Unix(seconds[, nanoseconds]) expects 1-2 args, got ${args.length}")
    },
    "Now" -> (_ => current_timestamp()),
    "UUID" -> (_ => expr("uuid()")),
    // UUIDv7: 48-bit unix-millis prefix + version/variant nibbles + random
    // tail (RFC 9562 layout; randomness via uuid() entropy)
    "UUIDv7" -> (_ => {
      val ms = lower(lpad(hex(unix_millis(current_timestamp())), 12, "0"))
      val r = md5(expr("uuid()"))
      concat(substring(ms, 1, 8), lit("-"), substring(ms, 9, 4),
        lit("-7"), substring(r, 1, 3),
        lit("-8"), substring(r, 4, 3), lit("-"), substring(r, 7, 12))
    }),
    // TraceID/SpanID: validate-and-normalize hex ids (null on bad shape)
    "TraceID" -> (args => {
      val c = args.head.cast("string")
      when(c.rlike("^[0-9a-fA-F]{32}$"), lower(c))
    }),
    "SpanID" -> (args => {
      val c = args.head.cast("string")
      when(c.rlike("^[0-9a-fA-F]{16}$"), lower(c))
    }),
    // Murmur3Hash / Murmur3Hash128: CANONICAL MurmurHash3 x86_32 / x64_128
    // (seed 0), hex of the little-endian digest — the upstream ottlfuncs
    // output contract (murmur3hash.go: Sum32/Sum128 → LittleEndian → hex).
    // Vector-locked in ExprStreamSpec; see functions/Murmur3Hex.scala.
    "Murmur3Hash" -> (args => graft.functions.Murmur3Hex.of(args.head, bits128 = false)),
    "Murmur3Hash128" -> (args => graft.functions.Murmur3Hex.of(args.head, bits128 = true)),
    // IsString/IsList/IsMap: pcommon dynamic-type predicates answered from
    // the STATIC column type (typeof depends only on the plan) — gated on
    // isNotNull because upstream's pcommon check is against the VALUE, so
    // Is*(nil) is false (a NULL-valued string column is a nil pcommon
    // value, not a Str)
    "IsString" -> (args =>
      args.head.isNotNull && call_function("typeof", args.head) === lit("string")),
    "IsList" -> (args =>
      args.head.isNotNull && call_function("typeof", args.head).startsWith("array")),
    "IsMap" -> (args =>
      args.head.isNotNull && call_function("typeof", args.head).startsWith("map")),
    // IsRootSpan(): span-context predicate — true iff the span's parent id
    // is empty (ottlfuncs IsRootSpan: span.ParentSpanID().IsEmpty()).
    // Context-scoped via ContextRequires: the parser rejects it loudly
    // unless the env resolves parent_span_id (AggOps.spanHierarchy),
    // matching upstream's ottlspan-only registration.
    "IsRootSpan" -> (_ => coalesce(col("parent_span_id"), lit("")) === lit("")),
    // Sort(array[, order]) — 'asc' (default) | 'desc'
    "Sort" -> {
      case c :: Nil => array_sort(c)
      case c :: ord :: Nil => extractLit(ord) match {
        case "asc" => array_sort(c)
        case "desc" => reverse(array_sort(c))
        case other => throw new IllegalArgumentException(
          s"Sort order '$other' (asc|desc)")
      }
      case args => throw new IllegalArgumentException(
        s"Sort(array[, order]) expects 1-2 args, got ${args.length}")
    },
    // type predicates — OTTL values are dynamically typed; this engine's
    // columns are statically typed strings until cast, so the Is* family
    // answers the question configs actually ask (would the conversion
    // succeed): parse-based checks, null → false
    "IsInt" -> (args =>
      coalesce(args.head.cast("string").rlike("^[+-]?\\d+$"), lit(false))),
    "IsDouble" -> (args => coalesce(
      args.head.cast("string").rlike("^[+-]?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"),
      lit(false))),
    "IsBool" -> (args => coalesce(
      lower(args.head.cast("string")).isin("true", "false", "t", "f", "1", "0"),
      lit(false))),
    // Flatten(map[, prefix]): this engine's attribute maps are single-level
    // (nested bodies are plan-time structs), so Flatten reduces to the
    // prefix-rename it would apply to an already-flat map
    "Flatten" -> {
      case c :: Nil => c
      case c :: prefix :: Nil =>
        transform_keys(c, (k, _) => concat(lit(extractLit(prefix)), lit("."), k))
      case args => throw new IllegalArgumentException(
        s"Flatten(map[, prefix]) expects 1-2 args, got ${args.length}")
    },
    // SliceToMap(slice_of_maps, key_path[, value_path]): key each element by
    // one of its entries; last duplicate key wins (upstream map-set order)
    "SliceToMap" -> {
      case c :: keyPath :: rest if rest.size <= 1 =>
        val kp = extractLit(keyPath)
        val entries = transform(c, e => struct(
          element_at(e, kp).as("key"),
          rest.headOption.map(vp => map(lit("value"), element_at(e, extractLit(vp))))
            .getOrElse(e).as("value")))
        val present = filter(entries, e => e.getField("key").isNotNull)
        map_from_entries(lastWinsEntries(present))
      case args => throw new IllegalArgumentException(
        s"SliceToMap(slice, key_path[, value_path]) expects 2-3 args, got ${args.length}")
    },
    // ToKeyValueString(map[, delimiter[, pair_delimiter[, sort_keys]]])
    "ToKeyValueString" -> {
      case c :: rest if rest.size <= 3 =>
        val delim = rest.headOption.map(extractLit).getOrElse("=")
        val pairDelim = rest.drop(1).headOption.map(extractLit).getOrElse(" ")
        val sortKeys = rest.drop(2).headOption.map(extractLit)
          .exists(_.toBoolean)
        val entries0 = map_entries(c)
        val entries = if (sortKeys) array_sort(entries0) else entries0
        array_join(transform(entries, e =>
          concat(e.getField("key"), lit(delim), e.getField("value"))), pairDelim)
      case args => throw new IllegalArgumentException(
        s"ToKeyValueString(map[, delimiter[, pair_delimiter[, sort_keys]]]) expects 1-4 args, got ${args.length}")
    },
    // ParseSimplifiedXML / ParseXML: element-name → text-content map for the
    // document's leaf elements (attributes and nesting beyond one level are
    // out of this engine's simplified-XML subset; GetXML covers xpath reads)
    "ParseSimplifiedXML" -> (args => simplifiedXmlMap(args.head)),
    "ParseXML" -> (args => simplifiedXmlMap(args.head)),
    // RemoveXML(xml, xpath): element-name subset of the upstream xpath —
    // strips every occurrence of the last path segment's element
    // (self-closing or simple-content)
    "RemoveXML" -> {
      case c :: path :: Nil =>
        val name = extractLit(path).split("/").last
        regexp_replace(c,
          s"<$name\\b[^>]*/>|<$name\\b[^>]*>[^<]*</$name>", "")
      case args => throw new IllegalArgumentException(
        s"RemoveXML(xml, xpath) expects 2 args, got ${args.length}")
    },
    // InsertXML(xml, xpath, subdocument): appends the subdocument as the
    // last child of the element named by the xpath's final segment
    "InsertXML" -> {
      case c :: path :: sub :: Nil =>
        val name = extractLit(path).split("/").last
        regexp_replace(c, s"</$name>",
          java.util.regex.Matcher.quoteReplacement(extractLit(sub)) + s"</$name>")
      case args => throw new IllegalArgumentException(
        s"InsertXML(xml, xpath, subdocument) expects 3 args, got ${args.length}")
    },
    // ExtractGrokPatterns(value, pattern[, named_captures_only]) — grok
    // %{PATTERN:name} macros over a core dictionary, compiled to one
    // named-group regex (macro tokens only; literal regex between tokens
    // passes through, user-authored capture groups are out of the subset)
    "ExtractGrokPatterns" -> {
      case c :: pat :: rest if rest.size <= 1 =>
        val namedOnly = rest.headOption.map(extractLit).forall(_.toBoolean)
        val (full, names) = grokCompile(extractLit(pat), namedOnly)
        if (names.isEmpty) map(Seq.empty[Column]: _*)
        else {
          // a non-matching input yields NO keys (upstream grok sets no
          // attributes) — not a map of empty strings; the empty arm keeps
          // the entry type via a zero-length slice
          val entries = array(names.map(n => struct(lit(n._1).as("key"),
            regexp_extract(c, full, n._2).as("value"))): _*)
          map_from_entries(when(coalesce(c.rlike(full), lit(false)), entries)
            .otherwise(slice(entries, 1, 0)))
        }
      case args => throw new IllegalArgumentException(
        s"ExtractGrokPatterns(value, pattern[, named_captures_only]) expects 2-3 args, got ${args.length}")
    },
    // UserAgent(ua): product-token subset of the upstream UA parser — the
    // leading product/version pair plus the original string
    "UserAgent" -> (args => {
      val c = args.head.cast("string")
      map(
        lit("user_agent.original"), c,
        lit("user_agent.name"), regexp_extract(c, "^([^/\\s]+)/", 1),
        lit("user_agent.version"), regexp_extract(c, "^[^/\\s]+/([^\\s;]+)", 1))
    }),
    // merge_maps(target, source, strategy) — ottlfuncs editor semantics:
    // upsert = source wins, insert = only keys absent from target,
    // update = only keys present in target
    "MergeMaps" -> {
      case target :: source :: strat :: Nil => extractLit(strat) match {
        case "upsert" => map_concat(
          map_filter(target, (k, _) => !array_contains(map_keys(source), k)),
          source)
        case "insert" => map_concat(target,
          map_filter(source, (k, _) => !array_contains(map_keys(target), k)))
        case "update" => map_filter(
          // the source value overwrites UNCONDITIONALLY when its key is
          // present — even with a null value (Go `target[k] = v` sets nil;
          // coalesce would silently keep the old value)
          map_zip_with(target, source, (k, v1, v2) =>
            when(array_contains(map_keys(source), k), v2).otherwise(v1)),
          (k, _) => array_contains(map_keys(target), k))
        case other => throw new IllegalArgumentException(
          s"MergeMaps strategy '$other' (upsert|insert|update)")
      }
      case args => throw new IllegalArgumentException(
        s"MergeMaps(target, source, strategy) expects 3 args, got ${args.length}")
    })

  /** strcase.ToSnake: both boundaries — acronym-run end (HTTPServer →
    * HTTP_Server) THEN lower-to-upper (fooBar → foo_Bar).
    */
  private def snakeCase(c: Column): Column =
    lower(regexp_replace(
      regexp_replace(c, "([A-Z]+)([A-Z][a-z])", "$1_$2"),
      "([a-z0-9])([A-Z])", "$1_$2"))

  /** strcase.ToCamel: capitalize each _-part, join. */
  private def camelCase(c: Column): Column =
    concat_ws("", transform(split(c, "_"), p => initcap(p)))

  /** Key-value text → map. NOT str_to_map: its delimiters are regexes AND a
    * repeated key makes it THROW under the default
    * mapKeyDedupPolicy=EXCEPTION — free text routinely repeats tokens
    * ('status 500 ... size 500'), which must dedup LAST-WINS like Go map
    * assignment, not kill the query.
    */
  /** Go-map-set parity for repeated keys: keep entry i iff no later entry
    * shares its key (last assignment wins).
    */
  private def lastWinsEntries(entries: Column): Column =
    filter(entries, (e, i) =>
      !exists(slice(entries, i + 2, greatest(size(entries) - i - 1, lit(0))),
        e2 => e2.getField("key") === e.getField("key")))

  private def kvParse(c: Column, kvDelim: String, pairDelim: String): Column = {
    val pairs = split(c, java.util.regex.Pattern.quote(pairDelim))
    val entries = transform(pairs, p => {
      val kv = split(p, java.util.regex.Pattern.quote(kvDelim), 2)
      struct(element_at(kv, 1).as("key"),
        // token without the kv delimiter → null value (str_to_map parity)
        when(size(kv) >= 2, element_at(kv, 2)).as("value"))
    })
    map_from_entries(lastWinsEntries(entries))
  }

  /** Element-name → text map over a simplified-XML document's LEAF elements
    * (the `<name>text</name>` regex only matches elements whose content has
    * no child tags); repeated element names last-win like map sets.
    */
  private def simplifiedXmlMap(c: Column): Column = {
    val names = regexp_extract_all(c, lit("<(\\w+)[^>]*>[^<]*</"), lit(1))
    val vals = regexp_extract_all(c, lit("<\\w+[^>]*>([^<]*)</"), lit(1))
    val entries = zip_with(names, vals,
      (k, v) => struct(k.as("key"), v.as("value")))
    map_from_entries(lastWinsEntries(entries))
  }

  private val GrokIpv4 = "(?:\\d{1,3}\\.){3}\\d{1,3}"
  private val GrokHostname =
    "[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?(?:\\.[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)*"
  /** Core grok dictionary (the logstash base-pattern subset the reference's
    * parser configs draw on); every entry is capture-free so compiled group
    * indices are the macro substitution order.
    */
  private val GrokDict: Map[String, String] = Map(
    "WORD" -> "\\w+", "NOTSPACE" -> "\\S+", "SPACE" -> "\\s*",
    "DATA" -> ".*?", "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+", "POSINT" -> "\\d+", "NONNEGINT" -> "\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?", "BASE10NUM" -> "[+-]?\\d+(?:\\.\\d+)?",
    "IP" -> GrokIpv4, "IPV4" -> GrokIpv4,
    "HOSTNAME" -> GrokHostname,
    "IPORHOST" -> s"(?:$GrokIpv4|$GrokHostname)",
    "USER" -> "[a-zA-Z0-9._-]+", "USERNAME" -> "[a-zA-Z0-9._-]+",
    "LOGLEVEL" ->
      "(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|FATAL|CRITICAL|SEVERE)",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "UUID" ->
      "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "QS" -> "\"[^\"]*\"", "QUOTEDSTRING" -> "\"[^\"]*\"")

  /** Compile a grok expression to (regex, named-group→index) — %{PAT:name}
    * becomes a capturing group; %{PAT} captures under the pattern name only
    * when named_captures_only is off.
    */
  private def grokCompile(pattern: String,
                          namedOnly: Boolean): (String, Seq[(String, Int)]) = {
    val tok = "%\\{(\\w+)(?::([\\w.@\\[\\]]+))?\\}".r
    val names = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var gi = 0
    val full = tok.replaceAllIn(pattern, m => {
      val base = GrokDict.getOrElse(m.group(1),
        throw new IllegalArgumentException(
          s"ExtractGrokPatterns: unknown pattern %{${m.group(1)}}"))
      val nm = Option(m.group(2))
      val capture = nm.isDefined || !namedOnly
      java.util.regex.Matcher.quoteReplacement(
        if (capture) {
          gi += 1
          names += ((nm.getOrElse(m.group(1)), gi))
          s"($base)"
        } else s"(?:$base)")
    })
    (full, names.toSeq)
  }

  /** URL decomposition via Spark's native parse_url (codegen'd). */
  private def urlStruct(c: Column): Column = struct(
    parse_url(c, lit("PROTOCOL")).as("scheme"),
    parse_url(c, lit("HOST")).as("host"),
    parse_url(c, lit("PATH")).as("path"),
    parse_url(c, lit("QUERY")).as("query"),
    parse_url(c, lit("REF")).as("fragment"))

  private val NamedGroupRe = """\(\?<([A-Za-z][A-Za-z0-9]*)>""".r
  private def namedGroups(pat: String): Seq[String] =
    NamedGroupRe.findAllMatchIn(pat).map(_.group(1)).toSeq
  /** 1-based index of named group `n` among ALL capture groups of `pat`.
    * Scanner is escape- and character-class-aware: `\(`, parens inside
    * `[...]`, non-capturing `(?:`, and lookarounds `(?=  (?!  (?<=  (?<!`
    * do NOT count; only plain `(` and named `(?<name>` do.
    */
  private def groupIndex(pat: String, n: String): Int = {
    var idx = 0; var found = -1; var i = 0; var inClass = false
    while (i < pat.length && found < 0) {
      pat(i) match {
        case '\\' => i += 1 // skip the escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          val rest = pat.substring(i)
          val isNamed = rest.startsWith("(?<") &&
            !rest.startsWith("(?<=") && !rest.startsWith("(?<!")
          if (isNamed || !rest.startsWith("(?")) {
            idx += 1
            if (rest.startsWith(s"(?<$n>")) found = idx
          }
        case _ =>
      }
      i += 1
    }
    require(found > 0, s"named group '$n' not found in: $pat")
    found
  }

  private def extractLit(c: Column): String =
    org.apache.spark.sql.GraftBridge.literalValue(c)
      .map(String.valueOf)
      .getOrElse(throw new IllegalArgumentException(s"expected literal: $c"))

  /** Default identifier resolution for the transcript row env: the Record
    * env fields (expr/record.go:39-71) mapped onto our flat schema.
    */
  def defaultResolver(columns: Set[String]): String => Option[Column] = {
    val aliases = Map("body" -> "text", "severity_enum" -> "severity_text",
      "timestamp" -> "ts")
    name => {
      val target = aliases.getOrElse(name, name)
      val head = target.split("\\.").head
      if (columns.contains(head)) {
        Some(target.split("\\.").drop(1)
          .foldLeft(col(head))((c, f) => c.getField(f)))
      } else None
    }
  }

  /** ExpressionMap parity (expr/map.go:27-37): a NAMED set of value
    * expressions evaluated per record into one map; entries whose
    * expression fails or yields nil are SILENTLY SKIPPED — the key is
    * absent from the map, not null (map.go:31-34). Used by the count
    * processors' attrs extraction (logcount processor.go:121-132).
    */
  def expressionMap(specs: Seq[(String, String)], columns: Set[String]): Column =
    map_filter(
      map(specs.flatMap { case (k, src) =>
        Seq(lit(k), valueExpr(src, columns).cast("string"))
      }: _*),
      (_, v) => v.isNotNull)

  /** CreateBoolExpression parity: compile a predicate string to a Column. */
  def boolExpr(src: String, columns: Set[String]): Column =
    new P(lex(src), defaultResolver(columns)).parseTernary()

  /** CreateValueExpression parity — full arithmetic grammar plus ternary
    * and list membership (expr/expression.go:134-137; ExtractFloat/Int at
    * :68-117).
    */
  def valueExpr(src: String, columns: Set[String]): Column =
    new P(lex(src), defaultResolver(columns)).parseTernary()
}
