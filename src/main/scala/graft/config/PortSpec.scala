package graft.config

import graft.operators.ColumnTransforms.{ColumnSpec, ComputedSpec}

/** A `.port` construct outside the supported declarative subset. The message
  * names the construct and the fix (port the lambda to a JSON-spec
  * `transforms`/`computed` entry by hand). */
class PortParseException(msg: String) extends IllegalArgumentException(msg)

/** Reader for the DECLARATIVE subset of the reference's `.port` config files
  * (Starlark programs, /root/reference/database_configuration.go:114
  * `starlark.ExecFile`), mapping them onto [[JobSpec]] for drop-in migration
  * of existing pads — `graft.Main port-convert` prints the equivalent JSON.
  *
  * This is deliberately NOT a Starlark interpreter. It parses the statement
  * shapes the reference's own fixture corpus uses —
  *  - `Table("t").LoadStrategy(...).TransformColumn(...).ComputeColumn(...)`
  *    chains (the testdata databases fixtures),
  *  - endpoint directives `Get/AddHeader/BasicAuth/ResponseType/
  *    LoadStrategy/TableDefinition/Paginate/Transform/ErrorHandling`
  *    (the testdata apis fixtures),
  *  - and the small per-column helper functions those chains reference —
  * and TRANSLATES the recognized helper-function idioms into the engine's
  * declarative vocabulary (scalar ops / Catalyst SQL): `value * 100` →
  * `multiply:100`, `row['c'].strftime("%F")` → `date_format(c, ...)`,
  * `json.loads(row['c'])['k']` → `get_json_object(c, '$.k')`,
  * `yaml.loads(row['c'].split(s,1)[0])` + `dig(...)` →
  * `get_json_object(yaml_to_json(substring_index(...)), ...)`.
  * Anything else — a genuinely arbitrary lambda — fails loudly with the
  * offending code quoted, instead of silently mistranslating.
  */
object PortSpec {

  /** One parsed helper function: (argument name, body lines, source text). */
  private case class Fn(arg: String, body: Seq[String], src: String)

  /** Parse `.port` text into a [[JobSpec]].
    * @param dbSource db-style files (Table chains) name no physical source —
    *        the reference resolves that from the pad's databases.yml — so the
    *        caller supplies it; api-style files (Get …) build their own.
    * @param destination our lake has no external warehouse, so the caller
    *        names the destination table root. */
  def toJobSpec(text: String,
      env: String => Option[String] = sys.env.get,
      destination: DestinationSpec = DestinationSpec("tmp/lake/out"),
      dbSource: Option[SourceSpec] = None): JobSpec = {
    val interpolated = JobSpec.interpolate(text, env)
    val (stmts, fns) = logicalStatements(interpolated)

    var api: Option[SourceSpec] = None
    var itemsField: Option[String] = None
    var apiTransforms: Seq[ColumnSpec] = Nil
    var transformSeen = false
    var transformArgs: Seq[String] = Nil
    var schemaDef: Option[String] = None
    var retry4xx = false
    var offsetPaging = false
    var topStrategy: Option[TableExtractSpec] = None
    val tables = scala.collection.mutable.LinkedHashMap.empty[String, TableExtractSpec]

    stmts.foreach { s =>
      val call = "^(\\w+)\\s*\\(".r.findFirstMatchIn(s)
        .getOrElse(throw new PortParseException(s"unrecognized .port statement: $s"))
      call.group(1) match {
        case "Table" =>
          val (name, spec) = tableChain(s, fns)
          tables += name -> spec
        case "Get" =>
          api = Some(api.getOrElse(SourceSpec("api")).copy(url = singleString(s, "Get")))
        case "AddHeader" =>
          val Seq(k, v) = twoStrings(s, "AddHeader")
          api = Some(api.getOrElse(SourceSpec("api"))
            .copy(headers = api.map(_.headers).getOrElse(Map.empty) + (k -> v)))
        case "BasicAuth" =>
          val Seq(u, p) = twoStrings(s, "BasicAuth")
          api = Some(api.getOrElse(SourceSpec("api"))
            .copy(basicAuthUser = Some(u), basicAuthPassword = Some(p)))
        case "ResponseType" =>
          val rt = singleString(s, "ResponseType")
          // ≙ the reference's invalid-configuration error (api_invalid_configuration.port)
          if (rt != "json" && rt != "csv")
            throw new PortParseException(s"invalid ResponseType '$rt' (json|csv)")
          api = Some(api.getOrElse(SourceSpec("api")).copy(responseType = rt))
        case "LoadStrategy" => // top-level form (api files)
          topStrategy = Some(loadStrategy(argsOf(s, "LoadStrategy"), TableExtractSpec()))
        case "TableDefinition" =>
          schemaDef = Some(tableDefinition(s))
        case "Paginate" =>
          offsetPaging |= paginate(s, fns) // validates the idiom
        case "Transform" =>
          // record the args; TRANSLATE after the statement loop — Starlark
          // call order is irrelevant to the final config, so a
          // ResponseType("csv") AFTER the Transform line must still steer
          // the CSV-idiom translation
          transformArgs = argsOf(s, "Transform"); transformSeen = true
        case "ErrorHandling" =>
          retry4xx = errorHandling(s)
        case other =>
          throw new PortParseException(
            s"unsupported .port construct '$other(...)' — supported: Table/Get/AddHeader/" +
            s"BasicAuth/ResponseType/LoadStrategy/TableDefinition/Paginate/Transform/" +
            s"ErrorHandling (statement: $s)")
      }
    }

    api match {
      case Some(src) =>
        // Transform/Paginate may be plain `def`s with the magic name instead
        // of directive calls (api_incremental_load_strategy.port,
        // example_widgets.port) — same translation either way. The directive
        // (recorded above) translates HERE, against the file's FINAL
        // responseType; the magic-name fallback is guarded on directive
        // presence, NOT on empty results: an explicit directive whose
        // translation is legitimately empty (the CSV header idiom) must not
        // be silently overridden by a leftover `def Transform` body.
        if (transformSeen) {
          val (f, tf) = transformDirective(transformArgs, fns, src.responseType)
          itemsField = f; apiTransforms = tf
        } else if (fns.contains("Transform")) {
          val (f, tf) = transformDirective(Nil, fns, src.responseType)
          itemsField = f; apiTransforms = tf
        }
        if (fns.contains("Paginate"))
          offsetPaging |= validatePagination(fns("Paginate").body)
        // offset pagination without the {offset} url token would send the
        // IDENTICAL request every pull — a non-advancing loop the runtime
        // also traps (PaginatedSource), but a config error should fail at
        // conversion, not mid-extract (the reference injects offset params
        // itself via str.format, api.go:196-200 — our token is explicit)
        if (offsetPaging && !src.url.contains("{offset}"))
          throw new PortParseException(
            s"offset pagination but the Get url carries no {offset} token: ${src.url}")
        val full = src.copy(
          itemsField = itemsField.getOrElse(src.itemsField),
          schema = schemaDef,
          retryOn4xx = retry4xx,
          // reference parity: a file with NO offset-idiom Paginate — the
          // `return None` form, or no Paginate at all — loads exactly ONE
          // page (api.go paginates only when configured). An empty
          // offsetField is the engine's no-pagination sentinel; leaving the
          // default "offset" would follow any same-named field the body
          // happens to carry, silently draining every page (or, without a
          // {offset} url token, tripping the non-advancing-pagination trap
          // on a perfectly valid config).
          offsetField = if (offsetPaging) src.offsetField else "")
        // fields the Transform dict mentions but TableDefinition omits never
        // reach the destination in the reference (the typed load takes only
        // the schema's columns — api_basic_auth's created_at is computed and
        // then dropped), and here the page frame reads with that schema, so
        // a transform on an absent column would fail analysis: filter to the
        // declared columns — identical outcome to the reference
        // the SHARED schema-entry splitter (JobRunner.splitSchemaEntries) so
        // parameterized types keep their internal commas — `price:decimal(18,4)`
        // must not yield a junk "4)" column that could shadow a real
        // column's transform filtering
        val schemaCols = schemaDef.map(
          JobRunner.splitSchemaEntries(_).map(_.split(":")(0).trim).toSet)
        val kept = schemaCols.fold(apiTransforms)(cols =>
          apiTransforms.filter(t => cols.contains(t.column)))
        // an api file defines ONE unnamed table — expose it as the wildcard
        // entry so extractFor(<any name>) resolves it (≙ the reference keying
        // api configs by file name, endpoint_configuration.go)
        val t = topStrategy.getOrElse(TableExtractSpec())
        JobSpec(full, destination,
          Map("*" -> t.copy(transforms = t.transforms ++ kept)))
      case None =>
        val src = dbSource.getOrElse(SourceSpec("parquet"))
        JobSpec(src, destination, tables.toMap)
    }
  }

  /** One line of a pad schedule file (config/schedule.port,
    * reference schedule.go:22-76 + testdata/pad/config/schedule.port). */
  case class ScheduleEntry(kind: String, table: String, every: String, to: String)

  /** Parse the pad's schedule file: `ExtractLoadAPI('name', every='1 hour',
    * to='db')`, `ExtractLoadDB('src', 'table', every=..., to=...)`,
    * `Transform('name', source='db', every=...)` → entries the `schedule`
    * verb exports in the reference's cron-consumable JSON shape. */
  def parseSchedules(text: String,
      env: String => Option[String] = sys.env.get): Seq[ScheduleEntry] = {
    val (stmts, _) = logicalStatements(JobSpec.interpolate(text, env))
    stmts.map { s =>
      val call = "^(\\w+)\\s*\\(".r.findFirstMatchIn(s)
        .getOrElse(throw new PortParseException(s"unrecognized schedule statement: $s"))
      val verb = call.group(1)
      val args = argsOf(s, verb)
      val positional = args.filterNot(_.contains("=")).map(unquote)
      val kwargs = args.filter(_.contains("=")).map { kw =>
        val Array(k, v) = kw.split("=", 2); k.trim -> unquote(v)
      }.toMap
      val every = kwargs.getOrElse("every", throw new PortParseException(
        s"schedule statement without every=: $s"))
      if (positional.isEmpty)
        throw new PortParseException(s"schedule statement without a job name: $s")
      verb match {
        case "ExtractLoadAPI" =>
          ScheduleEntry("extract-load-api", positional.head, every, kwargs.getOrElse("to", ""))
        case "ExtractLoadDB" =>
          // (source, table) positionals — the TABLE names the job
          ScheduleEntry("extract-load-db",
            positional.lift(1).getOrElse(positional.head), every, kwargs.getOrElse("to", ""))
        case "Transform" =>
          ScheduleEntry("transform", positional.head, every,
            kwargs.getOrElse("source", kwargs.getOrElse("to", "")))
        case other => throw new PortParseException(
          s"unsupported schedule verb '$other' (ExtractLoadAPI/ExtractLoadDB/Transform): $s")
      }
    }
  }

  // ---------- statement-level parsing ----------

  /** Split text into logical top-level statements and `def` helper functions:
    * strips comments, joins trailing-backslash continuations, and joins lines
    * until parens/braces balance (TableDefinition spans lines). */
  private def logicalStatements(text: String): (Seq[String], Map[String, Fn]) = {
    val defRe = "^def\\s+(\\w+)\\s*\\(([^)]*)\\)\\s*:\\s*$".r
    val raw = text.split("\n", -1).map(stripComment).toList
    val fns = scala.collection.mutable.LinkedHashMap.empty[String, Fn]
    val top = List.newBuilder[String]
    var i = 0
    while (i < raw.length) {
      raw(i).trim match {
        case defRe(name, arg) =>
          val start = i
          i += 1
          val body = List.newBuilder[String]
          while (i < raw.length &&
              (raw(i).trim.isEmpty || raw(i).startsWith(" ") || raw(i).startsWith("\t"))) {
            if (raw(i).trim.nonEmpty) body += raw(i).trim
            i += 1
          }
          fns += name -> Fn(arg.trim, body.result(),
            raw.slice(start, i).mkString("\n").trim)
        case _ =>
          top += raw(i)
          i += 1
      }
    }
    // join continuations (trailing \) then balance parens across lines
    val joined = top.result().foldLeft(List.empty[String]) { (acc, line) =>
      acc match {
        case prev :: rest if prev.endsWith("\\") =>
          (prev.dropRight(1) + " " + line.trim) :: rest
        case prev :: rest if netOpen(prev) > 0 =>
          (prev + " " + line.trim) :: rest
        case _ => line :: acc
      }
    }.reverse.map(_.trim).filter(_.nonEmpty)
    (joined, fns.toMap)
  }

  /** Strip a `# comment` tail (quote-aware). */
  private def stripComment(line: String): String = {
    var inQ: Char = 0
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else if (c == '\'' || c == '"') inQ = c
      else if (c == '#') return line.substring(0, i)
      i += 1
    }
    line
  }

  /** Net open parens/braces/brackets outside string quotes. */
  private def netOpen(s: String): Int = {
    var n = 0; var inQ: Char = 0
    s.foreach { c =>
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else c match {
        case '\'' | '"' => inQ = c
        case '(' | '{' | '[' => n += 1
        case ')' | '}' | ']' => n -= 1
        case _ =>
      }
    }
    n
  }

  /** Arguments of the first `name(...)` call in `s` (balanced, quote-aware).
    * Tolerates whitespace before the paren — the statement dispatcher's
    * `name\s*\(` already admitted it, so rejecting it here would turn a
    * valid Starlark spelling into a misleading 'expected Name(...)' error. */
  private def argsOf(s: String, name: String): Seq[String] = {
    val m = ("\\b" + java.util.regex.Pattern.quote(name) + "\\s*\\(").r
      .findFirstMatchIn(s)
      .getOrElse(throw new PortParseException(s"expected $name(...) in: $s"))
    splitTop(balancedParen(s, m.end - 1))
  }

  /** The substring inside the paren starting at `s(open)` (which must be '('). */
  private def balancedParen(s: String, open: Int): String = {
    require(s.charAt(open) == '(', s"expected '(' at $open in: $s")
    var depth = 0; var inQ: Char = 0; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else c match {
        case '\'' | '"' => inQ = c
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' =>
          depth -= 1
          if (depth == 0) return s.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    throw new PortParseException(s"unbalanced parentheses in: $s")
  }

  /** Split on top-level commas (outside quotes/brackets). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ: Char = 0; var last = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else c match {
        case '\'' | '"' => inQ = c
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(last, i).trim; last = i + 1
        case _ =>
      }
      i += 1
    }
    val tail = s.substring(last).trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && (t.head == '\'' || t.head == '"') && t.last == t.head)
      decodeEscapes(t.substring(1, t.length - 1))
    else throw new PortParseException(s"expected a string literal, got: $s")
  }

  /** Python string-literal escapes → the characters Starlark would see
    * (`"\nivars:"` in a .port file means newline + "ivars:"). */
  private def decodeEscapes(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'; i += 2
          case 't' => b += '\t'; i += 2
          case 'r' => b += '\r'; i += 2
          case '\\' => b += '\\'; i += 2
          case '\'' => b += '\''; i += 2
          case '"' => b += '"'; i += 2
          case other => b += c; b += other; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private def singleString(stmt: String, name: String): String =
    unquote(argsOf(stmt, name).headOption.getOrElse(
      throw new PortParseException(s"$name() needs an argument: $stmt")))

  private def twoStrings(stmt: String, name: String): Seq[String] = {
    val a = argsOf(stmt, name)
    if (a.length != 2) throw new PortParseException(s"$name() needs 2 arguments: $stmt")
    a.map(unquote)
  }

  // ---------- Table chains ----------

  private def tableChain(stmt: String, fns: Map[String, Fn]): (String, TableExtractSpec) = {
    val name = singleString(stmt, "Table")
    var spec = TableExtractSpec()
    // walk the .Method(...) chain after Table(...)
    var pos = stmt.indexOf('(')
    pos = pos + 1 + balancedParen(stmt, pos).length + 1
    val mRe = "\\.\\s*(\\w+)\\s*\\(".r
    var m = mRe.findFirstMatchIn(stmt.substring(pos))
    while (m.isDefined) {
      val method = m.get.group(1)
      val open = pos + m.get.end - 1
      val args = splitTop(balancedParen(stmt, open))
      spec = method match {
        case "LoadStrategy" => loadStrategy(args, spec)
        case "TransformColumn" =>
          val colName = unquote(args(0))
          val fn = resolveFn("TransformColumn", args(1), fns)
          val (ops, implied) = valueFnOps(fn)
          val cast = args.lift(2).map(a => sqlTypeToSpark(unquote(a))).orElse(implied)
          spec.copy(transforms = spec.transforms :+ ColumnSpec(colName, ops, cast))
        case "ComputeColumn" =>
          val colName = unquote(args(0))
          val fn = resolveFn("ComputeColumn", args(1), fns)
          val cast = args.lift(2).map(a => sqlTypeToSpark(unquote(a)))
          spec.copy(computed = spec.computed :+ ComputedSpec(colName, rowFnSql(fn), cast))
        case other => throw new PortParseException(
          s"unsupported Table chain method '.$other(...)' in: $stmt")
      }
      pos = open + 1 + balancedParen(stmt, open).length + 1
      m = mRe.findFirstMatchIn(stmt.substring(pos))
    }
    (name, spec)
  }

  private def loadStrategy(args: Seq[String], base: TableExtractSpec): TableExtractSpec = {
    var spec = base.copy(loadStrategy = args.headOption.map(_.trim).getOrElse("Full") match {
      case s @ ("Full" | "Incremental" | "ModifiedOnly") => s
      case other => throw new PortParseException(s"unknown LoadStrategy: $other")
    })
    args.drop(1).foreach { kw =>
      kw.split("=", 2) match {
        case Array(k, v) => k.trim match {
          case "primary_key" => spec = spec.copy(primaryKey = Seq(unquote(v)))
          case "modified_at_column" => spec = spec.copy(modifiedAtColumn = Some(unquote(v)))
          case "go_back_hours" => spec = spec.copy(goBackHours =
            v.trim.toIntOption.getOrElse(throw new PortParseException(
              s"go_back_hours must be a bare integer (got ${v.trim}): $kw")))
          case other => throw new PortParseException(s"unknown LoadStrategy kwarg: $other")
        }
        case _ => throw new PortParseException(s"malformed LoadStrategy argument: $kw")
      }
    }
    spec
  }

  // ---------- api directives ----------

  private def tableDefinition(stmt: String): String = {
    val inner = balancedParen(stmt, stmt.indexOf('('))
    val dict = inner.trim
    if (!dict.startsWith("{") || !dict.endsWith("}"))
      throw new PortParseException(s"TableDefinition expects a dict literal: $stmt")
    splitTop(dict.substring(1, dict.length - 1)).filter(_.nonEmpty).map { pair =>
      pair.split(":", 2) match {
        case Array(k, v) => s"${unquote(k)}:${sqlTypeToSpark(unquote(v))}"
        case _ => throw new PortParseException(s"malformed TableDefinition entry: $pair")
      }
    }.mkString(",")
  }

  /** Validate the Paginate idiom. Offset pagination is our `{offset}` url
    * token + offsetField plumbing; `return None` means single-page.
    * Returns true when the body is the OFFSET idiom (the caller then
    * requires the Get url to carry the {offset} token). */
  private def paginate(stmt: String, fns: Map[String, Fn]): Boolean = {
    val arg = argsOf(stmt, "Paginate").headOption.getOrElse("").trim
    val body: Seq[String] =
      if (arg.startsWith("lambda")) {
        // lambda previous_response: fn(previous_response) — resolve the fn
        val target = "lambda\\s+\\w+\\s*:\\s*(\\w+)\\s*\\(".r.findFirstMatchIn(arg)
          .map(_.group(1))
        target.flatMap(fns.get).map(_.body).getOrElse(
          throw new PortParseException(s"unsupported Paginate lambda: $arg"))
      } else if (arg.nonEmpty && arg.matches("\\w+")) {
        // Paginate(by_offset) — a NAMED helper, like Transform(parse_items)
        fns.get(arg).map(_.body).getOrElse(throw new PortParseException(
          s"Paginate references unknown function '$arg'"))
      } else fns.get("Paginate").map(_.body).getOrElse(
        throw new PortParseException(s"unsupported Paginate form: $stmt"))
    validatePagination(body)
  }

  private def validatePagination(body: Seq[String]): Boolean = {
    val text = body.mkString(" ")
    val offsetIdiom = text.contains("'offset'") || text.contains("\"offset\"")
    val nonePaging = body == Seq("return None")
    if (!offsetIdiom && !nonePaging)
      throw new PortParseException(
        "unsupported pagination function (only the offset idiom and 'return None' " +
        s"translate):\n${body.mkString("\n")}")
    offsetIdiom
  }

  /** `Transform(lambda data: data['items'])` / `def Transform(data): return
    * data["widgets"]` → itemsField. The CSV header idiom (`data.pop(0)` …)
    * is the engine's built-in CSV parse — accepted, nothing to configure.
    * The per-item DICT-COMPREHENSION idiom (api_basic_auth / api_header_auth /
    * api_integer_data_type: `return [{'k': f(item['k']), ...} for item in
    * data["items"]]`) translates to itemsField + per-column transforms for
    * the recognized field expressions (identity, `int(...)` cast,
    * `time.fromtimestamp(...)`). Returns (itemsField, column transforms). */
  private def transformDirective(args: Seq[String], fns: Map[String, Fn],
      responseType: String): (Option[String], Seq[ColumnSpec]) = {
    val body: Seq[String] = args.headOption.map(_.trim) match {
      case Some(l) if l.startsWith("lambda") =>
        Seq("return " + l.replaceFirst("lambda\\s+\\w+\\s*:\\s*", ""))
      // Transform(parse_items) — a NAMED helper: resolve the referenced def,
      // not the magic-name fallback (which could silently pick a different
      // leftover `def Transform` body)
      case Some(name) if name.matches("\\w+") =>
        fns.get(name).map(_.body).getOrElse(throw new PortParseException(
          s"Transform references unknown function '$name'"))
      case Some(other) => throw new PortParseException(
        s"unsupported Transform argument (lambda or function name): $other")
      case None => fns.get("Transform").map(_.body).getOrElse(
        throw new PortParseException("Transform(...) without a recognizable body"))
    }
    val one = body.mkString(" ").trim
    val itemRe = "^return\\s+\\w+\\[\\s*['\"](\\w+)['\"]\\s*\\]$".r
    val compRe = ("^return\\s*\\[\\s*\\{(.*)\\}\\s*for\\s+(\\w+)\\s+in\\s+" +
      "\\w+\\[\\s*['\"](\\w+)['\"]\\s*\\]\\s*\\]$").r
    // the CSV HEADER-ZIP idiom, precisely: a dict comprehension whose KEY is
    // header-derived (`headers[i]` after a pop(0), or `data[0][i]`) and
    // whose value is the same-index row element — exactly the engine's
    // built-in CSV parse, nothing to configure. A looser test (any body
    // mentioning `[0]`/`pop(0)`) would silently swallow a transform that
    // RENAMES columns via literal dict keys — at load time the renamed
    // fields would type as all-NULL (silent data loss) where this module's
    // contract is a loud PortParseException.
    val csvHeaderZip = ("\\{\\s*[A-Za-z_]\\w*(\\[0\\])?\\[(\\w+)\\]\\s*:" +
      "\\s*\\w+\\[\\2\\]").r
    // ... and the zip spelling of the same idiom: `headers = data.pop(0);
    // return [dict(zip(headers, row)) for row in data]` — the dict's keys
    // are the popped header row verbatim (no renaming possible), so it is
    // the built-in CSV parse exactly like the comprehension form
    val csvHeaderPop = "[A-Za-z_]\\w*\\s*=\\s*\\w+\\.pop\\(\\s*0\\s*\\)".r
    val csvZip = "dict\\(\\s*zip\\(\\s*\\w+\\s*,\\s*\\w+\\s*\\)\\s*\\)".r
    one match {
      case itemRe(field) => (Some(field), Nil)
      case _ if responseType == "csv" && csvHeaderZip.findFirstIn(one).isDefined =>
        (None, Nil)
      case _ if responseType == "csv" && csvHeaderPop.findFirstIn(one).isDefined &&
          csvZip.findFirstIn(one).isDefined =>
        (None, Nil)
      case compRe(dict, item, field) =>
        val specs = splitTop(dict).filter(_.trim.nonEmpty).flatMap { pair =>
          pair.split(":", 2) match {
            case Array(k0, e0) =>
              val k = unquote(k0)
              val e = e0.trim
              val ident = Set(s"$item['$k']", s"""$item["$k"]""")
              val intRe = ("^int\\(\\s*" + java.util.regex.Pattern.quote(item) +
                "\\[['\"]" + java.util.regex.Pattern.quote(k) + "['\"]\\]\\s*\\)$").r
              val ftRe = ("^time\\.fromtimestamp\\(\\s*(?:int\\(\\s*)?" +
                java.util.regex.Pattern.quote(item) + "\\[['\"]" +
                java.util.regex.Pattern.quote(k) + "['\"]\\]\\s*\\)?\\s*\\)$").r
              if (ident.contains(e)) None // straight field copy
              else if (intRe.findFirstIn(e).isDefined)
                Some(ColumnSpec(k, Nil, Some("integer")))
              else if (ftRe.findFirstIn(e).isDefined)
                Some(ColumnSpec(k,
                  Seq(s"sql:timestamp_seconds(cast(`$k` as bigint))"), None))
              else throw new PortParseException(
                s"unsupported item expression for '$k': $e (translate this " +
                "field to a JSON-spec transforms entry)")
            case _ => throw new PortParseException(s"malformed dict entry: $pair")
          }
        }
        (Some(field), specs)
      case b => throw new PortParseException(
        "unsupported Transform body (item extraction, the CSV header idiom and " +
        s"the per-item dict comprehension translate — port this lambda to a " +
        s"JSON-spec transforms/computed entry):\n$b")
    }
  }

  /** ErrorHandling dict → retryOn4xx. Network/5xx-retry and invalid-body-fail
    * are the engine's FIXED behavior (≙ reference workflow.go exit codes);
    * only the 4xx policy is configurable — so a policy that CONTRADICTS the
    * fixed behavior (`Http5XXError: Fail`, `InvalidBodyError: Retry`) fails
    * loudly instead of silently diverging from what the reference's
    * handleAPIError (api.go) would do with that map. KEYS may be quoted
    * (they are starlark.String either way, endpoint_configuration.go:251);
    * POLICIES must be the bare predeclared constants — the reference coerces
    * the value through strconv.Atoi (endpoint_configuration.go:247), so a
    * quoted 'Retry' is a config error there and must be one here too. An
    * unknown bare name would be a Starlark NameError in the reference, not a
    * silent default. */
  private def errorHandling(stmt: String): Boolean = {
    val inner = balancedParen(stmt, stmt.indexOf('(')).trim
    if (!inner.startsWith("{") || !inner.endsWith("}"))
      throw new PortParseException(s"ErrorHandling expects a dict literal: $stmt")
    val dict = inner.stripPrefix("{").stripSuffix("}")
    def quoted(s: String): Boolean = {
      val t = s.trim
      t.length >= 2 && (t.head == '\'' || t.head == '"') && t.last == t.head
    }
    def word(s: String): String = {
      val t = s.trim
      if (quoted(t)) t.substring(1, t.length - 1) else t
    }
    // the engine's non-configurable policies per class (None = configurable)
    val fixedPolicy = Map(
      "NetworkError" -> "Retry", "Http5XXError" -> "Retry",
      "InvalidBodyError" -> "Fail")
    var retry4xx = false
    splitTop(dict).filter(_.trim.nonEmpty).foreach { pair =>
      pair.split(":", 2) match {
        case Array(k0, p0) =>
          val k = word(k0)
          if (quoted(p0)) throw new PortParseException(
            s"quoted ErrorHandling policy ${p0.trim} — the reference only accepts the " +
            s"predeclared Retry/Fail constants (a quoted string fails its Atoi coercion): $stmt")
          val p = p0.trim
          if (k != "Http4XXError" && !fixedPolicy.contains(k)) throw new PortParseException(
            s"unknown ErrorHandling class '$k' (NetworkError/Http4XXError/" +
            s"Http5XXError/InvalidBodyError): $stmt")
          if (p != "Retry" && p != "Fail") throw new PortParseException(
            s"unknown ErrorHandling policy '$p' for '$k' (Retry/Fail): $stmt")
          if (k == "Http4XXError") retry4xx = p == "Retry"
          else if (fixedPolicy(k) != p) throw new PortParseException(
            s"ErrorHandling policy '$k: $p' contradicts the engine's fixed behavior " +
            s"('$k: ${fixedPolicy(k)}') — only the Http4XXError policy is configurable: $stmt")
        case _ => throw new PortParseException(s"malformed ErrorHandling entry: $pair")
      }
    }
    retry4xx
  }

  // ---------- helper-function translation ----------

  /** A chain argument is either a named helper `def` or an INLINE lambda
    * (`lambda row: row['updated_at'].strftime('%F')` —
    * transform_column_mysql.port); both resolve to the same Fn shape, so the
    * idiom translators apply uniformly. */
  private def resolveFn(where: String, arg: String, fns: Map[String, Fn]): Fn = {
    val a = arg.trim
    val lambdaRe = "^lambda\\s+(\\w+)\\s*:\\s*(.+)$".r
    a match {
      case lambdaRe(param, bodyExpr) => Fn(param, Seq(s"return ${bodyExpr.trim}"), a)
      case name => fns.getOrElse(name, throw new PortParseException(
        s"$where references unknown function '$name'"))
    }
  }

  /** A one-line string-literal expression statement (a docstring): no runtime
    * effect, safe to skip when counting a helper body's statements. */
  private def isDocstring(l: String): Boolean = {
    val t = l.trim
    (t.startsWith("\"\"\"") && t.endsWith("\"\"\"") && t.length >= 6) ||
    (t.startsWith("'''") && t.endsWith("'''") && t.length >= 6) ||
    (t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head)
  }

  /** TransformColumn functions take the scalar VALUE: translate the body to
    * the scalar-op vocabulary. Returns (ops, implied cast). */
  private def valueFnOps(fn: Fn): (Seq[String], Option[String]) = {
    // exactly ONE `return <expr>` statement translates (docstrings aside): a
    // body with preceding assignments/conditionals would be silently
    // truncated by picking just the return line — fail loudly instead (the
    // module's contract)
    val ret = fn.body.filterNot(isDocstring) match {
      case Seq(l) if l.startsWith("return ") => l.stripPrefix("return ").trim
      case Seq(_) | Seq() =>
        throw new PortParseException(s"no return in transform function:\n${fn.src}")
      case _ => throw new PortParseException(
        s"unsupported multi-statement TransformColumn function (only a single " +
        s"`return <expr>` translates — port it to a JSON-spec transforms entry):\n${fn.src}")
    }
    val v = java.util.regex.Pattern.quote(fn.arg)
    val mul = s"^$v\\s*\\*\\s*([0-9.]+)$$".r
    val mulInt = s"^int\\(\\s*$v\\s*\\*\\s*([0-9.]+)\\s*\\)$$".r
    ret match {
      case mul(n) => (Seq(s"multiply:$n"), None)
      case mulInt(n) => (Seq(s"multiply:$n"), Some("integer"))
      case s if s == s"${fn.arg}.upper()" => (Seq("upper"), None)
      case s if s == s"${fn.arg}.lower()" => (Seq("lower"), None)
      case s if s == s"${fn.arg}.strip()" => (Seq("trim"), None)
      case other => throw new PortParseException(
        s"unsupported TransformColumn lambda (translate it to a JSON-spec transforms " +
        s"entry, e.g. ops=[\"sql:<catalyst expr>\"]):\n${fn.src}\n(return: $other)")
    }
  }

  /** ComputeColumn functions take the ROW: symbolically evaluate the
    * recognized idioms into one Catalyst SQL expression. */
  private def rowFnSql(fn: Fn): String = {
    // value = SQL text; json = "get_json_object operates on it" marker
    case class V(sql: String, json: Boolean)
    var vars = Map.empty[String, V]
    def evalExpr(e0: String): V = {
      val e = e0.trim
      val rowCol = s"^${java.util.regex.Pattern.quote(fn.arg)}\\[\\s*['\"]([^'\"]+)['\"]\\s*\\]".r
      val strftime = "^(.*)\\.strftime\\(\\s*['\"]([^'\"]+)['\"]\\s*\\)$".r
      val split0 = "^(.*)\\.split\\(\\s*(['\"])(.*?)\\2\\s*,\\s*1\\s*\\)\\[0\\]$".r
      val jsonLoads = "^json\\.loads\\((.*)\\)$".r
      val yamlLoads = "^yaml\\.loads\\((.*)\\)$".r
      val dig = "^dig\\((.*)\\)$".r
      // trailing ['key'] subscript on ANY base expression (greedy base):
      // covers both d['k'] on an intermediate variable and the inline
      // json.loads(row['c'])['k'] spelling; chains peel right-to-left into
      // one JSON path ('a','b' → $.a.b)
      val exprSub = "^(.+)\\[\\s*['\"]([^'\"]+)['\"]\\s*\\]$".r
      e match {
        case strftime(base, fmt) =>
          // the translated pattern may contain Java-pattern quote chars
          // ('yyyy'' year''…') — escape them for the SQL string literal
          V(s"date_format(${evalExpr(base).sql}, '${escapeSql(strftimeToSpark(fmt))}')",
            json = false)
        case split0(base, _, sep) =>
          // sep comes from raw source text: decode python escapes first so
          // "\nivars:" means newline+ivars:, then re-encode for the SQL literal
          V(s"substring_index(${evalExpr(base).sql}, '${escapeSql(decodeEscapes(sep))}', 1)",
            json = false)
        case jsonLoads(inner) => V(evalExpr(inner).sql, json = true)
        case yamlLoads(inner) => V(s"yaml_to_json(${evalExpr(inner).sql})", json = true)
        case dig(args) =>
          val parts = splitTop(args)
          val doc = evalExpr(parts.head)
          if (!doc.json) throw new PortParseException(
            s"dig() over a non-document value in:\n${fn.src}")
          val atoms = parts.tail.map(unquote)
          atoms.foreach(jsonPathAtom(_, fn.src))
          V(s"get_json_object(${doc.sql}, '$$.${atoms.mkString(".")}')", json = false)
        case _ if rowCol.findFirstMatchIn(e).exists(_.matched == e) =>
          V(s"`${rowCol.findFirstMatchIn(e).get.group(1)}`", json = false)
        case name if vars.contains(name.trim) => vars(name.trim)
        case exprSub(_, _) =>
          // peel every trailing subscript into one path, then the base must
          // evaluate to a document (a var holding json.loads / the inline call)
          @annotation.tailrec
          def peel(s: String, keys: List[String]): (String, List[String]) = s match {
            case exprSub(b, k) => peel(b.trim, k :: keys)
            case _ => (s, keys)
          }
          val (base, keys) = peel(e, Nil)
          keys.foreach(jsonPathAtom(_, fn.src))
          val doc = evalExpr(base)
          if (!doc.json) throw new PortParseException(
            s"subscript on a non-document expression '$base' in:\n${fn.src}")
          V(s"get_json_object(${doc.sql}, '$$.${keys.mkString(".")}')", json = false)
        case other => throw new PortParseException(
          s"unsupported ComputeColumn expression '$other' (translate the lambda to a " +
          s"JSON-spec computed entry):\n${fn.src}")
      }
    }
    val assign = "^(\\w+)\\s*=\\s*(.+)$".r
    fn.body.filterNot(isDocstring).foreach {
      case l if l.startsWith("return ") =>
        return evalExpr(l.stripPrefix("return ")).sql
      case assign(name, rhs) => vars += name -> evalExpr(rhs)
      case other => throw new PortParseException(
        s"unsupported statement in ComputeColumn function: '$other'\n${fn.src}")
    }
    throw new PortParseException(s"no return in ComputeColumn function:\n${fn.src}")
  }

  /** A key interpolated into a get_json_object path must be a plain JSON
    * path atom: a '.', '$', '*' or bracket inside it would silently NAVIGATE
    * the document instead of looking up the literal key (Python subscript
    * semantics) — reject it loudly. */
  private def jsonPathAtom(key: String, src: String): Unit =
    if (!key.matches("[A-Za-z0-9_\\-]+")) throw new PortParseException(
      s"JSON key '$key' contains path metacharacters (only [A-Za-z0-9_-] keys " +
      s"translate to a get_json_object path — port this lambda by hand):\n$src")

  private def escapeSql(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")

  /** The strftime directives the corpus uses (+ the common ones), translated
    * by TOKENIZING the format: an unknown `%x` directive fails loudly (the
    * module's contract) instead of leaking a literal `%x` into a Java
    * datetime pattern, and literal text containing letters is single-quoted
    * — bare letters are LIVE pattern characters there ('%Y year' would
    * otherwise render era/day-of-week instead of the word "year"). Pure
    * punctuation passes through unquoted, so '%Y-%m-%d' still emits the
    * familiar 'yyyy-MM-dd'. */
  private val strftimeMap = Map(
    'F' -> "yyyy-MM-dd", 'Y' -> "yyyy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'M' -> "mm", 'S' -> "ss", '%' -> "%")
  private def strftimeToSpark(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      val s = lit.result(); lit.clear()
      if (s.exists(c => c.isLetter || c == '\'')) out ++= s"'${s.replace("'", "''")}'"
      else out ++= s
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%') {
        if (i + 1 >= fmt.length) throw new PortParseException(
          s"strftime format ends with a bare '%': $fmt")
        val d = fmt.charAt(i + 1)
        val m = strftimeMap.getOrElse(d, throw new PortParseException(
          s"unsupported strftime directive %$d in '$fmt' — port this lambda by hand"))
        flush(); out ++= m; i += 2
      } else { lit += fmt.charAt(i); i += 1 }
    }
    flush()
    out.result()
  }

  /** Reference SQL column types (ParseDatabaseTypeFromString) → Spark DDL. */
  private[config] def sqlTypeToSpark(t: String): String = {
    val up = t.trim.toUpperCase
    val dec = "^(?:DECIMAL|NUMERIC)\\s*\\((\\d+)\\s*,\\s*(\\d+)\\)$".r
    up match {
      // emit the engine's OWN type vocabulary (SchemaTools.parseType):
      // "int"/"smallint" are Spark DDL names the runtime would reject loudly
      case "INT" | "INTEGER" | "SMALLINT" => "integer"
      case "BIGINT" => "bigint"
      case "FLOAT" | "REAL" => "float"
      case "DOUBLE" | "DOUBLE PRECISION" => "double"
      case dec(p, s) => s"decimal($p,$s)"
      case "BOOLEAN" | "BOOL" => "boolean"
      case "DATE" => "date"
      case "TIMESTAMP" | "DATETIME" => "timestamp"
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") ||
        s == "TEXT" || s == "STRING" => "string"
      case other => throw new PortParseException(s"unknown column type: $other")
    }
  }
}
