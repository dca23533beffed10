package graft.sources

import java.util.Base64

/** HTTP endpoint *configuration surface* of the reference's API extractor —
  * `Get(url)`, `AddHeader`, `BasicAuth`, `ResponseType`, `Paginate`,
  * `ErrorHandling` (/root/reference/endpoint_configuration.go:54-140) and
  * the request assembly of requestAllPages/getResponse (api.go:176-260):
  * `{token}` URL substitution, custom headers over a default User-Agent,
  * basic auth, status-code → error-class mapping.
  *
  * The TRANSPORT is pluggable (`HttpRequest => HttpResponse`): in this
  * offline sandbox tests drive an in-process fake exactly like the
  * reference's own httptest server (api_test.go:204-250); in production the
  * same config drives any HTTP client. Everything above the socket — auth
  * header construction, token substitution, pagination protocol, retry
  * classification — is real and tested.
  */
case class HttpRequest(method: String, url: String, headers: Map[String, String])
case class HttpResponse(status: Int, body: String)

case class EndpointConfig(
    url: String, // may contain {offset}-style pagination tokens (api.go:196-200)
    method: String = "GET", // ≙ Get(...) sets GET (endpoint_configuration.go:103)
    headers: Map[String, String] = Map.empty, // ≙ AddHeader
    basicAuth: Option[(String, String)] = None, // ≙ BasicAuth(user, pass)
    responseType: String = "json", // ≙ ResponseType("json"|"csv")
    itemsField: String = "items", // ≙ Transform(data -> data['items'])
    offsetField: String = "offset", // ≙ the Paginate offset-dict convention
    retryOn4xx: Boolean = false) // ≙ ErrorHandling({Http4XXError: Fail})

object Endpoint {

  /** Build one page's request: substitute pagination tokens into the URL
    * (api.go:196-200), default User-Agent, custom headers, basic auth as an
    * Authorization header (api.go:249-260). */
  def buildRequest(cfg: EndpointConfig, pagination: Map[String, String]): HttpRequest = {
    val url = pagination.foldLeft(cfg.url) { case (u, (k, v)) =>
      u.replace(s"{$k}", v)
    }
    val auth = cfg.basicAuth.map { case (u, p) =>
      "Authorization" -> ("Basic " + Base64.getEncoder.encodeToString(
        s"$u:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    HttpRequest(cfg.method.toUpperCase,
      url, Map("User-Agent" -> "graft") ++ cfg.headers ++ auth)
  }

  /** Status-code classification ≙ api.go:209-217 + the fixtures'
    * ErrorHandling map: 5xx retryable, 4xx fatal (unless configured Retry). */
  def classify(cfg: EndpointConfig, status: Int): Option[FetchError] =
    if (status >= 500) Some(FetchError.Http5xx(status))
    else if (status >= 400) Some(FetchError.Http4xx(status, retryable = cfg.retryOn4xx))
    else None

  /** Parse one page body per the endpoint's `responseType` — json | csv,
    * exactly the reference's `unmarshalBody` dispatch (api.go:461-477). */
  def parsePage(cfg: EndpointConfig, body: String): Either[FetchError, Page] =
    cfg.responseType match {
      case "csv" => parseCsvPage(body)
      case "json" => parseJsonPage(cfg, body)
      case other => Left(FetchError.InvalidBody(
        s"unsupported response type '$other'. Allowed values: json, csv"))
    }

  /** Parse a JSON page body: records = compact JSON strings of the elements
    * under `itemsField` (or of a bare top-level array); next offset = the
    * `offsetField` value when present and non-null (the
    * api_offset_pagination.port protocol — null/absent offset stops; an
    * EMPTY `offsetField` is the explicit no-pagination sentinel: no body
    * field is ever named "", so the lookup stops after page one — the
    * .port converter sets it for files without the offset Paginate idiom). */
  private def parseJsonPage(cfg: EndpointConfig, body: String): Either[FetchError, Page] = {
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(body)
      val items =
        if (root.isArray) root
        else root.path(cfg.itemsField)
      if (!items.isArray)
        return Left(FetchError.InvalidBody(s"no array at '${cfg.itemsField}'"))
      val recs = (0 until items.size).map(i => mapper.writeValueAsString(items.get(i)))
      // null/absent offset stops; a string-encoded number ("100") is the
      // same quoted-scalar shape the data path supports and must paginate;
      // any OTHER non-null shape is a protocol the offset plumbing cannot
      // drive — fail loudly instead of silently truncating after this page
      Option(root.get(cfg.offsetField)).filter(!_.isNull) match {
        case None => Right(Page(recs, None))
        // canConvertToLong alone is only a RANGE check (100.7 would floor to
        // 100 — a silently wrong resume point); also require the value to be
        // integral (100.0 stays accepted: servers emit whole doubles)
        case Some(n) if n.canConvertToLong &&
            (n.isIntegralNumber || n.doubleValue == n.asLong) =>
          Right(Page(recs, Some(n.asLong)))
        case Some(n) if n.isTextual && n.asText.matches("-?\\d{1,18}") =>
          Right(Page(recs, Some(n.asText.toLong)))
        case Some(n) => Left(FetchError.InvalidBody(
          s"non-numeric '${cfg.offsetField}' value ${n.toString} — offset pagination " +
          "needs an integer (or null to stop)"))
      }
    } catch {
      case e: Exception => Left(FetchError.InvalidBody(e.getMessage))
    }
  }

  /** Parse a CSV page body (≙ api.go:461-477 `csv.ReadAll` → `table`): the
    * first row is the header, the rest are rows — the api_csv.port fixture's
    * Transform pops row 0 and zips (`{headers[i]: row[i] ...}`), which is
    * exactly what this does, emitting one JSON record per row with ALL
    * values as strings (the reference's `type table [][]string`); typing
    * happens against the destination schema in [[pageFrame]]. CSV responses
    * have no pagination token — the fixture corpus never paginates CSV. */
  private def parseCsvPage(body: String): Either[FetchError, Page] = {
    try {
      val rows = parseCsv(body)
      if (rows.isEmpty) return Right(Page(Nil, None))
      val headers = rows.head
      // field-count mismatch is a malformed body, exactly Go encoding/csv's
      // ErrFieldCount (the reference's csv.ReadAll errors, api.go:461-477) —
      // padding/truncating would load silently-wrong data
      rows.tail.zipWithIndex.find(_._1.length != headers.length).foreach {
        case (r, i) => return Left(FetchError.InvalidBody(
          s"record on line ${i + 2}: wrong number of fields (${r.length}, header has ${headers.length})"))
      }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val recs = rows.tail.map { r =>
        val o = mapper.createObjectNode()
        headers.zipWithIndex.foreach { case (h, i) => o.put(h, r(i)) }
        mapper.writeValueAsString(o)
      }
      Right(Page(recs, None))
    } catch {
      case e: Exception => Left(FetchError.InvalidBody(e.getMessage))
    }
  }

  /** Minimal RFC-4180 CSV reader for page bodies (quoted fields, `""`
    * escapes, CRLF/LF rows) — driver-side page parsing only; bulk CSV files
    * go through Spark's reader ([[CsvSource]]). */
  private[sources] def parseCsv(text: String): List[Seq[String]] = {
    val rows = scala.collection.mutable.ListBuffer[Seq[String]]()
    val field = new StringBuilder
    var row = Vector.empty[String]
    var inQ = false
    // drop only truly BLANK lines (zero characters — the trailing-newline
    // artifact). Distinguishing them needs a flag DURING the scan: a
    // single-column row whose value is the quoted empty string (`""`) also
    // parses to Vector("") but is a real record (all-NULL under
    // EMPTYASNULL) — an output-side emptiness filter would eat it.
    var rowHadContent = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQ = false
        } else field += c
      } else c match {
        case '"' => inQ = true; rowHadContent = true
        case ',' => row :+= field.result(); field.clear(); rowHadContent = true
        case '\r' =>
          // \r\n is a line ending (handled at the \n); a BARE \r mid-field
          // is DATA — Go's encoding/csv (api.go:461-477, the behavior this
          // mirrors) keeps it, and dropping it would silently alter field
          // bytes ("ab\rcd" → "abcd")
          if (!(i + 1 < text.length && text.charAt(i + 1) == '\n')) {
            field += c; rowHadContent = true
          }
        case '\n' =>
          if (rowHadContent) { row :+= field.result(); rows += row }
          field.clear(); row = Vector.empty; rowHadContent = false
        case other => field += other; rowHadContent = true
      }
      i += 1
    }
    if (rowHadContent) { row :+= field.result(); rows += row }
    rows.toList
  }

  /** Build a typed DataFrame from one page's records. BOTH body types read
    * every field as raw TEXT first and type it with an explicit cast — the
    * reference's model exactly (Starlark hands the load row-dicts of
    * marshalled values; the typed load casts them, api.go:287-369 +
    * load.go) — so a JSON page carrying `{"id": "123"}` (string-encoded
    * number, the api_integer_data_type.port shape) loads as 123, where a
    * schema-first JSON parse silently nulled it (Spark's Jackson path does
    * not coerce quoted scalars). Differences by body type:
    *  - CSV: empty string = NULL (EMPTYASNULL, load_redshift.go:36);
    *  - JSON: only a JSON null is NULL — an empty string in a numeric field
    *    is malformed and errors loudly (reference strconv behavior).
    * Any non-null value that fails its cast errors loudly either way. */
  def pageFrame(spark: org.apache.spark.sql.SparkSession, cfg: EndpointConfig,
      schema: org.apache.spark.sql.types.StructType,
      recs: Seq[String]): org.apache.spark.sql.DataFrame =
    typedFrame(spark, schema, recs, emptyIsNull = cfg.responseType == "csv")

  /** [[pageFrame]] without an [[EndpointConfig]]: the text-first read +
    * loud-cast discipline for ANY JSON record batch (PaginatedSource.drain
    * routes through this so string-encoded scalars load typed there too,
    * instead of silently nulling under a schema-first JSON parse). */
  def typedFrame(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      recs: Seq[String], emptyIsNull: Boolean): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val strSchema = org.apache.spark.sql.types.StructType(
      schema.fields.map(_.copy(dataType = org.apache.spark.sql.types.StringType)))
    spark.read.schema(strSchema).json(recs.toDS())
      .select(schema.fields.toIndexedSeq.map(f =>
        loudCast(f.name, f.dataType, emptyIsNull)): _*)
  }

  /** The loud-cast column THE one definition ([[typedFrame]] per field, and
    * JobRunner's post-transform conform step): NULL stays NULL (empty string
    * too under `emptyIsNull` — the Redshift EMPTYASNULL rule), a convertible
    * value casts, anything else raises naming the column and value instead
    * of silently nulling. */
  def loudCast(name: String,
      dt: org.apache.spark.sql.types.DataType,
      emptyIsNull: Boolean): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, col, concat, lit, raise_error, when}
    val src = col(name)
    val isNull = if (emptyIsNull) src.isNull || src === "" else src.isNull
    when(isNull, lit(null).cast(dt))
      .otherwise(coalesce(src.cast(dt), raise_error(concat(
        lit(s"invalid value for $name ${dt.simpleString}: '"),
        src.cast(org.apache.spark.sql.types.StringType), lit("'"))).cast(dt)))
      .as(name)
  }

  /** Production transport over the JDK's `java.net.http.HttpClient` — the
    * socket layer beneath the config surface (≙ the reference's http.Client
    * call, api.go:245-260). Everything above it (auth headers, token
    * substitution, status classification, pagination) is transport-agnostic;
    * tests drive an in-process fake through the same seam. */
  lazy val httpTransport: HttpRequest => HttpResponse = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    req => {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.url))
        .timeout(java.time.Duration.ofSeconds(120))
        .method(req.method, java.net.http.HttpRequest.BodyPublishers.noBody())
      req.headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResponse(resp.statusCode(), resp.body())
    }
  }

  /** A [[PaginatedSource]] over this endpoint + transport: each pull builds
    * the `{offset}`-substituted request, classifies the status, parses the
    * page. Network exceptions from the transport are retryable
    * (≙ NetworkError → Retry). */
  def source(cfg: EndpointConfig, transport: HttpRequest => HttpResponse,
      maxRetries: Int = 3, pagesPerBatch: Int = 100): PaginatedSource =
    new PaginatedSource(
      offset => {
        val req = buildRequest(cfg, Map(cfg.offsetField -> offset.toString))
        scala.util.Try(transport(req)) match {
          case scala.util.Failure(e) => Left(FetchError.Network(e.getMessage))
          case scala.util.Success(resp) =>
            classify(cfg, resp.status) match {
              case Some(err) => Left(err)
              case None => parsePage(cfg, resp.body)
            }
        }
      },
      maxRetries, pagesPerBatch)
}
