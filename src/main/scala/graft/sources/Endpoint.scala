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
    else if (status >= 400 && cfg.retryOn4xx) Some(FetchError.Http5xx(status))
    else if (status >= 400) Some(FetchError.Http4xx(status))
    else None

  /** Parse a JSON page body: records = compact JSON strings of the elements
    * under `itemsField` (or of a bare top-level array); next offset = the
    * `offsetField` value when present and non-null (the
    * api_offset_pagination.port protocol — null/absent offset stops). */
  def parsePage(cfg: EndpointConfig, body: String): Either[FetchError, Page] = {
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(body)
      val items =
        if (root.isArray) root
        else root.path(cfg.itemsField)
      if (!items.isArray)
        return Left(FetchError.InvalidBody(s"no array at '${cfg.itemsField}'"))
      val recs = (0 until items.size).map(i => mapper.writeValueAsString(items.get(i)))
      val next = Option(root.get(cfg.offsetField))
        .filter(n => !n.isNull && n.canConvertToLong)
        .map(_.asLong)
      Right(Page(recs, next))
    } catch {
      case e: Exception => Left(FetchError.InvalidBody(e.getMessage))
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
