package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** S1 live transport: sequential paged HTTP GETs with a request timeout,
  * non-2xx rejection, and non-array payload rejection — the behavior of
  * the reference's REST extractor (`extract_crypto_data.py:79-107`: 15 s
  * timeout per GET, `raise_for_status`, "Unexpected payload type" on a
  * non-list body). Produces the `Int => Seq[Map[String, Any]]` shape
  * [[Ingest.fetchPaged]] consumes, so the page loop / stop-on-empty logic
  * is shared between live HTTP and injected fixtures.
  *
  * Driver-side by design, like the reference: a paged REST head table is
  * small (pages × perPage rows); the rows are parallelized to executors
  * by `createDataFrame` downstream. Jackson (a Spark-provided dependency)
  * does the JSON parsing.
  */
object HttpTransport {

  val DefaultTimeout: Duration = Duration.ofSeconds(15)

  /** A page-fetching function over a base URL: `page => rows`.
    *
    * @param baseUrl   endpoint, with or without an existing query string
    * @param params    fixed query params sent on every page request
    * @param pageParam name of the page-number query param
    * @param timeout   connect + response timeout per request
    */
  def paged(baseUrl: String,
            params: Map[String, String] = Map.empty,
            pageParam: String = "page",
            timeout: Duration = DefaultTimeout): Int => Seq[Map[String, Any]] = {
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    page => {
      val query = (params.toSeq.sortBy(_._1) :+ (pageParam -> page.toString))
        .map { case (k, v) => k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }
        .mkString("&")
      val sep = if (baseUrl.contains("?")) "&" else "?"
      val req = HttpRequest.newBuilder(URI.create(baseUrl + sep + query))
        .timeout(timeout).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"HTTP ${resp.statusCode()} from $baseUrl (page $page)")
      parseArray(resp.body())
    }
  }

  /** Parse a JSON array-of-objects payload; reject anything else (the
    * reference's "Unexpected payload type" guard).
    */
  private[ops] def parseArray(body: String): Seq[Map[String, Any]] = {
    val node = new ObjectMapper().readTree(body)
    require(node != null && node.isArray,
      s"expected a JSON array payload, got: ${body.take(80)}")
    node.elements().asScala.map { el =>
      require(el.isObject,
        s"expected a JSON array of objects, got element: ${el.toString.take(80)}")
      el.fields().asScala.map(e => e.getKey -> scalarOf(e.getValue)).toMap
    }.toSeq
  }

  private def scalarOf(v: JsonNode): Any =
    if (v.isNull) null
    else if (v.isTextual) v.asText()
    else if (v.isIntegralNumber && v.canConvertToLong) java.lang.Long.valueOf(v.asLong())
    else if (v.isNumber) java.lang.Double.valueOf(v.asDouble())
    else if (v.isBoolean) java.lang.Boolean.valueOf(v.asBoolean())
    else v.toString // nested object/array: stringified, coerced downstream
}
