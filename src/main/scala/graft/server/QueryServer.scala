package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.query.{GraphQl, PropertyGraph}

/** HTTP/JSON query endpoint — the reference's serving surface
  * (`ArcadeDBService.java:58` `server.start()`, port config `:87`;
  * SURVEY §3.2 `POST /api/v1/query/{db}` with body
  * `{"language": …, "command": …}`). Spark-native form: the command is
  * compiled to a DataFrame (`spark.sql` for SQL over the served views,
  * [[GraphQl.compile]] for GraphQL — the reference's two query
  * languages) and streamed back as JSON rows.
  *
  * The server is a thin driver-side shell: ALL query execution stays
  * distributed (the only driver materialization is the response page,
  * bounded by `limit` — default 1000, like the reference's serverside
  * result cap). Uses the JDK's built-in HttpServer: no new dependency,
  * and the endpoint is driver-singleton anyway (result paging, not
  * dataplane, exactly like the reference's embedded HTTP server).
  *
  * Response shape mirrors the reference: `{"result": [ {row}, … ]}` on
  * 200, `{"error": msg}` on 4xx/5xx.
  */
object QueryServer {

  val DefaultLimit = 1000
  val MaxLimit = 100000

  final case class Started(server: HttpServer, port: Int) {
    def stop(): Unit = server.stop(0)
  }

  /** A19 port validation: the reference validates its port argument the
    * same way before binding. */
  def validatePort(port: Int): Int = {
    require(port >= 0 && port <= 65535, s"port out of range: $port")
    port
  }

  /** Start serving. `port` 0 binds an ephemeral port (tests);
    * `graph` enables `language: "graphql"`. */
  def start(spark: SparkSession, port: Int,
      graph: Option[PropertyGraph] = None): Started = {
    val server = HttpServer.create(new InetSocketAddress(validatePort(port)), 0)

    server.createContext("/api/v1/ready", (ex: HttpExchange) => {
      ex.sendResponseHeaders(204, -1); ex.close()
    })

    server.createContext("/api/v1/query/", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") respond(ex, 405, err("use POST"))
        else {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val j = JsonMethods.parse(body)
          val language = j \ "language" match {
            case JString(l) => l.toLowerCase
            case JNothing => "sql"
            case other => throw new IllegalArgumentException(s"bad language: $other")
          }
          val command = j \ "command" match {
            case JString(c) => c
            case _ => throw new IllegalArgumentException("missing 'command'")
          }
          val limit = j \ "limit" match {
            case JInt(n) => math.min(n.toInt, MaxLimit)
            case JNothing => DefaultLimit
            case other => throw new IllegalArgumentException(s"bad limit: $other")
          }
          val df: DataFrame = language match {
            case "sql" => spark.sql(command)
            case "graphql" => GraphQl.compile(graph.getOrElse(
              throw new IllegalStateException("no graph served — start with a store")), command)
            case l => throw new IllegalArgumentException(s"unsupported language: $l")
          }
          // toJSON keeps row serialization distributed (executor-side
          // Jackson codegen); only the bounded page is collected
          val rows = df.limit(limit).toJSON.collect()
          respond(ex, 200, rows.mkString("{\"result\":[", ",", "]}"))
        }
      } catch {
        case e: IllegalArgumentException => respond(ex, 400, err(e.getMessage))
        case e: org.apache.spark.sql.AnalysisException => respond(ex, 400, err(e.getMessage))
        case e: Throwable => respond(ex, 500, err(e.toString))
      }
    })

    server.setExecutor(null) // serial dispatch; the driver is one-at-a-time anyway
    server.start()
    Started(server, server.getAddress.getPort)
  }

  private def err(msg: String): String =
    JsonMethods.compact(JObject("error" -> JString(Option(msg).getOrElse("error"))))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
