package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion stage — SURVEY.md §2 F1-F8 (`fetchStocktonWeather.js`).
  *
  * The HTTP fetch itself stays a thin driver-edge concern (this
  * environment is zero-egress, so only the URL builder is implemented);
  * everything after the response body is distributed: `spark.read.json` →
  * zip/explode → enrich → parquet append.
  */
object OpenMeteoIngest {

  /** Open-Meteo archive response schema (struct of parallel arrays,
    * `fetchStocktonWeather.js:36-45`). Explicit schema: PERMISSIVE JSON
    * parsing makes `toNumber`'s "non-number → null" coercion a schema
    * property instead of per-row typeof checks. */
  val openMeteoSchema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timezone", StringType),
    StructField("hourly", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m", ArrayType(DoubleType)),
      StructField("relative_humidity_2m", ArrayType(DoubleType)),
      StructField("precipitation", ArrayType(DoubleType)),
      StructField("wind_speed_10m", ArrayType(DoubleType)),
      StructField("wind_gusts_10m", ArrayType(DoubleType)))))))

  /** F1 — param-built archive URL (`fetchStocktonWeather.js:29-49`).
    * Units/timezone fixed as in the reference. */
  def buildUrl(
      latitude: Double = Model.Latitude,
      longitude: Double = Model.Longitude,
      startDate: String,
      endDate: String): String =
    "https://archive-api.open-meteo.com/v1/archive" +
      s"?latitude=$latitude&longitude=$longitude" +
      s"&start_date=$startDate&end_date=$endDate" +
      "&hourly=temperature_2m,relative_humidity_2m,precipitation,wind_speed_10m,wind_gusts_10m" +
      "&temperature_unit=celsius&wind_speed_unit=ms&precipitation_unit=mm" +
      "&timezone=America%2FLos_Angeles"

  /** F1 — execute the archive fetch: GET the URL and stage the response
    * body as one JSON document file (the reference's axios.get →
    * document insert, `fetchStocktonWeather.js:51-71`). The fetch is a
    * driver-edge concern BY DESIGN — one small response per call —
    * while everything after the body is distributed via `readRaw`. The
    * zero-egress build environment cannot reach the real API, so the
    * spec exercises this exact client against a loopback HttpServer
    * serving the canned archive response; only the hostname differs in
    * production. Returns the staged file path. */
  def fetch(url: String, stagingDir: String): String = {
    // bounded waits on both connect and response: a hung archive server
    // must fail the ingest call, never block the driver indefinitely
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(60)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"fetch failed: HTTP ${resp.statusCode()}")
    val dir = java.nio.file.Paths.get(stagingDir)
    java.nio.file.Files.createDirectories(dir)
    // full SHA-256 of the URL: two distinct URLs staged into the same dir
    // can never collide (32-bit String.hashCode could, silently
    // overwriting the other response)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val f = dir.resolve(s"response_$digest.json")
    java.nio.file.Files.writeString(f, resp.body())
    f.toString
  }

  /** Read raw API response files (one JSON object per file). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(openMeteoSchema).option("multiLine", true).json(path)

  /** F2+F3+F4 — `combineHourly` (`fetchStocktonWeather.js:77-105`):
    * six parallel arrays → one row per hour via arrays_zip + explode
    * (index-aligned, like the reference's `for i` walk), null-coercion
    * fallbacks (rainfall/gust → 0), null-propagating °F derivation. */
  def explodeHourly(raw: DataFrame): DataFrame = {
    val zipped = raw.select(explode(arrays_zip(
      col("hourly.time").as("time"),
      col("hourly.temperature_2m").as("temperature_2m"),
      col("hourly.relative_humidity_2m").as("relative_humidity_2m"),
      col("hourly.precipitation").as("precipitation"),
      col("hourly.wind_speed_10m").as("wind_speed_10m"),
      col("hourly.wind_gusts_10m").as("wind_gusts_10m"))).as("h"))
    zipped.select(
      col("h.time").as("timestamp"),
      col("h.temperature_2m").as("temperatureC"),
      (col("h.temperature_2m") * lit(9) / lit(5) + lit(32)).as("temperatureF"),
      col("h.relative_humidity_2m").as("humidityPercent"),
      coalesce(col("h.precipitation"), lit(0.0)).as("rainfallMm"),
      col("h.wind_speed_10m").as("windSpeedMps"),
      coalesce(col("h.wind_gusts_10m"), lit(0.0)).as("windGustMps"))
  }

  /** F5 — enrichment: location + ETL-metadata structs
    * (`fetchStocktonWeather.js:189-193`, metadata stamp `:148-155`). */
  def enrich(
      observations: DataFrame,
      city: String = Model.City,
      state: String = Model.State,
      sourceTimestamp: String,
      apiRequestId: Option[String],
      etlBatchId: String): DataFrame =
    observations.select(
      col("*"),
      struct(lit(city).as("city"), lit(state).as("state")).as("location"),
      struct(
        lit(sourceTimestamp).as("source_timestamp"),
        lit(Model.SourceDatabase).as("source_database"),
        lit(Model.DataQuality).as("data_quality"),
        apiRequestId.map(lit(_)).getOrElse(lit(null).cast(StringType)).as("api_request_id"),
        lit(etlBatchId).as("etl_batch_id"),
        lit(Model.Author).as("author")).as("metadata"))

  /** F7 — append sinks for the raw + enriched layers (document-store
    * appends become parquet appends; at scale these tables partition by
    * ingest date). */
  def writeEnriched(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
