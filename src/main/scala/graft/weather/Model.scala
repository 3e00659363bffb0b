package graft.weather

/** Canonical data model of the weather engine — SURVEY.md §1.
  * One typed surface (`Dataset[EnrichedObservation]`) for the
  * bronze→silver hop; the warehouse/aggregate layers stay DataFrames
  * (their schemas are fixed by DDL, not by Scala types).
  */
object Model {

  /** Reference constants (`fetchStocktonWeather.js:10-13`, `:148-155`). */
  val City = "Stockton"
  val State = "CA"
  val Latitude = 37.9575
  val Longitude = -121.2925
  val Author = "Mannu, Darshana, Shradhha, Thai Khoa"
  val SourceDatabase = "open-meteo.com/archive"
  val DataQuality = "as-provided"

  /** Catalog layout: the reference's Mongo/ClickHouse/Redis hops collapse
    * into one layered catalog (SURVEY.md §7). */
  val WarehouseDb = "weather_dw"
  val DailyWeatherTable = s"$WarehouseDb.daily_weather"
  val MonthlyAggTable = s"$WarehouseDb.monthly_agg"

  final case class Location(city: String, state: String)

  /** `fetchStocktonWeather.js:148-155` metadata stamp. */
  final case class EtlMetadata(
      source_timestamp: String,
      source_database: String,
      data_quality: String,
      api_request_id: Option[String],
      etl_batch_id: String,
      author: String)

  /** One enriched hourly observation (`fetchStocktonWeather.js:94-102`,
    * `:189-193`). Nullability mirrors `toNumber`: rainfall/gust default 0,
    * the rest stay null. */
  final case class EnrichedObservation(
      timestamp: String,
      temperatureC: Option[Double],
      temperatureF: Option[Double],
      humidityPercent: Option[Double],
      rainfallMm: Double,
      windSpeedMps: Option[Double],
      windGustMps: Double,
      location: Location,
      metadata: EtlMetadata)
}
