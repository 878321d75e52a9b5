package graft.streaming

/** Pre-flight source-settings validation (SURVEY §2.1 S2).
  *
  * Mirrors the reference's dedicated validator matrix
  * (`/root/reference/stream_cdc/datasources/mysql.py:24-128`, tested by
  * `tests/unit/datasources/test_mysql.py:16-230`): connection
  * parameters are checked individually with per-parameter messages,
  * then the server/source settings a CDC feed depends on are compared
  * against a required matrix — a missing setting and a wrong value are
  * DIFFERENT errors, each naming the setting, the expected and the
  * actual value, so a misconfigured source fails fast at driver side
  * with an actionable message instead of failing mid-stream on 1000
  * executors.
  *
  * The settings fetcher is pluggable (`fetch: () => Map[String,
  * String]`): the real deployment reads `SHOW GLOBAL VARIABLES` over a
  * JDBC connection; tests and the offline replay source supply maps.
  */
final class ConfigurationError(message: String)
  extends IllegalArgumentException(message)

final case class ConnectionParams(
    host: String, user: String, password: String, port: Int)

object SettingsValidator {

  /** The reference's required CDC settings matrix (`mysql.py:66-73`). */
  val RequiredSettings: Map[String, String] = Map(
    "binlog_format" -> "ROW",
    "binlog_row_metadata" -> "FULL",
    "binlog_row_image" -> "FULL",
    "gtid_mode" -> "ON",
    "enforce_gtid_consistency" -> "ON")

  /** Per-parameter presence validation (`mysql.py:34-41`): the FIRST
    * missing parameter is reported, in host/user/password/port order. */
  def validateConnectionParams(host: Option[String], user: Option[String],
      password: Option[String], port: Option[Int]): ConnectionParams = {
    val h = host.filter(_.nonEmpty).getOrElse(
      fail("Database host is required for validation"))
    val u = user.filter(_.nonEmpty).getOrElse(
      fail("Database user is required for validation"))
    val pw = password.filter(_.nonEmpty).getOrElse(
      fail("Database password is required for validation"))
    val p = port.filter(_ > 0).getOrElse(
      fail("Database port is required for validation"))
    ConnectionParams(h, u, pw, p)
  }

  /** Compare fetched settings against the required matrix
    * (`mysql.py:89-108`): missing and incorrect are distinct errors;
    * comparison is case-insensitive on both names and values. */
  def verifySettings(actual: Map[String, String],
      required: Map[String, String] = RequiredSettings): Unit = {
    val actualLower = actual.map { case (k, v) => k.toLowerCase -> v }
    required.foreach { case (setting, expected) =>
      actualLower.get(setting) match {
        case None =>
          fail(s"MySQL setting $setting not found")
        case Some(got) if got.toUpperCase != expected.toUpperCase =>
          fail(s"MySQL setting $setting is incorrect: " +
            s"expected=$expected, actual=$got")
        case _ => ()
      }
    }
  }

  /** Full pre-flight: params, then fetch, then matrix. Fetch failures
    * wrap into ConfigurationError (`mysql.py:110-120`) so callers get
    * one error taxonomy for every pre-flight failure mode. */
  def validate(host: Option[String], user: Option[String],
      password: Option[String], port: Option[Int],
      fetch: ConnectionParams => Map[String, String]): Unit = {
    val params = validateConnectionParams(host, user, password, port)
    val actual =
      try fetch(params)
      catch {
        case e: ConfigurationError => throw e
        case scala.util.control.NonFatal(e) =>
          fail(s"Failed to validate MySQL settings: ${e.getMessage}")
      }
    verifySettings(actual)
  }

  private def fail(msg: String): Nothing =
    throw new ConfigurationError(msg)
}
