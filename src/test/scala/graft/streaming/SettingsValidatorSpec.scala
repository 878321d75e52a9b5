package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference validator matrix
  * (`/root/reference/tests/unit/datasources/test_mysql.py:16-230`):
  * init with valid/missing params, the required-settings matrix,
  * missing vs incorrect settings, fetch-failure wrapping. */
class SettingsValidatorSpec extends AnyFunSuite {

  private val ok = Map(
    "binlog_format" -> "ROW",
    "binlog_row_metadata" -> "FULL",
    "binlog_row_image" -> "FULL",
    "gtid_mode" -> "ON",
    "enforce_gtid_consistency" -> "ON")

  test("validator init: all params accepted and carried") {
    val p = SettingsValidator.validateConnectionParams(
      Some("localhost"), Some("testuser"), Some("testpass"), Some(3306))
    assert(p == ConnectionParams("localhost", "testuser", "testpass", 3306))
  }

  test("validator init: each missing param raises its own message") {
    def msg(h: Option[String], u: Option[String], pw: Option[String],
        port: Option[Int]): String =
      intercept[ConfigurationError] {
        SettingsValidator.validateConnectionParams(h, u, pw, port)
      }.getMessage
    assert(msg(None, Some("u"), Some("p"), Some(3306))
      .contains("Database host is required"))
    assert(msg(Some("h"), None, Some("p"), Some(3306))
      .contains("Database user is required"))
    assert(msg(Some("h"), Some("u"), None, Some(3306))
      .contains("Database password is required"))
    assert(msg(Some("h"), Some("u"), Some("p"), None)
      .contains("Database port is required"))
    // empty string and port 0 are as missing as None (falsy in the ref)
    assert(msg(Some(""), Some("u"), Some("p"), Some(3306))
      .contains("Database host is required"))
    assert(msg(Some("h"), Some("u"), Some("p"), Some(0))
      .contains("Database port is required"))
  }

  test("required settings matrix matches the reference") {
    val r = SettingsValidator.RequiredSettings
    assert(r("binlog_format") == "ROW")
    assert(r("binlog_row_metadata") == "FULL")
    assert(r("binlog_row_image") == "FULL")
    assert(r("gtid_mode") == "ON")
    assert(r("enforce_gtid_consistency") == "ON")
    assert(r.size == 5)
  }

  test("verify: all settings correct passes; case-insensitive") {
    SettingsValidator.verifySettings(ok)
    SettingsValidator.verifySettings(
      ok.map { case (k, v) => k.toUpperCase -> v.toLowerCase })
  }

  test("verify: missing setting raises 'not found' naming the setting") {
    val e = intercept[ConfigurationError] {
      SettingsValidator.verifySettings(ok - "binlog_format")
    }
    assert(e.getMessage.contains("MySQL setting binlog_format not found"))
  }

  test("verify: incorrect value names setting, expected and actual") {
    val e = intercept[ConfigurationError] {
      SettingsValidator.verifySettings(ok + ("binlog_format" -> "STATEMENT"))
    }
    assert(e.getMessage.contains("MySQL setting binlog_format is incorrect"))
    assert(e.getMessage.contains("expected=ROW"))
    assert(e.getMessage.contains("actual=STATEMENT"))
  }

  test("validate: fetch runs after param check and feeds the matrix") {
    var fetched: Option[ConnectionParams] = None
    SettingsValidator.validate(Some("h"), Some("u"), Some("p"), Some(3306),
      p => { fetched = Some(p); ok })
    assert(fetched.contains(ConnectionParams("h", "u", "p", 3306)))
  }

  test("validate: fetch failure wraps into ConfigurationError") {
    val e = intercept[ConfigurationError] {
      SettingsValidator.validate(Some("h"), Some("u"), Some("p"), Some(3306),
        _ => throw new RuntimeException("Connection failed"))
    }
    assert(e.getMessage.contains("Failed to validate MySQL settings"))
    assert(e.getMessage.contains("Connection failed"))
  }

  test("validate: bad settings from fetch still raise the matrix error") {
    val e = intercept[ConfigurationError] {
      SettingsValidator.validate(Some("h"), Some("u"), Some("p"), Some(3306),
        _ => ok + ("gtid_mode" -> "OFF"))
    }
    assert(e.getMessage.contains("gtid_mode is incorrect"))
  }
}
