package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DateMath

class DateMathSpec extends AnyFunSuite {

  private val Now = 1609459200000L + 8L * 3600000L + 1234L // 2021-01-01T08:00:00.001234-ish

  private def at(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  test("bare ISO instants and date-only anchors") {
    assert(DateMath.resolve("2021-01-01T00:00:00Z", Now) == 1609459200000L)
    assert(DateMath.resolve("2021-01-01", Now) == 1609459200000L)
    assert(DateMath.resolve("2021-01-01T02:00:00.500Z", Now) == 1609459200000L + 7200500L)
  }

  test("now arithmetic: ±unit offsets") {
    assert(DateMath.resolve("now", Now) == Now)
    assert(DateMath.resolve("now-6h", Now) == Now - 6L * 3600000L)
    assert(DateMath.resolve("now+30m", Now) == Now + 30L * 60000L)
    assert(DateMath.resolve("now-1d+2h", Now) == Now - 86400000L + 7200000L)
    assert(DateMath.resolve("now-2w", Now) == Now - 14L * 86400000L)
  }

  test("rounding floors to the unit start (UTC)") {
    assert(DateMath.resolve("now/d", Now) == at("2021-01-01T00:00:00Z"))
    assert(DateMath.resolve("now-6h/h", Now) == at("2021-01-01T02:00:00Z"))
    assert(DateMath.resolve("now/M", Now) == at("2021-01-01T00:00:00Z"))
    assert(DateMath.resolve("now-1d/M", Now) == at("2020-12-01T00:00:00Z"))
    assert(DateMath.resolve("now-1d/y", Now) == at("2020-01-01T00:00:00Z"))
    // 2021-01-01 is a Friday; week floors to Monday 2020-12-28
    assert(DateMath.resolve("now/w", Now) == at("2020-12-28T00:00:00Z"))
  }

  test("ISO anchor with || math") {
    assert(DateMath.resolve("2021-01-05T00:00:00Z||+12h", Now) == at("2021-01-05T12:00:00Z"))
    assert(DateMath.resolve("2021-03-15T10:30:00Z||/d", Now) == at("2021-03-15T00:00:00Z"))
    assert(DateMath.resolve("2021-01-31T00:00:00Z||+1M", Now) == at("2021-02-28T00:00:00Z"))
  }

  test("malformed expressions fail loudly") {
    intercept[IllegalArgumentException](DateMath.resolve("now-6x", Now))
    intercept[IllegalArgumentException](DateMath.resolve("now-6h/d/d", Now))
    intercept[IllegalArgumentException](DateMath.resolve("nowhere", Now))
    intercept[Exception](DateMath.resolve("not-a-date", Now))
  }
}
