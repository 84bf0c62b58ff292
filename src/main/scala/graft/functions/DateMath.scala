package graft.functions

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** ES date-math expressions (`now-1d/d`, `2021-01-05T00:00:00Z||+12h`,
  * bare ISO instants) resolved to UTC epoch millis — the boundary syntax
  * of `date_range` aggregations and `range` filters on date fields.
  *
  * Deliberate deviation from ES: there is NO implicit wall clock. `now`
  * resolves against the `nowMs` the CALLER passes, because an engine
  * whose query results depend on when the executor ran them cannot be
  * replayed, cached, or oracle-checked — at 100 TB a retried task must
  * compute the same partition as the original. (ES itself pins `now`
  * once per request for the same reason; we pin it once per JOB.)
  *
  * Grammar (ES semantics, UTC-only):
  *   expr     := anchor math*  rounding?
  *   anchor   := "now" | iso "||"? (a bare ISO instant needs "||" only
  *               when math follows, same as ES)
  *   math     := ("+"|"-") digits unit      unit ∈ s m h H d w M y
  *   rounding := "/" unit                   floor to the unit's start
  */
object DateMath {

  private val MathRe = raw"([+\-])(\d+)([smhHdwMy])".r

  def resolve(expr: String, nowMs: Long): Long = {
    val (anchorMs, rest) =
      if (expr.startsWith("now")) (nowMs, expr.drop(3))
      else expr.indexOf("||") match {
        case -1 => return parseIso(expr) // bare instant: no math, no rounding
        case i => (parseIso(expr.take(i)), expr.drop(i + 2))
      }
    val (mathPart, roundUnit) = rest.indexOf('/') match {
      case -1 => (rest, None)
      case i =>
        require(i == rest.length - 2, s"rounding must be the final component: $expr")
        (rest.take(i), Some(rest.charAt(rest.length - 1)))
    }
    var t = ZonedDateTime.ofInstant(Instant.ofEpochMilli(anchorMs), ZoneOffset.UTC)
    var consumed = 0
    for (m <- MathRe.findAllMatchIn(mathPart)) {
      consumed += m.matched.length
      val n = m.group(2).toLong * (if (m.group(1) == "-") -1 else 1)
      t = m.group(3) match {
        case "s"       => t.plusSeconds(n)
        case "m"       => t.plusMinutes(n)
        case "h" | "H" => t.plusHours(n)
        case "d"       => t.plusDays(n)
        case "w"       => t.plusWeeks(n)
        case "M"       => t.plusMonths(n)
        case "y"       => t.plusYears(n)
      }
    }
    require(consumed == mathPart.length, s"unparsed date math in '$expr'")
    val rounded = roundUnit match {
      case None      => t
      case Some('s') => t.truncatedTo(ChronoUnit.SECONDS)
      case Some('m') => t.truncatedTo(ChronoUnit.MINUTES)
      case Some('h') | Some('H') => t.truncatedTo(ChronoUnit.HOURS)
      case Some('d') => t.truncatedTo(ChronoUnit.DAYS)
      case Some('w') => t.truncatedTo(ChronoUnit.DAYS).minusDays(t.getDayOfWeek.getValue - 1L)
      case Some('M') => t.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
      case Some('y') => t.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
      case Some(u)   => throw new IllegalArgumentException(s"unknown rounding unit '$u' in '$expr'")
    }
    rounded.toInstant.toEpochMilli
  }

  private def parseIso(s: String): Long = {
    val trimmed = s.trim
    // accept full instants and date-only forms (ES date_optional_time)
    if (trimmed.length == 10) // yyyy-MM-dd
      java.time.LocalDate.parse(trimmed).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    else Instant.parse(trimmed).toEpochMilli
  }
}
