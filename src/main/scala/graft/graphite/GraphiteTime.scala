package graft.graphite

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Graphite from/until/ts time parsing (render_api.go:130-206 parseTime)
  * — "now"/"today"/"yesterday", RFC3339, HH:MM_YYYYMMDD, YYYYMMDD,
  * YYYY-MM-DD, MM/DD/YY, unix seconds, and signed intervals relative to
  * now. Timezone fixed to UTC (the reference uses the request tz flag;
  * deviation noted in SURVEY §8).
  */
object GraphiteTime {

  private val msPerDay = 24L * 3600 * 1000

  def parseTime(nowMs: Long, s: String): Long = s match {
    case "now" => nowMs
    case "today" => nowMs - nowMs % msPerDay
    case "yesterday" => nowMs - nowMs % msPerDay - msPerDay
    case _ =>
      tryFormats(s).getOrElse {
        try { s.toLong * 1000 }
        catch {
          case _: NumberFormatException =>
            try nowMs + GraphiteQL.parseInterval(s)
            catch {
              case _: Exception =>
                throw GraphiteEval.GraphiteError(s"unsupported time '$s'")
            }
        }
      }
  }

  private def tryFormats(s: String): Option[Long] = {
    def at(f: => LocalDateTime): Option[Long] =
      try Some(f.toInstant(ZoneOffset.UTC).toEpochMilli)
      catch { case _: Exception => None }
    def atDate(f: => LocalDate): Option[Long] =
      try Some(f.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli)
      catch { case _: Exception => None }
    lazy val rfc3339: Option[Long] =
      try Some(Instant.parse(s).toEpochMilli)
      catch {
        case _: Exception =>
          try Some(java.time.OffsetDateTime.parse(s).toInstant.toEpochMilli)
          catch { case _: Exception => None }
      }
    rfc3339
      .orElse(at(LocalDateTime.parse(s, DateTimeFormatter.ofPattern("HH:mm'_'yyyyMMdd"))))
      .orElse(at(LocalDateTime.parse(s, DateTimeFormatter.ofPattern("HH:mmyyyyMMdd"))))
      .orElse(atDate(LocalDate.parse(s, DateTimeFormatter.ofPattern("yyyyMMdd"))))
      .orElse(at(LocalDateTime.parse(s, DateTimeFormatter.ofPattern("HH:mm yyyyMMdd"))))
      .orElse(atDate(LocalDate.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd"))))
      .orElse(atDate(LocalDate.parse(s, DateTimeFormatter.ofPattern("MM/dd/yy"))))
  }

  /** floor a timestamp to the unit named by `s` in timezone `tz`
    * (transform.go:5017 alignTimeUnit — the reference computes the
    * calendar fields in `ec.currentTime.Location()` and rebuilds the
    * instant with `time.Date(..., tz)`; DST-gap local times resolve
    * forward like Go's time.Date normalization)
    */
  def alignTimeUnit(startMs: Long, s: String,
      tz: java.time.ZoneId = ZoneOffset.UTC): Long = {
    val t = LocalDateTime.ofInstant(Instant.ofEpochMilli(startMs), tz)
    val aligned: LocalDateTime =
      if (s.startsWith("ms")) t.withNano((t.getNano / 1000000) * 1000000)
      else if (s.startsWith("s")) t.withNano(0)
      else if (s.startsWith("min")) t.withNano(0).withSecond(0)
      else if (s.startsWith("h")) t.withNano(0).withSecond(0).withMinute(0)
      else if (s.startsWith("d")) t.toLocalDate.atStartOfDay
      else if (s.startsWith("w")) {
        val weekday = s.last
        val alignTo = if (weekday.isDigit) weekday - '0' else 1
        // Go time.Weekday: Sunday=0; ISO day align per the reference.
        // The reference subtracts ABSOLUTE 24h days from local midnight
        // (`.Add(-time.Hour * 24 * days)`), not calendar days — they
        // differ across a DST transition in a non-UTC zone.
        val goWeekday = t.getDayOfWeek.getValue % 7
        var delta = goWeekday - alignTo
        if (delta < 0) delta += 7
        return t.toLocalDate.atStartOfDay.atZone(tz).toInstant.toEpochMilli -
          delta.toLong * 24L * 3600 * 1000
      } else if (s.startsWith("mon"))
        // Go time.Date(y, m, 0, …) = last day of previous month
        t.toLocalDate.withDayOfMonth(1).minusDays(1).atStartOfDay
      else if (s.startsWith("y"))
        // Go time.Date(y, 0, 0, …) = Nov 30 of previous year
        LocalDate.of(t.getYear - 1, 11, 30).atStartOfDay
      else throw GraphiteEval.GraphiteError(s"unsupported interval '$s'")
    aligned.atZone(tz).toInstant.toEpochMilli
  }

  /** unmarshalTags (transform.go:3969): `path;k=v;…` → map incl. the
    * `name` pseudo-tag; empty string → empty map
    */
  def unmarshalTags(s: String): Map[String, String] = {
    if (s.isEmpty) Map.empty
    else {
      val parts = s.split(";", -1)
      val kvs = parts.tail.flatMap { p =>
        val i = p.indexOf('=')
        if (i < 0) None else Some(p.substring(0, i) -> p.substring(i + 1))
      }
      (Map("name" -> parts.head) ++ kvs)
    }
  }
}
