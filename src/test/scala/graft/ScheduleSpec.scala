package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Schedule

/** Quartz-cron next-fire semantics, pinned on the reference's own
  * trigger expression plus ranges/steps/lists/day-of-week and the
  * impossible-date guard.
  */
class ScheduleSpec extends AnyFunSuite {
  private def at(s: String) = LocalDateTime.parse(s)

  test("the reference's daily trigger '41 0 10 * * ?' fires at 10:00:41 every day") {
    val c = Schedule.parse("41 0 10 * * ?")
    assert(Schedule.nextAfter(c, at("2024-03-05T09:00:00"))
      === Some(at("2024-03-05T10:00:41")))
    // strictly after: the fire instant itself rolls to tomorrow
    assert(Schedule.nextAfter(c, at("2024-03-05T10:00:41"))
      === Some(at("2024-03-06T10:00:41")))
    assert(Schedule.nextAfter(c, at("2024-03-05T10:00:40"))
      === Some(at("2024-03-05T10:00:41")))
    // month boundary
    assert(Schedule.nextAfter(c, at("2024-02-29T11:00:00"))
      === Some(at("2024-03-01T10:00:41")))
  }

  test("steps, ranges and lists: '0 */15 9-17 * * ?'") {
    val c = Schedule.parse("0 */15 9-17 * * ?")
    assert(Schedule.nextAfter(c, at("2024-03-05T09:10:00"))
      === Some(at("2024-03-05T09:15:00")))
    assert(Schedule.nextAfter(c, at("2024-03-05T17:45:00"))
      === Some(at("2024-03-06T09:00:00")))
    val list = Schedule.parse("0 5,35 8 * * ?")
    assert(Schedule.nextAfter(list, at("2024-03-05T08:05:00"))
      === Some(at("2024-03-05T08:35:00")))
  }

  test("day-of-week is Quartz-numbered (1=Sunday): '0 0 8 ? * 2' is Mondays") {
    val c = Schedule.parse("0 0 8 ? * 2")
    // 2024-03-05 is a Tuesday; next Monday is 2024-03-11
    assert(Schedule.nextAfter(c, at("2024-03-05T00:00:00"))
      === Some(at("2024-03-11T08:00:00")))
    // Sunday = 1
    val sun = Schedule.parse("0 0 8 ? * 1")
    assert(Schedule.nextAfter(sun, at("2024-03-05T00:00:00"))
      === Some(at("2024-03-10T08:00:00")))
  }

  test("specific day-of-month and month: '0 30 6 15 2 ?'") {
    val c = Schedule.parse("0 30 6 15 2 ?")
    assert(Schedule.nextAfter(c, at("2024-02-15T06:30:00"))
      === Some(at("2025-02-15T06:30:00")))
  }

  test("impossible dates return None instead of spinning: Feb 30") {
    val c = Schedule.parse("0 0 0 30 2 ?")
    assert(Schedule.nextAfter(c, at("2024-01-01T00:00:00")) === None)
  }

  test("Feb-29 cron across the 2100 non-leap century boundary still resolves") {
    // the Gregorian worst case: next Feb 29 after 2096-03-01 is
    // 2104-02-29, ~2,890 days out — a 4-year horizon would misreport
    // this valid schedule as an impossible date
    val c = Schedule.parse("0 0 0 29 2 ?")
    assert(Schedule.nextAfter(c, at("2096-03-01T00:00:00"))
      === Some(at("2104-02-29T00:00:00")))
  }

  test("malformed expressions fail fast") {
    intercept[IllegalArgumentException](Schedule.parse("* * * * *")) // 5 fields
    intercept[IllegalArgumentException](Schedule.parse("0 0 0 * * *")) // no '?'
    intercept[IllegalArgumentException](Schedule.parse("0 99 0 * * ?")) // range
  }

  test("Quartz name tokens: MON-FRI range, JAN,JUL list, case-insensitive") {
    // '0 0 8 ? * MON-FRI' ≡ '0 0 8 ? * 2-6'
    assert(Schedule.parse("0 0 8 ? * MON-FRI")
      === Schedule.parse("0 0 8 ? * 2-6"))
    assert(Schedule.parse("0 0 8 ? * mon,wed,fri")
      === Schedule.parse("0 0 8 ? * 2,4,6"))
    assert(Schedule.parse("0 30 6 15 FEB ?")
      === Schedule.parse("0 30 6 15 2 ?"))
    assert(Schedule.parse("0 0 0 1 JAN,JUL ?")
      === Schedule.parse("0 0 0 1 1,7 ?"))
    // 2024-03-05 is a Tuesday → next weekday fire is Wednesday 08:00
    val c = Schedule.parse("0 0 8 ? * MON-FRI")
    assert(Schedule.nextAfter(c, at("2024-03-05T09:00:00"))
      === Some(at("2024-03-06T08:00:00")))
    // Friday 2024-03-08 09:00 rolls over the weekend to Monday
    assert(Schedule.nextAfter(c, at("2024-03-08T09:00:00"))
      === Some(at("2024-03-11T08:00:00")))
  }

  test("name tokens stay out of the wrong field; L/W/# still fail fast") {
    intercept[RuntimeException](Schedule.parse("0 MON 0 * * ?")) // minute field
    intercept[RuntimeException](Schedule.parse("0 0 0 JAN * ?")) // dom field
    intercept[RuntimeException](Schedule.parse("0 0 0 L * ?"))
    intercept[RuntimeException](Schedule.parse("0 0 0 ? * 6#3"))
    intercept[RuntimeException](Schedule.parse("0 0 0 15W * ?"))
    // steps must be numeric even where names are legal
    intercept[RuntimeException](Schedule.parse("0 0 0 ? * MON/TUE"))
  }
}
