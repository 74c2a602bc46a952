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

  test("name tokens stay out of the wrong field") {
    intercept[RuntimeException](Schedule.parse("0 MON 0 * * ?")) // minute field
    intercept[RuntimeException](Schedule.parse("0 0 0 JAN * ?")) // dom field
    // L/# are day-field syntax, never time-field syntax
    intercept[RuntimeException](Schedule.parse("0 L 0 * * ?"))
    intercept[RuntimeException](Schedule.parse("0 0 6#3 * * ?"))
    // steps must be numeric even where names are legal
    intercept[RuntimeException](Schedule.parse("0 0 0 ? * MON/TUE"))
  }

  test("L in day-of-month: last day, and L-n offsets") {
    val c = Schedule.parse("0 0 12 L * ?")
    assert(Schedule.nextAfter(c, at("2024-02-10T00:00:00"))
      === Some(at("2024-02-29T12:00:00"))) // leap February
    assert(Schedule.nextAfter(c, at("2024-04-30T13:00:00"))
      === Some(at("2024-05-31T12:00:00"))) // strictly-after rolls a month
    val off = Schedule.parse("0 0 0 L-2 * ?")
    assert(Schedule.nextAfter(off, at("2024-02-01T00:00:00"))
      === Some(at("2024-02-27T00:00:00")))
    assert(Schedule.nextAfter(off, at("2023-02-01T00:00:00"))
      === Some(at("2023-02-26T00:00:00"))) // non-leap: 28-2
  }

  test("LW and nW day-of-month: weekday resolution never leaves the month") {
    // 2024-03-31 is a Sunday → last weekday of March is Friday the 29th
    val lw = Schedule.parse("0 0 9 LW * ?")
    assert(Schedule.nextAfter(lw, at("2024-03-20T00:00:00"))
      === Some(at("2024-03-29T09:00:00")))
    // 2024-11-30 is a Saturday → last weekday is Friday the 29th
    assert(Schedule.nextAfter(lw, at("2024-11-01T00:00:00"))
      === Some(at("2024-11-29T09:00:00")))
    // 15W: 2024-06-15 is a Saturday → nearest weekday is Friday the 14th
    val w15 = Schedule.parse("0 0 9 15W * ?")
    assert(Schedule.nextAfter(w15, at("2024-06-01T00:00:00"))
      === Some(at("2024-06-14T09:00:00")))
    // 2024-09-15 is a Sunday → Monday the 16th
    assert(Schedule.nextAfter(w15, at("2024-09-01T00:00:00"))
      === Some(at("2024-09-16T09:00:00")))
    // 1W where the 1st is a Saturday slides FORWARD to Monday the 3rd
    // (never into the prior month): 2024-06-01 is a Saturday
    val w1 = Schedule.parse("0 0 9 1W * ?")
    assert(Schedule.nextAfter(w1, at("2024-05-31T23:00:00"))
      === Some(at("2024-06-03T09:00:00")))
    // 30W in February: day 30 never exists → no February fire
    val w30 = Schedule.parse("0 0 9 30W 2 ?")
    assert(Schedule.nextAfter(w30, at("2024-01-01T00:00:00")) === None)
  }

  test("nL and n#m day-of-week: last-Friday and third-Friday") {
    // March 2024 Fridays: 1, 8, 15, 22, 29
    val lastFri = Schedule.parse("0 0 18 ? * 6L")
    assert(Schedule.nextAfter(lastFri, at("2024-03-10T00:00:00"))
      === Some(at("2024-03-29T18:00:00")))
    assert(Schedule.parse("0 0 18 ? * FRIL") === lastFri)
    // bare L in day-of-week is simply Saturday: next Sat after Tue 03-05
    val sat = Schedule.parse("0 0 8 ? * L")
    assert(Schedule.nextAfter(sat, at("2024-03-05T00:00:00"))
      === Some(at("2024-03-09T08:00:00")))
    val thirdFri = Schedule.parse("0 0 18 ? * 6#3")
    assert(Schedule.nextAfter(thirdFri, at("2024-03-01T00:00:00"))
      === Some(at("2024-03-15T18:00:00")))
    assert(Schedule.parse("0 0 18 ? * FRI#3") === thirdFri)
    // 5th Friday exists in March 2024 (the 29th) but not April → May 31
    val fifthFri = Schedule.parse("0 0 18 ? * 6#5")
    assert(Schedule.nextAfter(fifthFri, at("2024-04-01T00:00:00"))
      === Some(at("2024-05-31T18:00:00")))
  }

  test("positional tokens must be the whole field; bad combos fail fast") {
    intercept[RuntimeException](Schedule.parse("0 0 0 L,15 * ?"))
    intercept[RuntimeException](Schedule.parse("0 0 0 1-LW * ?"))
    intercept[RuntimeException](Schedule.parse("0 0 0 ? * 6#6")) // nth > 5
    intercept[RuntimeException](Schedule.parse("0 0 0 ? * 6#x"))
    intercept[RuntimeException](Schedule.parse("0 0 0 L-x * ?"))
    intercept[RuntimeException](Schedule.parse("0 0 0 xW * ?"))
    intercept[RuntimeException](Schedule.parse("0 0 0 ? * 8L")) // dow > 7
  }
}
