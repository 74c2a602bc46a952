package graft.pipeline

import java.time.{LocalDate, LocalDateTime, LocalTime}

/** Quartz-cron next-fire-time calculator — the scheduling semantics
  * behind the reference's workflow trigger
  * (Workflow/Daily_Licensed_Pets.yaml:8-11, quartz `41 0 10 * * ?`):
  * six fields `second minute hour day-of-month month day-of-week`, each
  * a number, comma list, `a-b` range, `* / n` or `a/n` step, `*`, or `?`
  * (day fields only; exactly one of day-of-month / day-of-week must be
  * `?`, as in Quartz). Day-of-week is Quartz-numbered: 1 = Sunday
  * through 7 = Saturday; the month and day-of-week fields also accept
  * Quartz name tokens (`JAN`-`DEC`, `SUN`-`SAT`, case-insensitive,
  * including in ranges and lists — `MON-FRI`, `JAN,JUL`).
  *
  * The Quartz positional extensions are supported with their Quartz
  * meanings: day-of-month `L` (last day), `L-n` (n days before last),
  * `LW` (last weekday), `nW` (nearest weekday to day n, never crossing
  * the month boundary); day-of-week `L` (bare L "simply means 7 or
  * SAT" in Quartz: every Saturday), `nL`/`FRIL` (the month's last
  * weekday n) and `n#m` (the m-th weekday n of the month; no fire in months with
  * fewer than m such weekdays). As in Quartz, a positional token must
  * be the ENTIRE field — mixing `L`/`W`/`#` with lists, ranges, or
  * steps fails fast with a descriptive error, as does `nW` with n past
  * the month's length (no fire that month, matching plain-dom Feb-30
  * semantics when n is a valid day of some months).
  *
  * Pure arithmetic over java.time — no threads, no clock. The CADENCE
  * is what belongs in the engine (computable, testable, reusable by any
  * runner); actually firing on it is the platform scheduler's job, with
  * [[Orchestrator]] supplying the retry/backoff run semantics once
  * fired. SURVEY §2's missing-item list calls this split out
  * explicitly.
  */
object Schedule {

  /** One parsed day field. Plain sets come from numeric/name syntax;
    * the positional variants carry Quartz `L`/`W`/`#` semantics and are
    * always a whole field (Quartz forbids mixing them into lists).
    */
  sealed trait DaySpec
  object DaySpec {
    /** Plain day-of-month set (`1,15`, `10-12`, `*`/n`). */
    final case class Days(days: Set[Int]) extends DaySpec
    /** `L` (offset 0) / `L-n`: n days before the month's last day. */
    final case class LastDom(offset: Int) extends DaySpec
    /** `LW`: the month's last weekday (Mon-Fri). */
    case object LastWeekdayDom extends DaySpec
    /** `nW`: nearest Mon-Fri to day n, never crossing the month. */
    final case class NearestWeekday(day: Int) extends DaySpec
    /** Plain day-of-week set (Quartz-numbered, SUN=1). */
    final case class Dows(dows: Set[Int]) extends DaySpec
    /** `nL`: the month's last weekday n (e.g. `6L` = last Friday). */
    final case class LastDow(dow: Int) extends DaySpec
    /** `n#m`: the m-th weekday n of the month (m in 1..5). */
    final case class NthDow(dow: Int, nth: Int) extends DaySpec
  }

  final case class Cron(seconds: Set[Int], minutes: Set[Int],
      hours: Set[Int], dayOfMonth: Option[DaySpec], months: Set[Int],
      dayOfWeek: Option[DaySpec])

  /** Quartz name aliases, case-insensitive: JAN-DEC for the month field,
    * SUN-SAT for day-of-week (Quartz-numbered, SUN=1).
    */
  private val monthNames: Map[String, Int] = Seq("JAN", "FEB", "MAR",
    "APR", "MAY", "JUN", "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
    .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
  private val dowNames: Map[String, Int] = Seq("SUN", "MON", "TUE",
    "WED", "THU", "FRI", "SAT")
    .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap

  private def parseField(spec: String, lo: Int, hi: Int, name: String,
      names: Map[String, Int] = Map.empty): Set[Int] = {
    // tokens are numbers or this field's name aliases (MON, JAN, …);
    // stray L/W/# (only whole-field positional forms are legal — the
    // day-field parsers below strip those before delegating here) fail
    // with the descriptive field error, not a bare NumberFormatException
    def num(s: String, part: String): Int =
      names.get(s.toUpperCase(java.util.Locale.ROOT))
        .orElse(s.toIntOption).getOrElse(
          sys.error(s"bad $name field part '$part': unsupported token '$s' " +
            (if (names.isEmpty) "(numeric tokens only; L/W/# must be the " +
              "whole field, never inside lists/ranges/steps)"
             else s"(numbers or ${names.keys.toSeq.sorted.mkString("/")}; " +
               "L/W/# must be the whole field, never inside lists/ranges/steps)")))
    def one(part: String): Seq[Int] = {
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toIntOption.getOrElse(
          sys.error(s"bad $name field part '$part': step '$s' must be numeric")))
        case _ => sys.error(s"bad $name field part '$part'")
      }
      require(step > 0, s"$name step must be positive in '$part'")
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-", 2); (num(a, part), num(b, part))
        case n =>
          // bare number with a step ("5/15") means "from 5 to max"
          val v = num(n, part); if (step == 1) (v, v) else (v, hi)
      }
      require(from >= lo && to <= hi && from <= to,
        s"$name values out of [$lo,$hi] in '$part'")
      (from to to by step)
    }
    spec.split(",").toSeq.flatMap(one).toSet
  }

  /** Whole-field Quartz positional forms for day-of-month. */
  private def parseDom(spec: String): DaySpec =
    spec.toUpperCase(java.util.Locale.ROOT) match {
      case "L" => DaySpec.LastDom(0)
      case "LW" => DaySpec.LastWeekdayDom
      case s if s.startsWith("L-") =>
        val off = s.drop(2).toIntOption.getOrElse(
          sys.error(s"bad day-of-month field '$spec': L-n needs numeric n"))
        require(off >= 0 && off <= 30,
          s"day-of-month L-$off out of range (0-30)")
        DaySpec.LastDom(off)
      case s if s.endsWith("W") =>
        val d = s.dropRight(1).toIntOption.getOrElse(
          sys.error(s"bad day-of-month field '$spec': nW needs numeric n " +
            "(and W must be the whole field, never inside lists/ranges/steps)"))
        require(d >= 1 && d <= 31, s"day-of-month ${d}W out of [1,31]")
        DaySpec.NearestWeekday(d)
      case _ => DaySpec.Days(parseField(spec, 1, 31, "day-of-month"))
    }

  /** Whole-field Quartz positional forms for day-of-week. */
  private def parseDow(spec: String): DaySpec = {
    val up = spec.toUpperCase(java.util.Locale.ROOT)
    def dowNum(s: String): Int =
      dowNames.get(s).orElse(s.toIntOption).filter(d => d >= 1 && d <= 7)
        .getOrElse(sys.error(s"bad day-of-week field '$spec': '$s' must be " +
          "1-7 or SUN-SAT"))
    up match {
      // Quartz: bare L in dow "simply means 7 or SAT" — every Saturday,
      // not the last one (nL is the last-weekday-n form)
      case "L" => DaySpec.Dows(Set(7))
      case s if s.endsWith("L") && !s.contains(",") && !s.contains("-") =>
        DaySpec.LastDow(dowNum(s.dropRight(1)))
      case s if s.contains("#") =>
        s.split("#", -1) match {
          case Array(d, n) =>
            val nth = n.toIntOption.getOrElse(
              sys.error(s"bad day-of-week field '$spec': n#m needs numeric m"))
            require(nth >= 1 && nth <= 5,
              s"day-of-week nth $nth out of [1,5] in '$spec'")
            DaySpec.NthDow(dowNum(d), nth)
          case _ => sys.error(s"bad day-of-week field '$spec': expected n#m")
        }
      case _ => DaySpec.Dows(parseField(spec, 1, 7, "day-of-week", dowNames))
    }
  }

  def parse(expr: String): Cron = {
    val f = expr.trim.split("\\s+")
    require(f.length == 6,
      s"quartz cron needs 6 fields (sec min hour dom mon dow), got '$expr'")
    val domQ = f(3) == "?"
    val dowQ = f(5) == "?"
    require(domQ ^ dowQ,
      "exactly one of day-of-month / day-of-week must be '?' (Quartz rule)")
    Cron(
      seconds = parseField(f(0), 0, 59, "second"),
      minutes = parseField(f(1), 0, 59, "minute"),
      hours = parseField(f(2), 0, 23, "hour"),
      dayOfMonth = if (domQ) None else Some(parseDom(f(3))),
      months = parseField(f(4), 1, 12, "month", monthNames),
      dayOfWeek = if (dowQ) None else Some(parseDow(f(5))))
  }

  /** java.time Monday=1..Sunday=7 → Quartz Sunday=1..Saturday=7. */
  private def quartzDow(d: LocalDate): Int = d.getDayOfWeek.getValue % 7 + 1

  private def isWeekday(d: LocalDate): Boolean =
    d.getDayOfWeek.getValue <= 5 // java.time: MON=1..FRI=5

  /** Quartz `nW`: the weekday nearest day n of `month`, never leaving
    * the month — Sat n slides to Fri n-1 (or Mon n+2 when n=1), Sun n
    * slides to Mon n+1 (or Fri n-2 when n = month length). None when n
    * exceeds the month's length (no fire that month, the plain-dom
    * impossible-date rule).
    */
  private def nearestWeekday(month: LocalDate, n: Int): Option[LocalDate] = {
    val len = month.lengthOfMonth
    if (n > len) None
    else {
      val target = month.withDayOfMonth(n)
      val resolved = target.getDayOfWeek match {
        case java.time.DayOfWeek.SATURDAY =>
          if (n == 1) target.plusDays(2) else target.minusDays(1)
        case java.time.DayOfWeek.SUNDAY =>
          if (n == len) target.minusDays(2) else target.plusDays(1)
        case _ => target
      }
      Some(resolved)
    }
  }

  private def domMatches(spec: DaySpec, d: LocalDate): Boolean = spec match {
    case DaySpec.Days(days) => days.contains(d.getDayOfMonth)
    case DaySpec.LastDom(off) => d.getDayOfMonth == d.lengthOfMonth - off
    case DaySpec.LastWeekdayDom =>
      isWeekday(d) && d.getDayOfMonth > d.lengthOfMonth - 3 &&
        (d.getDayOfMonth + 1 to d.lengthOfMonth)
          .forall(n => !isWeekday(d.withDayOfMonth(n)))
    case DaySpec.NearestWeekday(n) => nearestWeekday(d, n).contains(d)
    case other => sys.error(s"day-of-week spec $other in day-of-month position")
  }

  private def dowMatches(spec: DaySpec, d: LocalDate): Boolean = spec match {
    case DaySpec.Dows(dows) => dows.contains(quartzDow(d))
    case DaySpec.LastDow(w) =>
      quartzDow(d) == w && d.getDayOfMonth + 7 > d.lengthOfMonth
    case DaySpec.NthDow(w, nth) =>
      quartzDow(d) == w && (d.getDayOfMonth - 1) / 7 + 1 == nth
    case other => sys.error(s"day-of-month spec $other in day-of-week position")
  }

  private def dayMatches(c: Cron, d: LocalDate): Boolean =
    c.months.contains(d.getMonthValue) &&
      c.dayOfMonth.forall(domMatches(_, d)) &&
      c.dayOfWeek.forall(dowMatches(_, d))

  /** The first fire time STRICTLY after `t`, or None if none occurs
    * within `horizonDays` (guards impossible dates like Feb 30). The
    * default horizon is ~9 years: the Gregorian worst case is a Feb-29
    * cron straddling a 100-divisible non-leap year (2096-02-29 →
    * 2104-02-29 is ~2,890 days), which a 4-year horizon would
    * misreport as an impossible date.
    */
  def nextAfter(c: Cron, t: LocalDateTime,
      horizonDays: Int = 3300): Option[LocalDateTime] = {
    val hours = c.hours.toSeq.sorted
    val minutes = c.minutes.toSeq.sorted
    val seconds = c.seconds.toSeq.sorted
    var day = t.toLocalDate
    var first = true
    var scanned = 0
    while (scanned <= horizonDays) {
      if (dayMatches(c, day)) {
        val floor = if (first) Some(t.toLocalTime) else None
        val hit = (for {
          h <- hours.iterator
          m <- minutes.iterator
          s <- seconds.iterator
          cand = LocalTime.of(h, m, s)
          if floor.forall(cand.isAfter)
        } yield cand).nextOption()
        hit match {
          case Some(time) => return Some(LocalDateTime.of(day, time))
          case None => // today's slots exhausted; roll to the next day
        }
      }
      day = day.plusDays(1)
      first = false
      scanned += 1
    }
    None
  }

  /** Convenience: parse + next in one call. */
  def nextAfter(expr: String, t: LocalDateTime): Option[LocalDateTime] =
    nextAfter(parse(expr), t)
}
