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
  * including in ranges and lists — `MON-FRI`, `JAN,JUL`). The `L`/`W`/`#`
  * positional extensions are not supported and fail fast.
  *
  * Pure arithmetic over java.time — no threads, no clock. The CADENCE
  * is what belongs in the engine (computable, testable, reusable by any
  * runner); actually firing on it is the platform scheduler's job, with
  * [[Orchestrator]] supplying the retry/backoff run semantics once
  * fired. SURVEY §2's missing-item list calls this split out
  * explicitly.
  */
object Schedule {

  final case class Cron(seconds: Set[Int], minutes: Set[Int],
      hours: Set[Int], dayOfMonth: Option[Set[Int]], months: Set[Int],
      dayOfWeek: Option[Set[Int]])

  /** Quartz name aliases, case-insensitive: JAN-DEC for the month field,
    * SUN-SAT for day-of-week (Quartz-numbered, SUN=1). The L/W/#
    * positional extensions remain OUT of the supported subset.
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
    // the L/W/# extensions fail with the descriptive field error
    // instead of a bare NumberFormatException
    def num(s: String, part: String): Int =
      names.get(s.toUpperCase(java.util.Locale.ROOT))
        .orElse(s.toIntOption).getOrElse(
          sys.error(s"bad $name field part '$part': unsupported token '$s' " +
            (if (names.isEmpty) "(numeric tokens only; L/W/# are not supported)"
             else s"(numbers or ${names.keys.toSeq.sorted.mkString("/")}; " +
               "L/W/# are not supported)")))
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
      dayOfMonth = if (domQ) None else Some(parseField(f(3), 1, 31, "day-of-month")),
      months = parseField(f(4), 1, 12, "month", monthNames),
      dayOfWeek = if (dowQ) None else Some(parseField(f(5), 1, 7, "day-of-week", dowNames)))
  }

  /** java.time Monday=1..Sunday=7 → Quartz Sunday=1..Saturday=7. */
  private def quartzDow(d: LocalDate): Int = d.getDayOfWeek.getValue % 7 + 1

  private def dayMatches(c: Cron, d: LocalDate): Boolean =
    c.months.contains(d.getMonthValue) &&
      c.dayOfMonth.forall(_.contains(d.getDayOfMonth)) &&
      c.dayOfWeek.forall(_.contains(quartzDow(d)))

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
