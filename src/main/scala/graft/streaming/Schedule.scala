package graft.streaming

import scala.concurrent.duration._

import org.apache.spark.sql.streaming.Trigger

/** The reference's schedule DSL (`every='10 minutes'`,
  * /root/reference/schedule.go:22-76) mapped onto Structured Streaming
  * triggers: a scheduled job becomes a `ProcessingTime` trigger for a
  * long-lived tail or `AvailableNow` for a cron-launched drain.
  */
object Schedule {
  private val Every = """(?i)\s*(?:every\s+)?(\d+)\s*(minute|minutes|hour|hours|day|days)\s*""".r

  /** Parse the DSL. ≙ parseSchedule (schedule.go:46-76): N {minute,hour,day}.
    * Honors the Option contract for EVERY malformed input: a count that
    * overflows Int, or a duration beyond FiniteDuration's Long-nanos range
    * (~106751 days), returns None instead of leaking NumberFormatException /
    * IllegalArgumentException — so trigger/toJson always surface the
    * documented `bad schedule: '...'` message. */
  def parse(s: String): Option[FiniteDuration] = s match {
    case Every(n, unit) =>
      n.toIntOption.flatMap { i =>
        try Some(unit.toLowerCase match {
          case u if u.startsWith("minute") => i.minutes
          case u if u.startsWith("hour")   => i.hours
          case _                            => i.days
        }) catch { case _: IllegalArgumentException => None }
      }
    case _ => None
  }

  /** Continuous tail at the scheduled cadence. */
  def trigger(s: String): Trigger =
    parse(s).map(d => Trigger.ProcessingTime(d.toMillis))
      .getOrElse(throw new IllegalArgumentException(s"bad schedule: '$s'"))

  /** One bounded drain (external cron runs the process; ≙ the exported-cron
    * mode of schedule.go:200-217). */
  def drainTrigger: Trigger = Trigger.AvailableNow()

  /** Export as the reference's JSON shape {"every": seconds}. */
  def toJson(s: String): String =
    parse(s).map(d => s"""{"every":${d.toSeconds}}""")
      .getOrElse(throw new IllegalArgumentException(s"bad schedule: '$s'"))
}
