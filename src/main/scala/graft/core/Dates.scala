package graft.core

import java.time.LocalDate

/** Date-window arithmetic (reference: ballcone/core.py:66-72 — the
  * report window `[stop − (days−1), stop]`, with "today" computed in
  * UTC; defaults 30 days CLI / 7 days web UI).
  */
object Dates {

  /** Inclusive window of `days` days ending at `stop`. */
  def window(stop: LocalDate, days: Int): (LocalDate, LocalDate) = {
    require(days >= 1, s"days must be >= 1, got $days")
    (stop.minusDays(days - 1L), stop)
  }

  /** Today in UTC (core.py:68 uses utcnow). */
  def todayUtc(): LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)
}
