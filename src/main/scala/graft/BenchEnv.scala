package graft

/** Machine-load helpers shared by the benchmark mains ([[Bench]],
  * [[ScaleBench]]).
  *
  * Driver-box contention has historically inflated CPU-bound queries
  * 20-30% round-over-round and once 4-5× (a loadavg-5.35 run measuring
  * a 1.3 s query at 6.2 s); recording load made those runs
  * self-diagnosing, and these helpers make the harness ACT on it:
  * spin-wait for a quiet box before the first timed pass, and
  * self-label the run `contended` when the wait times out.
  */
object BenchEnv {

  /** 1/5/15-minute loadavg as printed by /proc/loadavg ("" off-Linux). */
  def loadavg(): String =
    try {
      val s = scala.io.Source.fromFile("/proc/loadavg")
      try s.getLines().next().split(" ").take(3).mkString(",")
      finally s.close()
    } catch { case _: Throwable => "" }

  /** 1-minute loadavg, or -1 when unreadable. */
  def load1(): Double =
    try loadavg().split(",")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative hypervisor steal time from /proc/stat's aggregate cpu
    * line (field 8, USER_HZ ticks summed over all CPUs), or -1 when
    * unreadable. Steal is the contaminant the loadavg cannot see: the
    * r14 textrank decomposition measured ~21 stolen core-seconds in
    * one 51 s window while every loadavg read sat inside the quiet
    * band — so the bench records a steal delta per measurement and
    * the suspect rule triggers on it (not only on post-load).
    */
  def stealTicks(): Long =
    try {
      val s = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = s.getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else -1L
      } finally s.close()
    } catch { case _: Throwable => -1L }

  /** Steal CORE-seconds since `t0` ticks (USER_HZ = 100 on Linux),
    * or -1 when either sample was unreadable.
    */
  def stealSecondsSince(t0: Long): Double = {
    val t1 = stealTicks()
    if (t0 < 0 || t1 < 0) -1.0 else (t1 - t0) / 100.0
  }

  /** Wait (poll every 5 s) until the 1-minute loadavg drops below
    * `threshold`, up to `maxWaitS` seconds. Returns true when the box
    * is quiet, false on timeout — the caller reports the run as
    * `"contended": true` so a loaded-box number never reads as a plan
    * regression. Thresholds/waits come from the environment so the
    * driver harness can tune them without a code change:
    * SPARK_GRAFT_QUIET_LOAD (default 3.0), SPARK_GRAFT_QUIET_WAIT_S
    * (default 180).
    */
  def awaitQuiet(): Boolean = {
    val threshold =
      sys.env.getOrElse("SPARK_GRAFT_QUIET_LOAD", "3.0").toDouble
    val maxWaitS =
      sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT_S", "180").toInt
    val deadline = System.nanoTime() + maxWaitS * 1000000000L
    var l = load1()
    while (l >= threshold && System.nanoTime() < deadline) {
      System.err.println(f"[bench] loadavg $l%.2f >= $threshold%.1f - " +
        "waiting for a quiet box")
      Thread.sleep(5000)
      l = load1()
    }
    l < threshold || l < 0 // unreadable loadavg: proceed, don't flag
  }
}
