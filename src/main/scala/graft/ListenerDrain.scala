package graft

/** Shared listener-drain discipline: Spark's listener bus delivers
  * asynchronously, so a counter read right after an action can miss
  * events still in flight — and a fixed sleep mis-credits stages
  * across measurements under load. Poll until the counter is stable
  * for TWO consecutive windows (bounded). One definition, used by the
  * shuffle-byte probes and the job-count spec, so the next drain fix
  * lands everywhere at once. */
object ListenerDrain {
  def drained(read: () => Long, windowMs: Int = 200, maxWaitMs: Int = 15000): Long = {
    var prev = -1L
    var cur = read()
    var stable = 0
    var waited = 0
    while (stable < 2 && waited < maxWaitMs) {
      prev = cur
      Thread.sleep(windowMs)
      waited += windowMs
      cur = read()
      stable = if (cur == prev) stable + 1 else 0
    }
    cur
  }
}
