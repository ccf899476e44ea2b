package graft.exec

import org.scalatest.funsuite.AnyFunSuite

class TimeKeeperSpec extends AnyFunSuite {

  private def keeperAt(nowNanos: Iterator[Long], limit: Double, window: Int = 15) =
    new TimeKeeper(limit, window, () => nowNanos.next())

  test("rolling mean keeps only the last 15 durations (timeKeeper.py:50-58)") {
    val tk = keeperAt(Iterator.continually(0L), limit = 1000)
    (1 to 20).foreach(i => tk.record(i.toDouble))
    // last 15 of 1..20 = 6..20, mean = 13
    assert(tk.avgRecentSeconds === 13.0)
  }

  test("avg of empty window is 0, not NaN") {
    val tk = keeperAt(Iterator.continually(0L), limit = 10)
    assert(tk.avgRecentSeconds === 0.0)
    assert(!tk.shouldStop)
  }

  test("stops when wall exceeds limit (timeKeeper.py:61-73)") {
    val clock = Iterator(0L, 11_000_000_000L, 11_000_000_000L, 11_000_000_000L)
    val tk = keeperAt(clock, limit = 10)
    assert(tk.shouldStop)
  }

  test("stops when forecast (wall + avg) would exceed limit") {
    // wall = 8s, avg recent = 3s -> forecast 11 > 10
    val clock = Iterator(0L) ++ Iterator.continually(8_000_000_000L)
    val tk = keeperAt(clock, limit = 10)
    tk.record(3.0)
    assert(tk.wallSeconds === 8.0)
    assert(tk.forecastSeconds === 11.0)
    assert(tk.shouldStop)
  }

  test("does not stop inside budget") {
    val clock = Iterator(0L) ++ Iterator.continually(5_000_000_000L)
    val tk = keeperAt(clock, limit = 10)
    tk.record(2.0)
    assert(!tk.shouldStop)
  }
}
