package graft.queries

import java.nio.file.Files


import graft.SparkSpec

/** q99 burst debounce on a hand-built timeline where the burst
  * boundaries are known exactly.
  */
class DebounceSpec extends SparkSpec {

  test("bursts collapse to their first event; a hold-off gap starts a new burst") {
    import spark.implicits._
    // the real events.parquet carries TIMESTAMP(NANOS), which Tables.load
    // reads as a nanos LONG and truncates to µs — mimic that layout
    def ts(sec: Int): Long = 1700000000L * 1000000000L + sec * 1000000000L
    val tmp = Files.createTempDirectory("graft-debounce").toString
    Seq(
      // user 1, click: a drumbeat every 4 min for 12 min = ONE burst,
      // then a 5-min gap = a second burst
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(240), 1L, "click", 0.0, "{}"),
      (3L, ts(480), 1L, "click", 0.0, "{}"),
      (4L, ts(780), 1L, "click", 0.0, "{}"),   // 300s after event 3: new burst
      // user 1, view: different type — its own stream, never debounced away
      (5L, ts(1), 1L, "view", 0.0, "{}"),
      // user 2, click: isolated event
      (6L, ts(2), 2L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val kept = Windows.q99Debounce(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(kept == Seq(
      (1L, "click", 1L), // burst 1 survivor
      (1L, "click", 4L), // burst 2 survivor (gap reached the hold-off)
      (1L, "view", 5L),
      (2L, "click", 6L)))
  }
}
