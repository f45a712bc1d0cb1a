package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, event, ns): two users; user 1 has a 31-min gap after event 2
  // and a 2-h gap after event 4; user 2 never gaps
  private val M = 60L * 1000000000L
  private def events = Seq(
    (1L, 10L, 0 * M), (1L, 11L, 5 * M), (1L, 12L, 36 * M),
    (1L, 13L, 40 * M), (1L, 14L, 160 * M),
    (2L, 20L, 0 * M), (2L, 21L, 29 * M), (2L, 22L, 58 * M)
  ).toDF("u", "id", "tn")

  test("assign opens a session on the first event and after each " +
      "> gap inactivity, per key") {
    val out = Sessionize.assign(events, Seq("u"), "tn", "id", 30 * M)
      .select("u", "id", "session_no").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 2L),
      (1L, 14L, 3L),
      (2L, 20L, 1L), (2L, 21L, 1L), (2L, 22L, 1L)))
  }

  test("stats roll sessions up to count, start, duration") {
    val out = Sessionize.stats(events, Seq("u"), "tn", "id", 30 * M)
      .select("u", "session_no", "n_events", "start_ts", "duration")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 2L, 0 * M, 5 * M), (1L, 2L, 2L, 36 * M, 4 * M),
      (1L, 3L, 1L, 160 * M, 0L),
      (2L, 1L, 3L, 0 * M, 58 * M)))
  }

  test("a gap of exactly the threshold does NOT open a session " +
      "(strictly greater), and ties order by the tie column") {
    val df = Seq((1L, 2L, 100L), (1L, 1L, 100L), (1L, 3L, 130L))
      .toDF("u", "id", "tn")
    val out = Sessionize.assign(df, Seq("u"), "tn", "id", 30L)
      .select("id", "session_no").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 1L)))
    val out2 = Sessionize.assign(df, Seq("u"), "tn", "id", 29L)
      .select("id", "session_no").as[(Long, Long)].collect().toSet
    assert(out2 == Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }
}
