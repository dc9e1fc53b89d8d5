package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Linear interpolation + OHLC downsampling (TimeSeries). */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interpolate fills interior gaps linearly, edges by nearest value") {
    // user 1: values at hours 0 and 3 (10.0 → 16.0), gap hours 1, 2
    // user 2: single point (grid of one row)
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 03:20:00"), 16.0),
      (2L, ts("2024-01-01 05:00:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.interpolate(
        TimeSeries.hourlyGrid(ev, "user_id", "ts", "value"), "user_id")
      .select($"user_id", date_format($"h", "HH").cast("int").as("hh"), $"v_li")
      .as[(Long, Int, Double)].collect().sortBy(r => (r._1, r._2))
    val u1 = out.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    assert(u1 == Map(0 -> 10.0, 1 -> 12.0, 2 -> 14.0, 3 -> 16.0), u1.toString)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 5, 7.0)))
  }

  test("interpolate back-fills a leading gap and forward-fills a trailing one") {
    // value only at hour 1; span is [0, 2] because events (null value
    // buckets don't exist here — craft span via extra rows at 0 and 2
    // whose hourly sum still lands on the grid)
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 0.0), // hour 0 sums to 0.0
      (1L, ts("2024-01-01 01:30:00"), 4.0),
      (1L, ts("2024-01-01 02:30:00"), 8.0)
    ).toDF("user_id", "ts", "value")
    // hours 0/1/2 all have values — no gap; now a real gap corpus:
    val ev2 = Seq(
      (9L, ts("2024-01-01 01:00:00"), 4.0),
      (9L, ts("2024-01-01 04:00:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val out2 = TimeSeries.interpolate(
        TimeSeries.hourlyGrid(ev2, "user_id", "ts", "value"), "user_id")
      .select(date_format($"h", "HH").cast("int"), $"v_li")
      .as[(Int, Double)].collect().toMap
    assert(out2 == Map(1 -> 4.0, 2 -> 4.0, 3 -> 4.0, 4 -> 4.0), out2.toString)
    val out1 = TimeSeries.interpolate(
        TimeSeries.hourlyGrid(ev, "user_id", "ts", "value"), "user_id")
      .select(date_format($"h", "HH").cast("int"), $"v_li")
      .as[(Int, Double)].collect().toMap
    assert(out1 == Map(0 -> 0.0, 1 -> 4.0, 2 -> 8.0), out1.toString)
  }

  test("ohlcHourly picks first/max/min/last by (ts, tie) within the hour") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L, 5.0),
      (1L, ts("2024-01-01 00:15:00"), 11L, 9.0),
      (1L, ts("2024-01-01 00:55:00"), 12L, 2.0),
      // same-ts tie: event 21 before 22 ⇒ open is 21's value
      (2L, ts("2024-01-01 01:00:00"), 22L, 3.0),
      (2L, ts("2024-01-01 01:00:00"), 21L, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.ohlcHourly(ev, "user_id", "ts", "event_id", "value")
      .select($"user_id", $"open", $"high", $"low", $"close", $"n")
      .as[(Long, Double, Double, Double, Double, Long)].collect()
      .sortBy(_._1)
    assert(out(0) == ((1L, 5.0, 9.0, 2.0, 2.0, 3L)), out(0).toString)
    assert(out(1) == ((2L, 1.0, 3.0, 1.0, 3.0, 2L)), out(1).toString)
  }

  test("burstiness: periodic is -1, heavy-tailed gaps are positive, short keys drop") {
    val periodic = (0 until 10).map(i =>
      (1L, ts(f"2024-01-01 00:${i * 5}%02d:00"), i.toLong))
    val bursty = Seq(0, 1, 2, 3, 1000).zipWithIndex.map { case (m, i) =>
      (2L, ts(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"), 100L + i)
    }
    val short = Seq((3L, ts("2024-01-01 00:00:00"), 900L),
      (3L, ts("2024-01-01 01:00:00"), 901L))  // 1 gap: dropped
    val ev = (periodic ++ bursty ++ short).toDF("user_id", "ts", "event_id")
    val out = TimeSeries.burstiness(ev, "user_id", "ts", "event_id")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L), out.mkString(", "))
    assert(out(0)._4 == -1.0, s"periodic burstiness ${out(0)._4}")
    assert(out(1)._4 > 0.3, s"bursty burstiness ${out(1)._4}")
  }

  test("seasonalDecompose: pure daily pattern splits into flat trend + exact seasonal") {
    // 72 hourly points: v = 50 ± 12 by hour-of-day parity; the ±12
    // pattern sums to zero over any 24-hour window, so trend = 50,
    // seasonal = ±12, residual = 0 on every complete-frame hour
    val ev = (0 until 72).map { i =>
      val day = i / 24; val hod = i % 24
      (1L, ts(f"2024-01-0${day + 1}%d $hod%02d:30:00"),
        50.0 + (if (hod % 2 == 0) 12.0 else -12.0))
    }.toDF("user_id", "ts", "value")
    val out = TimeSeries.seasonalDecompose(ev, "ts", "value")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    // complete frames exist at positions 11..59 of the 72-hour series
    assert(out.length == 49, s"expected 49 complete-frame hours, got ${out.length}")
    for ((h, hod, v, trend, seasonal, residual) <- out) {
      assert(trend == 50.0, s"$h trend $trend")
      assert(seasonal == (if (hod % 2 == 0) 12.0 else -12.0), s"$h seasonal $seasonal")
      assert(residual == 0.0, s"$h residual $residual")
      assert(v == 50.0 + seasonal)
    }
  }

  test("intervalUnion: overlaps merge, touching merges, gaps split islands") {
    // u1: 0min, 5min (overlap), 30min (gap) → islands [0,15) and [30,40)
    // u2: 0min and exactly 10min → touching intervals merge: [0,20)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
      (1L, ts("2024-01-01 00:30:00")),
      (2L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:10:00"))
    ).toDF("user_id", "ts")
    val out = TimeSeries.intervalUnion(ev, "user_id", "ts", 600000000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 25L * 60 * 1000000),
      (2L, 2L, 1L, 20L * 60 * 1000000)), out.mkString(", "))
  }

  test("cusum: level shift ramps the statistic and breaches; stationary stays flat") {
    // user 1: hours 0-9 at 1.0, hours 10-19 at 3.0 → μ=2, second half
    // ramps s by +1/hour: max 10, first s>5 at the 16th hour (1-based)
    // user 2: constant 2.0 → s pinned at 0, no breach
    val ev = (0 until 20).map { i =>
      (1L, ts(f"2024-01-01 $i%02d:30:00"), if (i < 10) 1.0 else 3.0)
    } ++ (0 until 6).map(i => (2L, ts(f"2024-01-01 $i%02d:30:00"), 2.0))
    val out = TimeSeries.cusum(ev.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", threshold = 5.0)
      .as[(Long, Long, Double, Double, Option[Long])].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 20L, 2.0, 10.0, Some(16L)),
      (2L, 6L, 2.0, 0.0, None)), out.mkString(", "))
  }

  test("cohortRetention counts distinct cohort users per weeks-since cell") {
    // 2024-01-01 is a Monday. u1 joins week 0, active weeks 0 and 2;
    // u2 joins week 0, active week 0 only (two events, deduped);
    // u3 joins week 2 — a second cohort, never counted in the first.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-04 09:00:00")),
      (3L, ts("2024-01-17 10:00:00"))
    ).toDF("user_id", "ts")
    val out = TimeSeries.cohortRetention(ev, "user_id", "ts")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-15", 0L, 1L)), out.mkString(", "))
  }

  test("touchAttribution credits first vs last preceding touch, (none) when bare") {
    // u1: view(1) → click(2) → purchase(3): first=view, last=click.
    // u2: purchase with no preceding touch → (none); a view AFTER the
    // purchase must not earn credit.
    // u3: same-ts tie — event_id orders click(30) before view(31),
    // so last touch at purchase(32) is the view.
    val ev = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:02:00"), 2L, "click"),
      (1L, ts("2024-01-01 00:03:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 00:01:00"), 10L, "purchase"),
      (2L, ts("2024-01-01 00:02:00"), 11L, "view"),
      (3L, ts("2024-01-01 00:05:00"), 30L, "click"),
      (3L, ts("2024-01-01 00:05:00"), 31L, "view"),
      (3L, ts("2024-01-01 00:06:00"), 32L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeSeries.touchAttribution(
        ev, "user_id", "ts", "event_id", "event_type", "purchase")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("(none)", 1L, 1L), ("click", 1L, 1L), ("view", 1L, 1L)),
      out.mkString(", "))
  }

  test("ewmaDaily: matches the hand-unrolled recursion y_t = (x_t + y_prev) / 2") {
    // one type, daily counts 4, 2, 8 -> y = 4, 3, 5.5
    val ev = Seq.tabulate(4)(i => (i.toLong, "2024-01-01 0" + i + ":00:00", "a")) ++
      Seq((10L, "2024-01-02 01:00:00", "a"), (11L, "2024-01-02 02:00:00", "a")) ++
      Seq.tabulate(8)(i => (20L + i, "2024-01-03 0" + i + ":00:00", "a")) ++
      Seq((40L, "2024-01-01 00:30:00", "b")) // second key: independent series
    val df = ev.toDF("event_id", "ts0", "event_type")
      .withColumn("ts", to_timestamp(col("ts0")))
    val out = TimeSeries.ewmaDaily(df, "ts", "event_type")
      .select(col("event_type"), col("day").cast("string"), col("n"), col("ewma"))
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", "2024-01-01", 4L, 4.0),
      ("a", "2024-01-02", 2L, 3.0),
      ("a", "2024-01-03", 8L, 5.5),
      ("b", "2024-01-01", 1L, 1.0)), out.mkString(", "))
  }

  test("ewmaDaily: 1200-day horizon stays finite and matches the sequential recurrence") {
    // REGRESSION: the single-window closed form overflowed past ~1024
    // days at α=0.5 (Σ x_i·2^i → Inf at 2^1024, then r^t·Inf → NaN);
    // the epoch re-anchored form must stay finite and correct across
    // three 512-day epochs. Counts cycle 1..7 so the steady state is
    // a nontrivial double, and the Scala loop is the ground truth.
    val days = 1200
    val counts = Array.tabulate(days)(i => (i % 7) + 1)
    val ev = (0 until days).flatMap { i =>
      (0 until counts(i)).map(k => ((i.toLong * 100) + k, i))
    }.toDF("event_id", "__d")
      .withColumn("ts", to_timestamp(
        date_add(to_date(lit("2020-01-01")), col("__d").cast("int"))))
      .withColumn("event_type", lit("a"))
    val out = TimeSeries.ewmaDaily(ev, "ts", "event_type")
      .select($"day".cast("string"), $"n", $"ewma")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.length == days, s"rows: ${out.length}")
    // sequential reference: y_0 = x_0, y = α·x + (1−α)·y
    var y = counts(0).toDouble
    val ref = counts.map { x => y = 0.5 * x + 0.5 * y; y }
    // (ref(0) deliberately re-derives y_0: 0.5·x0 + 0.5·x0 = x0)
    out.zipWithIndex.foreach { case ((d, n, e), i) =>
      assert(java.lang.Double.isFinite(e), s"day $d ($i): ewma=$e not finite")
      assert(n == counts(i), s"day $d: n=$n want ${counts(i)}")
      assert(math.abs(e - ref(i)) < 1e-3, s"day $d ($i): ewma=$e want ${ref(i)}")
    }
  }
}
