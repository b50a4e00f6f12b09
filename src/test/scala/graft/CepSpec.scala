package graft

import java.sql.Timestamp

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.cep._

class CepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  implicit def sqlCtx: SQLContext = spark.sqlContext

  private def ts(s: Long) = new Timestamp(s * 1000)
  private def ev(key: String, t: Long, typ: String, id: Long) =
    CepEvent(key, ts(t), typ, id)

  private val loginFail = Pattern
    .begin("first", _.eventType == "fail")
    .next("second", _.eventType == "fail")
    .within("2 seconds")

  private val orderPay = Pattern
    .begin("create", _.eventType == "create")
    .followedBy("pay", _.eventType == "pay")
    .within("15 minutes")

  test("strict contiguity: intervening success kills the run; overlaps all emit") {
    val events = Seq(
      ev("u1", 10, "fail", 1), ev("u1", 11, "fail", 2), ev("u1", 12, "fail", 3),
      ev("u2", 10, "fail", 4), ev("u2", 11, "success", 5), ev("u2", 12, "fail", 6),
      ev("u3", 10, "fail", 7), ev("u3", 20, "fail", 8)) // outside 2s
    val out = CEP.detectBatch(events.toDS(), loginFail).collect()
    val pairs = out.map(m => (m.key, m.events.map(_.id))).toSet
    assert(pairs === Set(("u1", Seq(1L, 2L)), ("u1", Seq(2L, 3L))))
  }

  test("relaxed contiguity skips non-matching events; timeouts emit partials") {
    val events = Seq(
      ev("o1", 100, "create", 1), ev("o1", 150, "other", 2), ev("o1", 200, "pay", 3),
      ev("o2", 100, "create", 4), // never paid
      ev("o3", 100, "create", 5), ev("o3", 100 + 3600, "pay", 6)) // pay too late
    val out = CEP.detectBatch(events.toDS(), orderPay, emitTimeouts = true).collect()
    val matched = out.filter(!_.timedOut).map(m => (m.key, m.events.map(_.id))).toSet
    val timedOut = out.filter(_.timedOut).map(m => (m.key, m.events.map(_.id))).toSet
    assert(matched === Set(("o1", Seq(1L, 3L))))
    assert(timedOut === Set(("o2", Seq(4L)), ("o3", Seq(5L))))
  }

  test("streaming detection equals batch across micro-batch boundaries") {
    val events = Seq(
      ev("u1", 10, "fail", 1), ev("u1", 11, "fail", 2),
      ev("u2", 10, "fail", 3), ev("u2", 11, "success", 4), ev("u2", 12, "fail", 5),
      ev("u1", 12, "fail", 6))
    val input = MemoryStream[CepEvent]
    val q = CEP.detectStream(
        input.toDS().withWatermark("ts", "0 seconds").as[CepEvent], loginFail)
      .writeStream.outputMode("append").format("memory").queryName("cep1").start()
    events.grouped(2).foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
    val streamed = spark.table("cep1").as[PatternMatch].collect()
      .map(m => (m.key, m.events.map(_.id))).toSet
    q.stop()
    val batch = CEP.detectBatch(events.toDS(), loginFail).collect()
      .map(m => (m.key, m.events.map(_.id))).toSet
    assert(streamed === batch)
    assert(streamed === Set(("u1", Seq(1L, 2L)), ("u1", Seq(2L, 6L))))
  }

  test("streaming timeouts fire when the watermark passes the deadline") {
    val input = MemoryStream[CepEvent]
    val ds = input.toDS().withWatermark("ts", "0 seconds").as[CepEvent]
    val q = CEP.detectStream(ds, orderPay, emitTimeouts = true)
      .writeStream.outputMode("append").format("memory").queryName("cep2").start()
    input.addData(ev("o1", 1000, "create", 1), ev("o2", 1000, "create", 2),
      ev("o2", 1100, "pay", 3))
    q.processAllAvailable()
    input.addData(ev("zz", 10000, "other", 4)) // advance watermark past deadline
    q.processAllAvailable()
    input.addData(ev("zz", 20000, "other", 5))
    q.processAllAvailable()
    val out = spark.table("cep2").as[PatternMatch].collect()
    q.stop()
    assert(out.exists(m => m.key == "o2" && !m.timedOut))
    assert(out.exists(m => m.key == "o1" && m.timedOut && m.events.map(_.id) == Seq(1L)))
  }

  test("hot key with many events streams through the fold (secondary sort, no buffering)") {
    // One key with far more events than any sane per-task buffer, heavily
    // duplicated timestamps and shuffled input order: the secondary-sort
    // path must equal the pure in-memory NFA fold over the sorted input.
    val n = 200000
    val rnd = new scala.util.Random(42)
    val hot = (1L to n.toLong).map { i =>
      ev("bot", 1000 + i / 3, if (rnd.nextInt(10) < 7) "fail" else "success", i)
    }
    val cold = Seq(ev("u9", 1001, "fail", n + 1L), ev("u9", 1002, "fail", n + 2L))
    val shuffled = rnd.shuffle(hot ++ cold)
    val got = CEP.detectBatch(shuffled.toDS().repartition(8), loginFail).collect()
    val expected = scala.collection.mutable.ListBuffer[PatternMatch]()
    CEP.advanceForTest(loginFail, hot.sortBy(e => (e.ts.getTime, e.id)), expected)
    val gotHot = got.filter(_.key == "bot").map(_.events.map(_.id)).toSet
    val expHot = expected.map(_.events.map(_.id)).toSet
    assert(gotHot === expHot)
    assert(gotHot.size > 1000) // the pattern actually fires at volume
    assert(got.count(_.key == "u9") === 1)
  }

  test("detectStream without a watermark fails fast for `within` patterns") {
    val input = MemoryStream[CepEvent]
    val e = intercept[IllegalArgumentException] {
      CEP.detectStream(input.toDS(), loginFail)
    }
    assert(e.getMessage.contains("withWatermark"))
  }

  test("transformWithState CEP (arbitrary-state v2) matches the fMGWS form") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Seq(
        ev("u1", 10, "fail", 1), ev("u1", 11, "fail", 2),
        ev("u2", 10, "fail", 3), ev("u2", 11, "success", 4), ev("u2", 12, "fail", 5),
        ev("u1", 12, "fail", 6))
      val input = MemoryStream[CepEvent]
      val q = CepProcessor(
          input.toDS().withWatermark("ts", "0 seconds").as[CepEvent], loginFail)
        .writeStream.outputMode("append").format("memory").queryName("cep_v2").start()
      events.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val v2 = spark.table("cep_v2").as[PatternMatch].collect()
        .map(m => (m.key, m.events.map(_.id))).toSet
      q.stop()
      val batch = CEP.detectBatch(events.toDS(), loginFail).collect()
        .map(m => (m.key, m.events.map(_.id))).toSet
      assert(v2 === batch)
      assert(v2 === Set(("u1", Seq(1L, 2L)), ("u1", Seq(2L, 6L))))

      // timer-fired timeout emission (the explicit-timer path)
      val in2 = MemoryStream[CepEvent]
      val q2 = CepProcessor(
          in2.toDS().withWatermark("ts", "0 seconds").as[CepEvent],
          orderPay, emitTimeouts = true)
        .writeStream.outputMode("append").format("memory").queryName("cep_v2t").start()
      in2.addData(ev("o1", 1000, "create", 1), ev("o2", 1000, "create", 2),
        ev("o2", 1100, "pay", 3))
      q2.processAllAvailable()
      in2.addData(ev("zz", 10000, "other", 4)) // advance watermark past deadline
      q2.processAllAvailable()
      in2.addData(ev("zz", 20000, "other", 5))
      q2.processAllAvailable()
      val out2 = spark.table("cep_v2t").as[PatternMatch].collect()
      q2.stop()
      assert(out2.exists(m => m.key == "o2" && !m.timedOut))
      assert(out2.exists(m => m.key == "o1" && m.timedOut &&
        m.events.map(_.id) == Seq(1L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("list-state CEP (per-run timers) matches the other forms; staggered deadlines fire per run") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // form equivalence on the login-fail pattern (same scenario as
      // the fMGWS and single-timer tests — all four forms, one NFA)
      val events = Seq(
        ev("u1", 10, "fail", 1), ev("u1", 11, "fail", 2),
        ev("u2", 10, "fail", 3), ev("u2", 11, "success", 4), ev("u2", 12, "fail", 5),
        ev("u1", 12, "fail", 6))
      val input = MemoryStream[CepEvent]
      val q = CepListProcessor(
          input.toDS().withWatermark("ts", "0 seconds").as[CepEvent], loginFail)
        .writeStream.outputMode("append").format("memory").queryName("cep_ls").start()
      events.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val ls = spark.table("cep_ls").as[PatternMatch].collect()
        .map(m => (m.key, m.events.map(_.id))).toSet
      q.stop()
      val batch = CEP.detectBatch(events.toDS(), loginFail).collect()
        .map(m => (m.key, m.events.map(_.id))).toSet
      assert(ls === batch)
      assert(ls === Set(("u1", Seq(1L, 2L)), ("u1", Seq(2L, 6L))))

      // the per-run-timer property: ONE key holding two runs with
      // DIFFERENT deadlines (creates at 1000 and 1400; within 900s →
      // deadlines 1900 and 2300) times out run by run as the watermark
      // passes each deadline — a single rolling min-deadline would have
      // to re-arm; here each run's own timer fires
      val in2 = MemoryStream[CepEvent]
      val q2 = CepListProcessor(
          in2.toDS().withWatermark("ts", "0 seconds").as[CepEvent],
          orderPay, emitTimeouts = true)
        .writeStream.outputMode("append").format("memory").queryName("cep_ls2").start()
      in2.addData(ev("m", 1000, "create", 1), ev("m", 1400, "create", 2))
      q2.processAllAvailable()
      in2.addData(ev("zz", 2100, "other", 90)) // wm → 2100: past 1900 only
      q2.processAllAvailable()
      in2.addData(ev("zz", 2200, "other", 91)) // trigger the fire
      q2.processAllAvailable()
      val mid = spark.table("cep_ls2").as[PatternMatch].collect()
        .filter(_.key == "m").map(m => (m.events.map(_.id), m.timedOut)).toSet
      assert(mid === Set((Seq(1L), true)),
        s"only the 1900-deadline run should have expired at wm 2100, got $mid")
      in2.addData(ev("zz", 5000, "other", 92)) // wm past 2300 too
      q2.processAllAvailable()
      in2.addData(ev("zz", 5100, "other", 93))
      q2.processAllAvailable()
      val fin = spark.table("cep_ls2").as[PatternMatch].collect()
        .filter(_.key == "m").map(m => (m.events.map(_.id), m.timedOut)).toSet
      q2.stop()
      assert(fin === Set((Seq(1L), true), (Seq(2L), true)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("null keys form their own group; no state leaks across the null boundary") {
    // nulls sort FIRST in the secondary sort, so a state leak would
    // carry null-key runs into the first real key's fold
    val events = Seq(
      CepEvent(null, ts(10), "fail", 1),
      CepEvent(null, ts(11), "fail", 2),  // pair within the null group
      CepEvent("a", ts(11), "fail", 3))   // alone — must NOT pair with id 2
    val out = CEP.detectBatch(events.toDS(), loginFail).collect()
    assert(out.length === 1 && out(0).key == null)
    assert(out(0).events.map(_.id) === Seq(1L, 2L))
    // end-of-input flush must fire for an all-null-key input too
    val t = CEP.detectBatch(
      Seq(CepEvent(null, ts(100), "create", 9)).toDS(),
      orderPay, emitTimeouts = true).collect()
    assert(t.length === 1 && t(0).timedOut && t(0).key == null)
  }

  test("single-step and maxRuns bounds") {
    val events = (1L to 50L).map(i => ev("k", 100 + i, "fail", i))
    val single = Pattern.begin("any", _.eventType == "fail")
    assert(CEP.detectBatch(events.toDS(), single).count() === 50)
    val bounded = Pattern.begin("a", _ => true).followedBy("b", _ => false)
      .maxRuns(5)
    // every event starts a run that never completes; state stays bounded
    val out = CEP.detectBatch(events.toDS(), bounded, emitTimeouts = false)
    assert(out.count() === 0)
  }
}
