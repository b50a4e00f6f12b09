package graft.cep

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests of the CEP NFA core (the pure `advance` fold) against
  * a brute-force oracle that enumerates candidate index tuples directly
  * from the semantics: monotone indices, per-step predicates, strict
  * steps adjacent, all within the time bound. No SparkSession — pure
  * function, hundreds of random cases.
  */
class CepPropertySpec extends AnyFunSuite {

  private def checkProp(pattern: Pattern, cases: Int = 300): Unit =
    (1 to cases).foreach { i =>
      val events = genEvents(i.toLong)
      assert(nfa(events, pattern) === bruteForce(events, pattern),
        s"case $i: $events")
    }

  private def ev(key: String, t: Long, typ: String, id: Long) =
    CepEvent(key, new Timestamp(t), typ, id)

  private val eventsGen: Gen[List[CepEvent]] = for {
    n <- Gen.choose(0, 12)
    types <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    gaps <- Gen.listOfN(n, Gen.choose(1L, 50L))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    types.zip(ts).zipWithIndex.map { case ((t, time), i) => ev("k", time, t, i.toLong) }
  }

  private def genEvents(seed: Long): List[CepEvent] =
    eventsGen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))

  /** Brute-force oracle of Flink's `next`/`followedBy` semantics (the
    * ones the DSL implements — NOT `followedByAny`): one run per step-0
    * match; a strict step consumes exactly the adjacent event; a relaxed
    * step consumes the FIRST matching later event; the run dies if the
    * consumed event is outside the within-window.
    */
  private def bruteForce(events: List[CepEvent], pattern: Pattern): Set[Seq[Long]] = {
    val steps = pattern.steps
    events.indices.flatMap { start =>
      if (!steps(0).pred(events(start))) None
      else {
        var ids = List(events(start).id)
        var prev = start
        var alive = true
        (1 until steps.size).foreach { s =>
          if (alive) {
            val step = steps(s)
            def expired(i: Int) = pattern.withinMs.exists(w =>
              events(i).ts.getTime - events(start).ts.getTime > w)
            val cand: Option[Int] =
              if (step.strict) Some(prev + 1).filter(_ < events.length)
              else ((prev + 1) until events.length)
                .find(i => step.pred(events(i)) || expired(i))
            cand match {
              case Some(i) if step.pred(events(i)) && !expired(i) =>
                ids = events(i).id :: ids; prev = i
              case _ => alive = false
            }
          }
        }
        if (alive) Some(ids.reverse) else None
      }
    }.toSet
  }

  /** Run the NFA core directly (same entry the Dataset operators use). */
  private def nfa(events: List[CepEvent], pattern: Pattern): Set[Seq[Long]] = {
    val out = scala.collection.mutable.ListBuffer[PatternMatch]()
    val pending = CEP.advanceForTest(pattern, events.sortBy(e => (e.ts.getTime, e.id)), out)
    out.filter(!_.timedOut).map(_.events.map(_.id)).toSet
  }

  test("NFA matches == brute-force enumeration (strict two-step within)") {
    checkProp(Pattern.begin("x", _.eventType == "a")
      .next("y", _.eventType == "a").withinMillis(60))
  }

  test("NFA matches == brute-force enumeration (relaxed three-step within)") {
    checkProp(Pattern.begin("x", _.eventType == "a")
      .followedBy("y", _.eventType == "b")
      .followedBy("z", _.eventType == "c").withinMillis(120))
  }

  test("NFA matches == brute-force (mixed strict/relaxed, no window)") {
    checkProp(Pattern.begin("x", _.eventType == "a")
      .followedBy("y", _.eventType == "b")
      .next("z", _.eventType == "c"))
  }
}
