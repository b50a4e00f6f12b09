package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Naive Bayes classifier (q125/q126): hand-checked model values on the
  * textbook spam/ham example, prediction semantics including the
  * unseen-term smoothing floor, and layout independence (the scorer's
  * ordered fold makes per-doc double sums partition-invariant).
  */
class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def train = Seq(
    ("spam", "buy cheap pills"),
    ("spam", "cheap pills now"),
    ("ham", "meeting notes attached"),
    ("ham", "notes for the meeting")).toDF("label", "text")

  test("nbTrain: add-one-smoothed logp matches hand computation") {
    val m = TextAnalysis.nbTrain(train, "label", "text")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // vocabulary: buy cheap pills now meeting notes attached for the = 9
    // spam totals 6, ham totals 7
    assert(m(("spam", "cheap")) === ((2L,
      BigDecimal(math.log(3.0 / 15.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m(("ham", "meeting")) === ((2L,
      BigDecimal(math.log(3.0 / 16.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m.size === 4 + 5) // 4 distinct spam terms, 5 distinct ham terms
  }

  test("nbClassify: obvious docs classify, unseen-only doc falls to floors") {
    val test = Seq(
      (1L, "cheap pills"),
      (2L, "meeting notes"),
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val got = TextAnalysis.nbClassify(train, test, "label", "doc_id", "text")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 === "spam")
    assert(got(2L)._1 === "ham")
    // all-unseen doc: equal priors, so the larger smoothing floor wins —
    // spam's ln(1/(6+9)) > ham's ln(1/(7+9))
    assert(got(3L)._1 === "spam")
    val expect3 = math.log(0.5) + 2 * math.log(1.0 / 15.0)
    assert(math.abs(got(3L)._2 - expect3) < 1e-6)
  }

  test("nbClassify/nbLogOdds score token-less documents (prior-only), not drop them") {
    val test = Seq((1L, "cheap pills"), (2L, ""), (3L, " ")).toDF("doc_id", "text")
    val preds = TextAnalysis.nbClassify(train, test, "label", "doc_id", "text")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(preds.keySet === Set(1L, 2L, 3L)) // EVERY document scored
    // empty docs score the prior alone: equal priors here → ln(0.5),
    // tie broken by label (max-of-struct: label desc wins on ties)
    assert(math.abs(preds(2L) - math.log(0.5)) < 1e-6)
    assert(math.abs(preds(3L) - math.log(0.5)) < 1e-6)
    val lo = TextAnalysis.nbLogOdds(train, test, "label", "spam", "doc_id",
        "text")
      .as[(Long, Double)].collect().toMap
    assert(lo.keySet === Set(1L, 2L, 3L))
    assert(math.abs(lo(2L)) < 1e-6) // equal priors → log-odds 0
  }

  test("nbLogOdds: sign follows the winning class; agrees with nbClassify") {
    val test = Seq(
      (1L, "cheap pills"),
      (2L, "meeting notes"),
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val lo = TextAnalysis.nbLogOdds(train, test, "label", "spam",
        "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val pred = TextAnalysis.nbClassify(train, test, "label", "doc_id", "text")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    // positive log-odds ⇔ classifier picks the positive class (equal
    // priors here, so no tie at exactly 0)
    test.as[(Long, String)].collect().foreach { case (id, _) =>
      assert((lo(id) > 0) === (pred(id) == "spam"), s"doc $id")
    }
    // doc 3 all-unseen: odds = 2·(ln(1/15) − ln(1/16)), priors cancel
    val expect3 = 2 * (math.log(1.0 / 15) - math.log(1.0 / 16))
    assert(math.abs(lo(3L) - expect3) < 1e-6)
  }

  test("nbClassify is layout-independent") {
    val test = Seq(
      (1L, "cheap pills meeting"),
      (2L, "notes now buy the")).toDF("doc_id", "text")
    val a = TextAnalysis.nbClassify(train, test, "label", "doc_id", "text")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val b = TextAnalysis.nbClassify(train.repartition(7),
        test.repartition(5), "label", "doc_id", "text")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
