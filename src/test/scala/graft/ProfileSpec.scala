package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

/** Spec for the exact table-profiling read (q218). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("profile: per-column counts, nulls, distincts, typed bounds in one pass") {
    val df = Seq[(java.lang.Long, String, java.lang.Double, Long)](
      (1L, "b", 2.5, 10L), (2L, "a", null, 10L), (null, "a", 7.25, 11L),
      (2L, null, 2.5, 12L))
      .toDF("id", "tag", "v", "sec")
      .select($"id", $"tag", $"v",
        org.apache.spark.sql.functions.timestamp_seconds($"sec").as("ts"))
    val got = Profile.table(df, numCols = Seq("id", "v"),
        strCols = Seq("tag"), tsCols = Seq("ts"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect().toSet
    assert(got === Set(
      ("id", 4L, 1L, 2L, Some(1.0), Some(2.0), None, None),
      ("v", 4L, 1L, 2L, Some(2.5), Some(7.25), None, None),
      ("tag", 4L, 1L, 2L, None, None, Some("a"), Some("b")),
      // ts projects to epoch seconds; two rows share second 10
      ("ts", 4L, 0L, 3L, Some(10.0), Some(12.0), None, None)))
    // a column may be profiled under exactly one family
    intercept[IllegalArgumentException] {
      Profile.table(df, Seq("id"), Seq("id"), Nil)
    }
  }

  test("approxTable: drop-in schema, exact counts/bounds unchanged, small-cardinality estimates exact, no Expand") {
    val df = Seq[(java.lang.Long, String, java.lang.Double, Long)](
      (1L, "b", 2.5, 10L), (2L, "a", null, 10L), (null, "a", 7.25, 11L),
      (2L, null, 2.5, 12L))
      .toDF("id", "tag", "v", "sec")
      .select($"id", $"tag", $"v",
        org.apache.spark.sql.functions.timestamp_seconds($"sec").as("ts"))
    val exact = Profile.table(df, numCols = Seq("id", "v"),
      strCols = Seq("tag"), tsCols = Seq("ts"))
    val approx = Profile.approxTable(df, numCols = Seq("id", "v"),
      strCols = Seq("tag"), tsCols = Seq("ts"))
    assert(approx.schema === exact.schema) // drop-in swap
    // HLL++ is exact at these cardinalities, so the whole row agrees
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect().toSet
    assert(rows(approx) === rows(exact))
    // the point of the sibling: the exact-distinct Expand is gone
    val pa = approx.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pe = exact.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(pe.contains("Expand") && !pa.contains("Expand"),
      s"approx profile should drop the Expand:\n$pa")
  }

  test("approxTable rsd tour (q252's dial): tighter rsd stays within a tighter band of the exact profile, schema fixed") {
    import org.apache.spark.sql.functions.col
    // the estimate/cost dial a 100 TB profile actually turns: rsd
    // sizes the HLL++ registers (cost ∝ 1/rsd²); each setting must
    // keep every column's distinct estimate within a band the rsd
    // implies. Run over the real events table (the q252 input), not a
    // toy frame, so the tour documents behavior at realistic
    // cardinalities. Band = max(4·rsd·exact, 2): ~4 standard errors
    // plus an absolute floor for tiny cardinalities.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val numCols = Seq("event_id", "user_id", "value")
    val strCols = Seq("event_type", "props")
    val exact = Profile.table(ev, numCols, strCols, tsCols = Seq("ts"))
      .select(col("column"), col("n_distinct"))
      .as[(String, Long)].collect().toMap
    for (rsd <- Seq(0.02, 0.05, 0.1)) {
      val approx = Profile.approxTable(ev, numCols, strCols,
        tsCols = Seq("ts"), rsd = rsd)
      assert(approx.schema === Profile.table(ev, numCols, strCols,
        Seq("ts")).schema)       // drop-in at every setting
      val est = approx.select(col("column"), col("n_distinct"))
        .as[(String, Long)].collect().toMap
      est.foreach { case (c, e) =>
        val x = exact(c)
        val band = math.max(4.0 * rsd * x, 2.0)
        assert(math.abs(e - x) <= band,
          s"rsd=$rsd column=$c est=$e exact=$x band=$band")
      }
    }
  }

  test("sliceDatasheet: per-slice rows/keys/weights; tombstone rows counted, not hidden in the sum") {
    val slices = Seq(
      (0L, "a", 1L, 2L), (0L, "b", 1L, 1L), (0L, "a", 2L, 3L),
      (1L, "a", 1L, 1L),
      (9L, "a", 1L, -2L), (9L, "b", 1L, -1L)) // a tombstone slice
      .toDF("slice", "token", "doc_id", "tf")
    val got = graft.ops.Profile.sliceDatasheet(slices, "slice",
        Seq("token", "doc_id"), "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 3L, 3L, 6L, 0L),
      (1L, 1L, 1L, 1L, 0L),
      (9L, 2L, 2L, -3L, 2L))) // negative sum SURFACES, rows counted
    intercept[IllegalArgumentException] {
      graft.ops.Profile.sliceDatasheet(slices, "slice", Nil, "tf")
    }
  }

  test("rollupSheet: per-prefix totals with the grouping bitmask; (all) marks rolled-up levels") {
    val df = Seq(
      ("web", "en", 10L), ("web", "en", 5L), ("web", "de", 7L),
      ("pdf", "en", 3L))
      .toDF("source", "lang", "n_chars")
    val got = Profile.rollupSheet(df, Seq("source", "lang"), "n_chars")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("web", "en", 0L, 2L, 15L),
      ("web", "de", 0L, 1L, 7L),
      ("pdf", "en", 0L, 1L, 3L),
      ("web", "(all)", 1L, 3L, 22L),   // lang rolled up (low bit)
      ("pdf", "(all)", 1L, 1L, 3L),
      ("(all)", "(all)", 3L, 4L, 25L))) // grand total: both bits set
    intercept[IllegalArgumentException] {
      Profile.rollupSheet(df, Nil, "n_chars")
    }
  }

  test("skewAudit: top-k by count with deterministic key tie-break, exact ppm truncation, cumulative concentration") {
    // key a: 6 rows, b: 2, c: 2, d: 1 — 11 total, k=3 keeps a,b,c
    // (b before c on the key tie)
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("c") ++ Seq.fill(2)("b") ++
      Seq("d")).toDF("k")
    val got = Profile.skewAudit(df, "k", k = 3)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", 6L, 11L, 4L, 545454L, 545454L), // 6e6/11 truncates
      (2L, "b", 2L, 11L, 4L, 181818L, 727272L), // cum = 8e6/11
      (3L, "c", 2L, 11L, 4L, 181818L, 909090L))) // cum = 10e6/11
    intercept[IllegalArgumentException] { Profile.skewAudit(df, "k", 0) }
  }

  test("compactionPlan: start-offset binning keeps contiguous id ranges; oversized file gets its own bin; groups independent") {
    // group g, target 10: sizes 4,4,4,25,3 start at offsets
    // 0,4,8,12,37 -> bins 0,0,0,1,3 — a bin closes when the running
    // START passes the target (the last member may spill over), the
    // oversized file owns bin 1 and pushes the next file past bin 2
    // entirely; group h bins from ITS OWN offsets
    val files = Seq(("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L),
      ("g", 4L, 25L), ("g", 5L, 3L), ("h", 1L, 12L), ("h", 2L, 1L))
      .toDF("src", "fid", "sz")
    val got = Profile.compactionPlan(files, "src", "fid", "sz",
        targetBytes = 10L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("g", 0L, 3L, 12L, 1L, 3L),
      ("g", 1L, 1L, 25L, 4L, 4L),
      ("g", 3L, 1L, 3L, 5L, 5L),
      ("h", 0L, 1L, 12L, 1L, 1L),
      ("h", 1L, 1L, 1L, 2L, 2L)))
    // every bin is a contiguous id range: id_lo..id_hi never overlaps
    // the next bin's range within a group
    val ordered = got.toSeq.sortBy(r => (r._1, r._2))
    ordered.sliding(2).foreach {
      case Seq(a, b) if a._1 == b._1 => assert(a._6 < b._5)
      case _ =>
    }
  }

  test("q261 maintenance: datasheet over the WRITTEN stores ≡ corpus-derived slices; decisions honor the planner's threshold") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // (a) the written index store's generation sheet equals the sheet
    // of a from-scratch slice derivation — the store-vs-log identity
    // at the maintenance grain
    val storeSheet = Profile.sliceDatasheet(Stores.index(spark, dir),
        "slice", Seq("token", "doc_id"), "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val logSheet = Profile.sliceDatasheet(
        graft.ops.TextAnalysis.indexSlices(
          Tables.documents(spark, dir)
            .withColumn("slice", pmod($"doc_id", lit(4))),
          "doc_id", "text", "slice"),
        "slice", Seq("token", "doc_id"), "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(storeSheet === logSheet && storeSheet.size === 4)
    // (b) the decision respects the planner's threshold contract:
    // bins partition the generations into contiguous id ranges, and a
    // bin starts exactly where the running row offset crosses a
    // multiple of the target (replayed here from the same sheet)
    val target = 600L
    val sheet = storeSheet.toSeq.map(r => (r._1, r._2)).sortBy(_._1)
    val plan = Profile.compactionPlan(
        sheet.toDF("slice", "n_rows").withColumn("store", lit("idx")),
        "store", "slice", "n_rows", targetBytes = target)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val expected = {
      var before = 0L
      sheet.map { case (slice, n) =>
        val bin = before / target; before += n; (slice, bin)
      }.groupBy(_._2).map { case (bin, gs) =>
        ("idx", bin, gs.size.toLong,
          gs.map(g => sheet.find(_._1 == g._1).get._2).sum,
          gs.map(_._1).min, gs.map(_._1).max)
      }.toSet
    }
    assert(plan === expected)
    // contiguity: gen ranges tile [0..3] without overlap
    val ranges = plan.toSeq.sortBy(_._5).map(p => (p._5, p._6))
    assert(ranges.head._1 === 0L && ranges.last._2 === 3L)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(lo2 === hi + 1)
      case _ =>
    }
  }

  test("fkAudit: orphans vs null keys kept apart; duplicate parent keys don't double-count; zero-orphan edge emits") {
    import org.apache.spark.sql.functions.col
    val child = Seq[(java.lang.Long, String)](
      (1L, "r1"), (1L, "r2"), (2L, "r3"), (7L, "r4"), (7L, "r5"),
      (null, "r6")).toDF("fk_id", "payload")
    // parent holds 1 twice (dup rows must not double the join) and 2
    val parent = Seq(1L, 1L, 2L, 3L).toDF("id")
    val got = Profile.fkAudit(child, "fk_id", parent, "id", "edge")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // 6 rows, 1 null row, 3 distinct non-null keys, orphan key 7 = 2 rows
    assert(got === Seq(("edge", 6L, 1L, 3L, 2L, 1L)))
    // complete edge: the green row still emits, all zeros where it counts
    val clean = Profile.fkAudit(child.filter(col("fk_id") <= 2),
        "fk_id", parent, "id", "clean")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(clean === Seq(("clean", 3L, 0L, 2L, 0L, 0L)))
  }
}
