package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubwordCount
import graft.ops.{Pq, TextAnalysis}

/** Seeded randomized checks of the round-9 operators against plain-
  * Scala reference implementations — an assurance axis independent of
  * both the hand-picked spec fixtures and the DuckDB oracles (which
  * could in principle share a misunderstanding with the Spark code;
  * a second independent implementation cannot share a bug with
  * either by accident on hundreds of random inputs). Seeds are fixed:
  * failures reproduce.
  */
class RandomizedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Reference greedy longest-match count — independent implementation
    * (per-word recursion, substring set probe) of the SubwordCount
    * contract.
    */
  private def refSubwordCount(text: String, vocab: Set[String]): Long = {
    def word(w: String): Long = {
      var pos = 0
      var n = 0L
      while (pos < w.length) {
        val best = (w.length - pos).to(1, -1)
          .find(l => vocab.contains(w.substring(pos, pos + l)))
        pos += best.getOrElse(1)
        n += 1
      }
      n
    }
    text.split(" ", -1).map(word).sum
  }

  test("subword_count matches an independent greedy reference on 300 random docs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    def randWord(): String =
      (0 until (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val vocab = (0 until 30).map(_ => randWord()).distinct
    val docs = (0 until 300).map { i =>
      val words = (0 until rnd.nextInt(8)).map(_ => randWord())
      // stress boundaries: occasional empty word runs / empty docs
      val text = if (i % 17 == 0) "" else words.mkString(if (i % 5 == 0) "  " else " ")
      (i.toLong, text)
    }
    val got = docs.toDF("id", "text")
      .select(col("id"), SubwordCount(spark, col("text"), vocab).as("n"))
      .as[(Long, Long)].collect().toMap
    val vs = vocab.toSet
    docs.foreach { case (id, text) =>
      assert(got(id) === refSubwordCount(text, vs),
        s"doc $id '$text' vocab ${vocab.mkString(",")}")
    }
  }

  test("chunkWords intervals cover each document exactly, in step positions, no subset chunks") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 120).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
    }
    for ((chunk, overlap) <- Seq((8, 3), (5, 0), (4, 3))) {
      val step = chunk - overlap
      val out = TextAnalysis.chunkWords(docs.toDF("doc_id", "text"),
          "doc_id", "text", chunkWords = chunk, overlapWords = overlap)
        .select("doc_id", "chunk_id", "start_word", "n_words")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
      docs.foreach { case (id, text) =>
        val size = text.split(" ").length
        val chunks = out(id)
        // starts are consecutive multiples of step from 0
        assert(chunks.map(_._3) === chunks.indices.map(_.toLong * step))
        // words covered exactly: union of [start, start+n) == [0, size)
        val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).distinct.sorted
        assert(covered === (0L until size), s"doc $id cover gap")
        // no chunk is a subset of its predecessor: each adds a new word
        chunks.sliding(2).foreach {
          case Array(a, b) => assert(b._3 + b._4 > a._3 + a._4, s"doc $id subset chunk")
          case _ =>
        }
      }
    }
  }

  test("winnow_fps matches a naive O(n·k·w) reference on 200 random ASCII texts") {
    // independent re-coding of the contract: hash every k-gram with the
    // rolling polynomial's DEFINITION (no rolling update), take plain
    // slice minima, distinct in first-occurrence order — any bug in the
    // deque/rolling-update optimization diverges here
    val B = 257L
    val M = 1000000007L
    def refFps(text: String, k: Int, w: Int): Seq[Long] = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val nH = math.max(n - k + 1, 1)
      val hs = (0 until nH).map { i =>
        bytes.slice(i, math.min(i + k, n))
          .foldLeft(0L)((h, b) => (h * B + (b & 0xffL)) % M)
      }
      val nW = math.max(nH - w + 1, 1)
      val mins = (0 until nW).map(i => hs.slice(i, math.min(i + w, nH)).min)
      mins.distinct
    }
    val rnd = new scala.util.Random(99)
    val texts = (0 until 200).map { i =>
      val len = rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    for ((k, w) <- Seq((8, 16), (3, 4), (1, 1))) {
      val got = texts.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.WinnowFps(spark, col("text"), k, w).as("fps"))
        .as[(Long, Seq[Long])].collect().toMap
      texts.foreach { case (id, t) =>
        assert(got(id) === refFps(t, k, w), s"doc $id k=$k w=$w '${t.take(40)}'")
      }
    }
  }

  test("dataset split partitions every row for random fraction vectors") {
    val rnd = new scala.util.Random(5)
    val df = (1L to 2000L).toDF("id")
    for (trial <- 0 until 5) {
      val cuts = Seq.fill(2)(0.05 + rnd.nextDouble() * 0.4)
      val fracs = Seq("a" -> cuts.head, "b" -> cuts(1),
        "c" -> (1.0 - cuts.sum))
      val out = graft.ops.Sampling.split(df, "id", fracs, salt = s"t$trial")
        .groupBy("split").count().as[(String, Long)].collect().toMap
      // exhaustive: every row labeled with one of the three names
      assert(out.values.sum === 2000L, s"trial $trial lost rows: $out")
      assert(out.keySet.subsetOf(Set("a", "b", "c")))
      // roughly proportional (hash uniformity; generous 10-point band)
      fracs.foreach { case (name, f) =>
        val got = out.getOrElse(name, 0L) / 2000.0
        assert(math.abs(got - f) < 0.1, s"trial $trial $name: $got vs $f")
      }
    }
  }

  test("CEP strict-contiguity pattern equals the lag-based detector on random event streams") {
    // the NFA (cep.CEP) and the window-lag form (SequenceDetect) claim
    // the same semantics for 2-consecutive-within-horizon; the driver
    // data proves it once (q09 ≡ q16) — random streams with duplicate
    // timestamps, interleaved keys, and boundary gaps prove the
    // equivalence isn't an artifact of that one dataset
    val rnd = new scala.util.Random(31)
    val events = (0 until 2500).map { i =>
      val user = rnd.nextInt(25).toLong
      // coarse second grid → plenty of exact-tie timestamps (the
      // (ts, id) tie-break must agree between both implementations)
      val ts = new java.sql.Timestamp(1700000000000L + rnd.nextInt(400) * 1000L)
      val tpe = if (rnd.nextBoolean()) "error" else "success"
      (user, ts, tpe, i.toLong)
    }
    val df = events.toDF("user_id", "ts", "event_type", "event_id")
    val lag = graft.ops.SequenceDetect.consecutiveFails(
        df, "user_id", "ts", "event_type", "event_id", "error", "90 SECONDS")
      .as[(Long, Long, Long, Long)].collect().toSet
    val cep = {
      val ev = df.select(col("user_id").cast("string").as("key"), col("ts"),
          col("event_type").as("eventType"), col("event_id").as("id"))
        .as[graft.cep.CepEvent]
      val p = graft.cep.Pattern.begin("first", _.eventType == "error")
        .next("second", _.eventType == "error")
        .within("90 seconds")
      graft.cep.CEP.detectBatch(ev, p)
        .map(m => (m.key.toLong, m.events.last.id,
          m.events.head.tsMs / 1000, m.events.last.tsMs / 1000))
        .collect().toSet
    }
    assert(lag === cep, s"lag-only: ${(lag -- cep).take(3)}; cep-only: ${(cep -- lag).take(3)}")
    assert(lag.nonEmpty, "degenerate run: no consecutive fails generated")
  }

  test("Misra-Gries bounds hold on random Zipfian, uniform, and all-distinct streams") {
    // the offset-form implementation must honor the textbook bounds on
    // every distribution shape — all-distinct exercises the O(1) debt
    // path on every row, Zipfian the mixed path, uniform the compactor
    val rnd = new scala.util.Random(23)
    val streams: Seq[(String, Seq[String])] = Seq(
      "zipf" -> (0 until 3000).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.3) "z0" else if (r < 0.45) "z1"
        else s"t${rnd.nextInt(400)}"
      },
      "uniform" -> (0 until 2000).map(_ => s"u${rnd.nextInt(50)}"),
      "distinct" -> (0 until 2000).map(i => s"d$i"))
    for ((label, words) <- streams; k <- Seq(5, 20)) {
      val got = words.toDF("term").repartition(8)
        .agg(graft.functions.TypedAggs.misraGries(col("term"), k).as("mg"))
        .select(explode(col("mg.entries")))
        .as[(String, Long)].collect().toMap
      assert(got.size <= k, s"$label k=$k overflowed: ${got.size}")
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = words.size.toLong / (k + 1)
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(got.contains(t), s"$label k=$k: $t freq $c > $bound missing")
      }
      got.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c, s"$label k=$k: $t overcounted $est > $c")
        assert(c - est <= bound, s"$label k=$k: $t undercount ${c - est} > $bound")
      }
    }
  }

  test("PQ encode picks the true argmin code per subspace on random vectors") {
    val rnd = new scala.util.Random(11)
    val dim = 8
    val m = 4
    val sub = dim / m
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(dim)((rnd.nextInt(2001) - 1000) / 100.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val cbs = Pq.codebooks(df, "vec_id", "embedding", m, sub,
      initIds = Seq(0L, 1L, 2L), iters = 0)
    val got = Pq.encode(df, "vec_id", "embedding", cbs, m, sub)
      .as[(Long, Long, Long)].collect()
      .map { case (v, s, c) => (v, s) -> c }.toMap
    val byId = vecs.toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((vid, vec) <- vecs; s <- 0 until m) {
      val slice = vec.slice(s * sub, (s + 1) * sub)
      // reference argmin with the operator's 6-digit rounding and
      // code-id tie-break, against ROUNDED (double) init codebooks
      val want = Seq(0L, 1L, 2L).minBy { c =>
        val cb = byId(c).slice(s * sub, (s + 1) * sub)
          .map(x => round6(x.toDouble))
        val sq = slice.zip(cb).map { case (x, y) =>
          val d = x.toDouble - y; d * d
        }.sum
        (round6(math.sqrt(sq)), c)
      }
      assert(got((vid, s.toLong)) === want, s"vec $vid sub $s")
    }
  }

  test("dropRepeatedSpans matches an independent reference on random corpora (seeded)") {
    val rnd = new scala.util.Random(53)
    val words = Array("a", "b", "c", "d", "boiler", "plate")
    val docs = (0 until 150).map { i =>
      val n = rnd.nextInt(12)
      val ws = (0 until n).map(_ => words(rnd.nextInt(words.length)))
      (i.toLong, ws.mkString(" "))
    }
    val spanW = 2; val maxCount = 3
    // reference: split → fixed windows → global counts → filter+rejoin
    def spansOf(text: String): Seq[String] =
      text.split(" ", -1).toSeq.grouped(spanW).map(_.mkString(" ")).toSeq
    val counts = docs.flatMap(d => spansOf(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = docs.map { case (id, text) =>
      val sp = spansOf(text)
      val kept = sp.filter(counts(_) <= maxCount)
      id -> ((sp.size.toLong, (sp.size - kept.size).toLong, kept.mkString(" ")))
    }.toMap
    val got = TextAnalysis.dropRepeatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", spanWords = spanW, maxCount = maxCount)
      .select("doc_id", "n_spans", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }

  test("importanceScore matches an independent smoothed-LLR reference (seeded)") {
    val rnd = new scala.util.Random(71)
    val vocabPool = Array("cat", "dog", "fox", "sun", "sea", "oak", "ice")
    val docs = (0 until 80).map { i =>
      val n = 1 + rnd.nextInt(10)
      val bias = if (i % 4 == 0) 2 else vocabPool.length // target favors first 2
      val ws = (0 until n).map(_ => vocabPool(rnd.nextInt(bias)))
      (i.toLong, ws.mkString(" "), if (i % 4 == 0) "tgt" else "web")
    }
    // reference model: add-one smoothing over the corpus vocabulary
    val allTf = docs.flatMap(d => d._2.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val tgtTf = docs.filter(_._3 == "tgt").flatMap(_._2.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (totalC, totalT, v) = (allTf.values.sum, tgtTf.values.sum, allTf.size.toLong)
    // mirror the operator's fold EXACTLY: tf per distinct term, terms
    // sorted, left-fold of tf·ln(ratio), HALF_UP round to 6
    val expect = docs.map { case (id, text, _) =>
      val terms = text.split(" ", -1)
      val tf = terms.groupBy(identity).view.mapValues(_.size).toMap
      val s = tf.keys.toSeq.sorted.foldLeft(0.0) { (a, w) =>
        a + tf(w) * math.log(((tgtTf.getOrElse(w, 0L) + 1).toDouble * (totalC + v)) /
          ((allTf(w) + 1).toDouble * (totalT + v)))
      }
      id -> ((terms.length.toLong,
        java.math.BigDecimal.valueOf(s / terms.length)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0))
    }.toMap
    val got = TextAnalysis.importanceScore(
        docs.toDF("doc_id", "text", "source"), "doc_id", "text",
        col("source") === "tgt")
      .select("doc_id", "n_words", "llr").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }

  test("epochAllocation invariants hold on random corpora (seeded)") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(13)
    for (round <- 0 until 5) {
      val strata = ('a' to ('a' + 2 + rnd.nextInt(4)).toChar).map(_.toString)
      val docs = (0 until 200).map { i =>
        (i.toLong, strata(rnd.nextInt(strata.size)), rnd.nextInt(50).toLong)
      }
      val weights = strata.take(2).map(_ -> (1L + rnd.nextInt(5))).toMap
      val budget = 1000L + rnd.nextInt(100000)
      val out = Sampling.epochAllocation(docs.toDF("doc_id", "src", "tok"),
          "doc_id", "src", "tok", weights, defaultWeight = 1L, budget = budget)
        .collect()
      val sumW = out.map(_.getAs[Long]("wt")).sum
      out.foreach { r =>
        val (wt, avail, target, epochs, rem, remDocs, remToks) =
          (r.getAs[Long]("wt"), r.getAs[Long]("avail_tokens"),
            r.getAs[Long]("target_tokens"), r.getAs[Long]("epochs"),
            r.getAs[Long]("rem_tokens"), r.getAs[Long]("rem_docs"),
            r.getAs[Long]("rem_kept_tokens"))
        assert(avail > 0 && wt > 0)
        assert(target === budget * wt / sumW) // floor div allocation
        assert(epochs * avail + rem === target) // exact decomposition
        assert(rem >= 0 && rem < avail)
        // the remainder pass picks within the stratum (zero-token docs
        // are eligible — they ride along adding no tokens)
        val nDocs = docs.count { case (_, s, _) =>
          s == r.getAs[String]("stratum") }
        assert(remDocs >= 0 && remDocs <= nDocs && remToks <= avail)
        if (rem == 0) assert(remDocs === 0 && remToks === 0)
      }
      // targets never over-spend the budget in total
      assert(out.map(_.getAs[Long]("target_tokens")).sum <= budget)
    }
  }

  test("semDedupLosers partitions ids: losers have a smaller same-cluster keeper (seeded)") {
    import graft.ops.{Dedup, Similarity}
    val rnd = new scala.util.Random(29)
    val dim = 8
    // half the corpus are jittered copies of 10 archetypes → real dups
    val protos = Vector.fill(10)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0 until 120).map { i =>
      val v =
        if (i < 10) protos(i)
        else if (i >= 60) protos(i % 10).map(x => x + rnd.nextFloat() * 0.01f)
        else Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val centroidIds = (0L until 6L)
    val assign = Similarity.ivfAssign(df, "vec_id", "embedding", centroidIds)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    val losers = Dedup.semDedupLosers(df, "vec_id", "embedding",
        centroidIds, threshold = 0.98)
      .select("vec_id", "centroid_id", "dup_of", "cosine")
      .as[(Long, Long, Long, Double)].collect()
    assert(losers.nonEmpty) // the jittered copies must trip the gate
    losers.foreach { case (id, cid, dupOf, cos) =>
      assert(dupOf < id, s"keeper $dupOf must be the smaller id (loser $id)")
      assert(assign(id) === cid && assign(dupOf) === cid,
        s"pair ($dupOf, $id) must share cluster $cid")
      assert(cos >= 0.98)
    }
    // losers are unique (one row per dropped member)
    assert(losers.map(_._1).distinct.length === losers.length)
  }

  test("growthAccounting matches an independent set-algebra reference on random activity matrices (seeded)") {
    import graft.ops.Behavior
    val rnd = new scala.util.Random(4247)
    for (trial <- 1 to 20) {
      val nUsers = 3 + rnd.nextInt(12)
      val nDays = 3 + rnd.nextInt(10)
      // mixed-congruential activity (the pseudo-noise rule), ~55% on
      val active = (for {
        u <- 1 to nUsers; d <- 1 to nDays
        if ((u * 2654435761L + d * 40503L + trial * 69427L) >>> 7) % 100 < 55
      } yield (u.toLong, d)).toSet
      if (active.nonEmpty) {
        val events = active.toSeq.flatMap { case (u, d) =>
            // duplicate events per user-day: the distinct rule
            Seq.fill(1 + ((u + d) % 2).toInt)((u, d)) }
          .toDF("user_id", "d")
          .select($"user_id",
            to_timestamp(concat(lit("2024-02-"), format_string("%02d", $"d"),
              lit(" 08:00:00"))).as("ts"))
        val got = Behavior.growthAccounting(events, "user_id", "ts")
          .select(dayofmonth($"day"), $"new_users", $"retained_users",
            $"resurrected_users", $"churned_users")
          .as[(Int, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
        // independent reference: plain set algebra over the matrix
        val maxDay = active.map(_._2).max
        val byDay = (1 to maxDay).map(d =>
          d -> active.filter(_._2 == d).map(_._1)).toMap
        val firstDay = active.groupBy(_._1).map { case (u, s) =>
          u -> s.map(_._2).min }
        for (d <- 1 to maxDay) {
          val today = byDay(d)
          val yday = if (d > 1) byDay(d - 1) else Set.empty[Long]
          val nNew = today.count(u => firstDay(u) == d)
          val nRet = (today & yday).size
          val nRes = today.size - nNew - nRet
          val nChu = if (d > 1) (yday -- today).size else 0
          val exp = (nNew.toLong, nRet.toLong, nRes.toLong, nChu.toLong)
          val g = got.getOrElse(d, (0L, 0L, 0L, 0L))
          assert(g === exp, s"trial $trial day $d: got $g expected $exp")
        }
      }
    }
  }

  test("kHopDistances equals brute-force BFS on random graphs (seeded)") {
    import graft.ops.Graph
    val rnd = new scala.util.Random(4246)
    for (trial <- 1 to 15) {
      val n = 5 + rnd.nextInt(15)
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n
        if ((a * 48271L + b * 16807L + trial * 69427L) >>> 5) % 100 < 18
      } yield (a.toLong, b.toLong)).toSeq
      val seeds = (1 to n).filter(u =>
        (u * 7919L + trial) % 7 == 0).map(_.toLong)
      if (edges.nonEmpty && seeds.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val got = Graph.kHopDistances(edges.toDF("a", "b"), "a", "b",
            seeds.toDF("id"), "id", rounds)
          .as[(Long, Long)].collect().toMap
        // reference BFS
        val adj = (edges ++ edges.map(e => (e._2, e._1)))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        var dist = seeds.map(_ -> 0L).toMap
        var frontier = seeds.toSet
        for (r <- 1 to rounds) {
          val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty))
            .filterNot(dist.contains)
          dist = dist ++ next.map(_ -> r.toLong)
          frontier = next
        }
        assert(got === dist, s"trial $trial rounds $rounds")
      }
    }
  }

  test("positional store: random slice splits with offsets merge to the rescan; phrase counts match plain Scala (seeded)") {
    val rnd = new scala.util.Random(1747)
    val alphabet = Seq("aa", "ab", "ac")
    for (trial <- 1 to 10) {
      val docs = (1 to 3 + rnd.nextInt(8)).map { id =>
        val words = Seq.fill(1 + rnd.nextInt(12))(
          alphabet(rnd.nextInt(alphabet.size)))
        (id.toLong, words.mkString(" "))
      }
      // split each doc into 1–3 contiguous parts carrying their global
      // start offset; parts land in random slices (two parts of one
      // doc may share a slice — the within-slice aggregate must still
      // merge right)
      val parts = docs.flatMap { case (id, text) =>
        val ws = text.split(" ").toSeq
        val cuts = (Seq(0, ws.length) ++
          Seq.fill(rnd.nextInt(3))(rnd.nextInt(ws.length + 1)))
          .distinct.sorted
        cuts.zip(cuts.tail).map { case (lo, hi) =>
          (id, rnd.nextInt(4).toLong, ws.slice(lo, hi).mkString(" "), lo)
        }
      }
      val slices = TextAnalysis.positionalSlices(
        parts.toDF("doc_id", "slice", "text", "off"),
        "doc_id", "text", "slice", offsetCol = Some("off"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select($"token", $"doc_id", $"tf", $"positions")
          .as[(String, Long, Long, Seq[Int])].collect().toSet
      val merged = canon(TextAnalysis.positionalMergeSlices(slices))
      val rescan = canon(TextAnalysis.positionalPostings(
        docs.toDF("doc_id", "text"), "doc_id", "text"))
      assert(merged === rescan, s"trial $trial")
      // phrase counts off the merged store vs an independent per-doc
      // sliding-window count
      val (w1, w2) = (alphabet(rnd.nextInt(alphabet.size)),
        alphabet(rnd.nextInt(alphabet.size)))
      val got = TextAnalysis.phraseQuery(
          TextAnalysis.positionalMergeSlices(slices),
          Seq((w1, w2)).toDF("w1", "w2"), k = 100)
        .select($"doc_id", $"n_matches").as[(Long, Long)]
        .collect().toMap
      val exp = docs.map { case (id, text) =>
        val ws = text.split(" ").toSeq
        id -> ws.zip(ws.drop(1)).count(p => p._1 == w1 && p._2 == w2).toLong
      }.filter(_._2 > 0).toMap
      assert(got === exp, s"trial $trial terms ($w1 $w2)")
    }
  }

  test("phraseQueryK matches a plain-Scala sliding window on random corpora and random phrases (seeded)") {
    val rnd = new scala.util.Random(2653)
    val alphabet = Seq("aa", "ab", "ac")
    for (trial <- 1 to 10) {
      val docs = (1 to 3 + rnd.nextInt(8)).map { id =>
        (id.toLong, Seq.fill(2 + rnd.nextInt(14))(
          alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val pidx = TextAnalysis.positionalPostings(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      // random phrase of length 2–4 — the small alphabet makes
      // duplicate tokens at several ords common
      val phrase = Seq.fill(2 + rnd.nextInt(3))(
        alphabet(rnd.nextInt(alphabet.size)))
      val got = TextAnalysis.phraseQueryK(pidx,
          phrase.zipWithIndex.map { case (t, i) => (i, t) }
            .toDF("ord", "token"), k = 100)
        .select($"doc_id", $"n_matches").as[(Long, Long)]
        .collect().toMap
      val exp = docs.map { case (id, text) =>
        val ws = text.split(" ").toSeq
        id -> ws.sliding(phrase.size)
          .count(win => win.size == phrase.size && win == phrase).toLong
      }.filter(_._2 > 0).toMap
      assert(got === exp, s"trial $trial phrase $phrase")
    }
  }

  test("edge warehouse: random slice splits and partial retractions merge to multiset counts (seeded)") {
    import graft.ops.Graph
    val rnd = new scala.util.Random(9217)
    for (trial <- 1 to 12) {
      val pairs = Seq.fill(5 + rnd.nextInt(40))(
        (1L + rnd.nextInt(5), 1L + rnd.nextInt(5)))
      val sliced = pairs.map(p => (p._1, p._2, rnd.nextInt(3).toLong))
      // retract a random sub-multiset of the ingested occurrences
      val retract = pairs.filter(_ => rnd.nextInt(10) < 3)
      val ingest = Graph.edgeSlices(
        sliced.toDF("a", "b", "slice"), "a", "b", "slice")
      val tomb = Graph.edgeTombstones(
        retract.map(p => (p._1, p._2, 9L)).toDF("a", "b", "slice"),
        "a", "b", "slice")
      val merged = Graph.edgeMerge(ingest.unionByName(tomb))
        .as[(Long, Long, Long)].collect().toSet
      val counts = pairs.groupBy(identity).view.mapValues(_.size).toMap
      val rcounts = retract.groupBy(identity).view.mapValues(_.size).toMap
      val exp = counts.map { case (p, n) =>
        (p._1, p._2, (n - rcounts.getOrElse(p, 0)).toLong)
      }.filter(_._3 > 0).toSet
      assert(merged === exp, s"trial $trial")
    }
  }

  /** Reference Levenshtein — independent DP implementation for the
    * dictionary-family candidate-filter properties below.
    */
  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion-neighborhood completeness: every lev<=1 string pair shares a variant (2000 random pairs)") {
    // the guarantee fuzzyTerms' candidate filter rests on: if
    // lev(a,b) <= 1 then variants(a) ∩ variants(b) is non-empty —
    // checked against the independent DP on random short strings over
    // a tiny alphabet (maximizing collisions and near-misses)
    val rnd = new scala.util.Random(1318)
    def randS(): String =
      (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    var nearPairs = 0
    for (_ <- 1 to 2000) {
      val a = randS(); val b = randS()
      val share = (TextAnalysis.deletionVariants(a).toSet
        intersect TextAnalysis.deletionVariants(b).toSet).nonEmpty
      if (refLev(a, b) <= 1) { nearPairs += 1; assert(share, s"'$a' '$b'") }
    }
    assert(nearPairs > 100) // the property was actually exercised
  }

  test("trigram-coverage completeness: a contained infix's grams are always covered (1000 random pairs)") {
    // the guarantee infixSearch's AND filter rests on: if q is a
    // substring of t (and |q| >= 3) then charTrigrams(q) ⊆
    // charTrigrams(t) — so gram-AND candidates can only OVER-select
    // (fixed by the contains verify), never miss a true match
    val rnd = new scala.util.Random(1319)
    def randS(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    var contained = 0
    for (_ <- 1 to 1000) {
      val t = randS(4 + rnd.nextInt(8))
      val from = rnd.nextInt(t.length - 2)
      val q = t.substring(from, math.min(t.length, from + 3 + rnd.nextInt(4)))
      assert(q.length >= 3 && t.contains(q))
      contained += 1
      assert(TextAnalysis.charTrigrams(q).toSet
        .subsetOf(TextAnalysis.charTrigrams(t).toSet), s"'$q' in '$t'")
    }
    assert(contained === 1000)
  }

  test("passageSearch degenerates to bm25QueryK when every doc fits one chunk (seeded random corpora)") {
    // with doc length <= chunk width the chunk domain IS the doc
    // domain (one chunk per doc, chunk 0, n_chunks = n_docs, same
    // df), so MaxP must reproduce the plain doc-level ranking exactly
    // — the identity that pins the composite-key plumbing and the
    // argmax against the established read
    val rnd = new scala.util.Random(2861)
    val vocab = Vector("hash", "join", "scan", "sort", "agg", "map")
    for (trial <- 1 to 8) {
      val docs = (0 until 12 + rnd.nextInt(8)).map { i =>
        (i.toLong,
          (0 until 1 + rnd.nextInt(18))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val posts = TextAnalysis.tokenPostings(df, "doc_id", "text")
      val idx = TextAnalysis.cappedIndex(posts, 1000)
      val nd = df.agg(countDistinct($"doc_id").as("n_docs"))
      val chunks = TextAnalysis.chunkWords(df, "doc_id", "text",
        chunkWords = 32, overlapWords = 8)
      val cidx = TextAnalysis.cappedIndex(
        TextAnalysis.tokenPostings(
          chunks.select(($"doc_id" * 100000L + $"chunk_id").as("cid"),
            $"chunk"), "cid", "chunk"), 1000)
      val nc = chunks.agg(count(lit(1)).as("n_chunks"))
      val q = (0 until 1 + rnd.nextInt(3))
        .map(i => (i.toLong, vocab(rnd.nextInt(vocab.size)))).distinct
        .groupBy(_._2).map(_._2.head).toSeq // unique tokens, keep ords
        .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      val doc = TextAnalysis.bm25QueryK(idx, nd,
          q.toDF("ord", "token"), nTerms = q.size, k = 50).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_hit"),
          r.getAs[Double]("score"), r.getAs[Long]("rk"))).toSet
      val pas = TextAnalysis.passageSearch(cidx, nc,
          q.toDF("ord", "token"), nTerms = q.size, k = 50).collect()
        .map { r =>
          assert(r.getAs[Long]("chunk_id") === 0L, s"trial $trial")
          (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_hit"),
            r.getAs[Double]("score"), r.getAs[Long]("rk"))
        }.toSet
      assert(pas === doc, s"trial $trial")
    }
  }

  test("collapseSearch matches a plain-Scala reference on random corpora and random cluster maps (seeded)") {
    val rnd = new scala.util.Random(4099)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(10)
      val docs = (0 until n).map { i =>
        (i.toLong,
          (0 until 1 + rnd.nextInt(12))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val posts = TextAnalysis.tokenPostings(df, "doc_id", "text")
      val idx = TextAnalysis.cappedIndex(posts, 1000)
      val nd = df.agg(countDistinct($"doc_id").as("n_docs"))
      // random rep map over a random subset of docs
      val rep = docs.map(_._1).filter(_ => rnd.nextBoolean())
        .map(d => (d, rnd.nextInt(4).toLong)).toMap
      val terms = Seq((0L, "a"), (1L, "b"))
      val got = TextAnalysis.collapseSearch(idx, nd,
          terms.toDF("ord", "token"), nTerms = 2, k = 50,
          dupMap = rep.toSeq.toDF("doc_id", "rep")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
          r.getAs[Long]("n_terms_hit"), r.getAs[Double]("score"),
          r.getAs[Long]("rk"))).toSet
      // plain-Scala reference: same impact arithmetic (exact integer
      // products in double, one division, ord-ordered sum)
      val tf = docs.flatMap { case (d, t) =>
        t.split(" ").groupBy(identity).map { case (w, g) =>
          ((w, d), g.length.toLong) } }.toMap
      val dfm = tf.keys.groupBy(_._1).map { case (w, g) => (w, g.size.toLong) }
      val nDocs = n.toLong
      def s(w: String, d: Long): Option[Double] =
        tf.get((w, d)).map { f =>
          (11.0 * f * (2 * nDocs - 2 * dfm(w) + 1)) /
            ((5.0 * f + 6) * (2 * dfm(w) + 1)) }
      val scored = docs.map(_._1).flatMap { d =>
        val parts = terms.map { case (_, w) => s(w, d) }
        if (parts.forall(_.isEmpty)) None
        else Some((d, parts.count(_.isDefined).toLong,
          parts.map(_.getOrElse(0.0)).reduceLeft(_ + _)))
      }
      val byGroup = scored.groupBy { case (d, _, _) => rep.getOrElse(d, d) }
      val champs = byGroup.toSeq.map { case (g, rows) =>
        val best = rows.minBy { case (d, _, sc) => (-sc, d) }
        (best._1, g, best._2, best._3)
      }
      val expect = champs.sortBy { case (d, _, _, sc) => (-sc, d) }
        .zipWithIndex
        .map { case ((d, g, h, sc), i) =>
          (d, g, h, math.rint(sc * 1e6) / 1e6, (i + 1).toLong) }.toSet
      assert(got === expect, s"trial $trial")
    }
  }

  test("erasure identities on random corpora: tombstone-merged index AND delta-derived dictionary ≡ corpus-minus rescans (seeded)") {
    val rnd = new scala.util.Random(0xE245)
    val vocabWords = Vector("ant", "bee", "cat", "dog", "elk", "fox",
      "gnu", "hen", "ibex", "jay")
    for (trial <- 1 to 8) {
      val docs = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(12)
        (id, Seq.fill(n)(vocabWords(rnd.nextInt(vocabWords.size)))
          .mkString(" "))
      }
      val forget = docs.map(_._1).filter(_ => rnd.nextDouble() < 0.25)
      val d = docs.toDF("doc_id", "text")
        .withColumn("slice", pmod($"doc_id", lit(3)))
      val ing = TextAnalysis.indexSlices(d, "doc_id", "text", "slice")
      val tomb = TextAnalysis.indexTombstones(
        d.filter($"doc_id".isin(forget: _*))
          .withColumn("slice", lit(9L)),
        "doc_id", "text", "slice")
      val merged = ing.unionByName(tomb)
      val survivors = d.filter(!$"doc_id".isin(forget: _*))
      // exact-index identity: erased merge ≡ surviving-corpus rescan
      val gotIdx = TextAnalysis.indexMergeSlices(merged)
        .as[(String, Long, Long)].collect().toSet
      val expIdx = TextAnalysis.indexMergeSlices(
          TextAnalysis.indexSlices(survivors, "doc_id", "text", "slice"))
        .as[(String, Long, Long)].collect().toSet
      assert(gotIdx === expIdx, s"trial $trial index")
      // dictionary identity through the DELTA store (never rebuilt)
      val gotDict = TextAnalysis.dictMergeSlices(
          TextAnalysis.dictSlices(merged))
        .as[(String, Long, Long)].collect().toSet
      val expDict = TextAnalysis.termDictionary(
          TextAnalysis.indexMergeSlices(
            TextAnalysis.indexSlices(survivors, "doc_id", "text",
              "slice")))
        .as[(String, Long, Long)].collect().toSet
      assert(gotDict === expDict, s"trial $trial dict")
      // and the variant expansion commutes with the delta fold
      val gotNeigh = TextAnalysis.delneighMergeSlices(
          TextAnalysis.delneighSlices(TextAnalysis.dictSlices(merged)))
        .as[(String, String, Long)].collect().toSet
      val expNeigh = TextAnalysis.deletionNeighborhood(
          expDict.toSeq.toDF("token", "df", "cf"))
        .as[(String, String, Long)].collect().toSet
      assert(gotNeigh === expNeigh, s"trial $trial delneigh")
    }
  }

  test("partial per-bin compaction is closed under ANY contiguous bin partition: compact-then-merge ≡ strict merge (seeded)") {
    // the ADVICE-r19 scenario randomized: forget tombstones carry
    // negative slice ids, the planner bins slices by ordered id, so a
    // tombstone can bin APART from the ingest slices it cancels — the
    // partial compact functions must preserve the negative partials
    // so the read-time strict merge still cancels exactly, for EVERY
    // possible contiguous partition the planner could emit
    val rnd = new scala.util.Random(0xC20)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox",
      "gnu", "hen")
    for (trial <- 1 to 8) {
      val docs = (1L to 30L).map { id =>
        (id, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val forget = docs.map(_._1).filter(_ => rnd.nextDouble() < 0.3)
      val d = docs.toDF("doc_id", "text")
        .withColumn("slice", pmod($"doc_id", lit(3)))
      val fd = d.filter($"doc_id".isin(forget: _*))
        .withColumn("slice", lit(-1L))
      val slices = TextAnalysis.indexSlices(d, "doc_id", "text", "slice")
        .unionByName(TextAnalysis.indexTombstones(fd, "doc_id", "text",
          "slice"))
      val csl = TextAnalysis.collocSlices(d, "text", "slice")
        .unionByName(TextAnalysis.collocTombstones(fd, "text", "slice"))
      val dsl = TextAnalysis.dictSlices(slices)
      val ids = Seq(-1L, 0L, 1L, 2L)
      // a random contiguous partition of the ordered ids — exactly
      // the bin shapes Profile.compactionPlan can emit
      val cuts = (1 until ids.size).filter(_ => rnd.nextBoolean())
      val bins = (Seq(0) ++ cuts ++ Seq(ids.size)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => ids.slice(a, b) }.toSeq
      def roundTrip[T](all: org.apache.spark.sql.DataFrame,
                       compactFn: (org.apache.spark.sql.DataFrame, Long)
                         => org.apache.spark.sql.DataFrame,
                       merge: org.apache.spark.sql.DataFrame
                         => org.apache.spark.sql.DataFrame)
                      (implicit e: org.apache.spark.sql.Encoder[T]) = {
        val compacted = bins.map(b =>
            compactFn(all.filter($"slice".isin(b: _*)),
              math.max(b.min, 0L)))
          .reduce(_.unionByName(_))
        (merge(compacted).as[T].collect().toSet,
         merge(all).as[T].collect().toSet)
      }
      val (gi, wi) = roundTrip[(String, Long, Long)](slices,
        TextAnalysis.indexCompactPartial, TextAnalysis.indexMergeSlices)
      assert(gi === wi, s"trial $trial index bins=$bins")
      val (gd, wd) = roundTrip[(String, Long, Long)](dsl,
        TextAnalysis.dictCompactPartial, TextAnalysis.dictMergeSlices)
      assert(gd === wd, s"trial $trial dict bins=$bins")
      val (gc, wc) = roundTrip[(String, String, Long)](csl,
        TextAnalysis.collocCompactPartial, TextAnalysis.collocMergeSlices)
      assert(gc === wc, s"trial $trial colloc bins=$bins")
      val (gn, wn) = roundTrip[(String, String, Long)](
        TextAnalysis.delneighSlices(dsl),
        TextAnalysis.delneighCompactPartial,
        TextAnalysis.delneighMergeSlices)
      assert(gn === wn, s"trial $trial delneigh bins=$bins")
      // the edge family's exposure is the same shape with RETRACTIONS
      // in place of tombstones (negative w rows in their own slice)
      val pairs = (1 to 120).map(_ =>
        ((rnd.nextInt(6) + 1).toLong, (rnd.nextInt(6) + 1).toLong))
      val epos = graft.ops.Graph.edgeSlices(
        pairs.zipWithIndex.map { case ((a, b), i) => (a, b, (i % 3).toLong) }
          .toDF("src", "dst", "slice"),
        "src", "dst", "slice")
      val eneg = pairs.distinct.filter(_ => rnd.nextDouble() < 0.3)
        .map { case (a, b) => (-1L, a, b, -1L) }
        .toDF("slice", "src", "dst", "w")
      val (ge, we) = roundTrip[(Long, Long, Long)](
        epos.unionByName(eneg),
        graft.ops.Graph.edgeCompactPartial, graft.ops.Graph.edgeMerge)
      assert(ge === we, s"trial $trial edges bins=$bins")
    }
  }

  test("nearDupAgainstStore ≡ an independent band join on random corpora (seeded)") {
    val rnd = new scala.util.Random(0xBA2D)
    val words = Vector("sun", "sea", "sand", "salt", "moon", "star",
      "wind", "wave")
    def doc(): String = {
      val n = 3 + rnd.nextInt(8)
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    }
    for (trial <- 1 to 6) {
      val oldDocs = (1L to 25L).map(id => (id, doc()))
      // new slice: some fresh text, some exact re-crawls of old docs
      val newDocs = (100L to 109L).map { id =>
        if (rnd.nextBoolean()) (id, oldDocs(rnd.nextInt(25))._2)
        else (id, doc())
      }
      val store = graft.ops.Dedup.minhashBands(
        oldDocs.toDF("doc_id", "text"), "doc_id", "text")
      val got = graft.ops.Dedup.nearDupAgainstStore(
          newDocs.toDF("doc_id", "text"), "doc_id", "text", store)
        .as[(Long, Long, Long)].collect().toSet
      val nb = graft.ops.Dedup.minhashBands(
          newDocs.toDF("doc_id", "text"), "doc_id", "text")
        .select($"doc_id".as("new_id"), $"band_id", $"band_hash")
      val expect = nb.join(store, Seq("band_id", "band_hash"))
        .groupBy($"new_id", $"doc_id".as("corpus_id"))
        .agg(count(lit(1)).as("n_bands"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expect, s"trial $trial")
      // every exact re-crawl collides on ALL bands
      for ((nid, txt) <- newDocs; (oid, otxt) <- oldDocs
           if txt == otxt)
        assert(got.contains((nid, oid, 4L)), s"trial $trial $nid->$oid")
    }
  }

  test("dupMapIngest ≡ full re-clustering on random pair sets (seeded)") {
    val rnd = new scala.util.Random(0xD0B1)
    for (trial <- 1 to 8) {
      // old pairs over ids 1..20, new pairs over ids 1..30 — bridges,
      // brand-new components, and new-min relabels all arise
      val oldPairs = Seq.fill(12)(
        (1L + rnd.nextInt(20), 1L + rnd.nextInt(20)))
        .filter(p => p._1 != p._2)
      val newPairs = Seq.fill(8)(
        (1L + rnd.nextInt(30), 1L + rnd.nextInt(30)))
        .filter(p => p._1 != p._2)
      if (oldPairs.nonEmpty && newPairs.nonEmpty) {
        val oldMap = graft.ops.Dedup.connectedComponents(
            oldPairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
          .select($"id".as("doc_id"), $"component".as("rep"))
        val got = graft.ops.Dedup.dupMapIngest(oldMap,
            newPairs.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toSet
        val rebuild = graft.ops.Dedup.connectedComponents(
            (oldPairs ++ newPairs).toDF("doc_a", "doc_b"),
            "doc_a", "doc_b")
          .select($"id".as("doc_id"), $"component".as("rep"))
          .as[(Long, Long)].collect().toSet
        assert(got === rebuild, s"trial $trial")
      }
    }
  }
}
