package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen => SGen, Prop, Test => SCTest}

import graft.operators.AsOf

/** Property-based checks (ScalaCheck) for the operators whose edge cases are
  * time/boundary-driven: session windows, tumbling windows, as-of joins —
  * each against a brute-force in-JVM reference implementation on arbitrary
  * small inputs.
  */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, tests: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(tests).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  import spark.implicits._

  private val base = 1700000000000L
  private val tsGen = SGen.chooseNum(0L, 7200L) // seconds over 2 h
  private val rowsGen = SGen.listOfN(60, SGen.zip(SGen.chooseNum(1L, 4L), tsGen))

  test("q31 incremental merge equals the from-scratch recompute exactly") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val out = Registry.byName("q31_incremental_agg").run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val full = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(3) / r.getLong(2))).toMap
    assert(out.keySet === full.keySet)
    // decimal merge is exact, so every field matches BIT-equal, not approx
    out.foreach { case (k, v) => assert(v === full(k), s"merge drift at $k") }
  }

  test("property: session_window islands match brute-force reference") {
    val gapSec = 300L
    val prop = Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (u, s) => (u, new Timestamp(base + s * 1000)) }
          .toDF("user_id", "ts")
        val got = df.groupBy(session_window(col("ts"), s"$gapSec seconds"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), unix_millis(col("session_window.start")).as("s"),
            unix_millis(col("session_window.end")).as("e"), col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        // reference: sort per user, split where gap >= gapSec
        val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
          val ts = rs.map(_._2 * 1000 + base).sorted
          // Spark merges an event landing EXACTLY at the previous session's
          // end (gap boundary inclusive) — found by this very property test
          val islands = ts.foldLeft(List.empty[List[Long]]) {
            case (Nil, t) => List(List(t))
            case (cur :: done, t) =>
              if (t - cur.head <= gapSec * 1000) (t :: cur) :: done
              else List(t) :: cur :: done
          }
          islands.map(i => (u, i.last, i.head + gapSec * 1000, i.size.toLong))
        }.toSet
        got == want
      }
    }
    check(prop)
  }

  test("property: tumbling windows conserve rows and align starts") {
    val prop = Prop.forAll(rowsGen, SGen.oneOf(60L, 600L, 3600L)) { (rows, winSec) =>
      rows.isEmpty || {
        val df = rows.map { case (u, s) => (u, new Timestamp(base + s * 1000)) }
          .toDF("user_id", "ts")
        val out = df.groupBy(window(col("ts"), s"$winSec seconds"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("window.start")).as("ws"), col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        out.map(_._2).sum == rows.size &&
          out.forall(_._1 % (winSec * 1000) == 0) &&
          out.map(_._1).distinct.length == out.length
      }
    }
    check(prop)
  }

  test("property: TokenSimHash matches a JVM brute-force SimHash") {
    val wordGen = SGen.listOfN(8, SGen.alphaLowerChar).map(_.mkString)
    val docGen = SGen.nonEmptyListOf(wordGen)
    val prop = Prop.forAll(SGen.listOfN(5, docGen)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = df
        .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("toks"))
        .select(col("doc_id"), graft.functions.TokenSimHash.simhash(col("toks"), 48).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.zipWithIndex.map { case (ws, i) =>
        val sums = new Array[Int](48)
        ws.foreach { w =>
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(w.getBytes("UTF-8"))
          val v = (0 until 8).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xffL)) >>> 4
          (0 until 48).foreach(j => if (((v >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1)
        }
        i.toLong -> (0 until 48).foldLeft(0L)((acc, j) =>
          if (sums(j) > 0) acc | (1L << j) else acc)
      }.toMap
      got == want
    }
    check(prop)
  }

  test("property: capped pair explosion yields exactly the a<b pairs per bucket") {
    val idsGen = SGen.listOf(SGen.chooseNum(0L, 30L)).map(_.distinct)
    val prop = Prop.forAll(SGen.nonEmptyListOf(idsGen)) { buckets =>
      val df = buckets.zipWithIndex
        .map { case (ids, i) => (i.toLong, ids.sorted.toArray) }
        .toDF("bucket", "ids")
        .filter(size(col("ids")) >= 2)
      val got = df.select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(slice(ids, i + 1, size(ids) - i),
          |    b -> struct(element_at(ids, i) AS a, b AS b))))"""
          .stripMargin.replace("\n", " "))).as("p"))
        .select(col("p.a"), col("p.b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = buckets.flatMap { ids =>
        val s = ids.sorted
        for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
      }.groupBy(identity).view.mapValues(_.size).toMap
      got == want
    }
    check(prop)
  }

  test("property: asofJoin matches brute-force latest-at-or-before lookup") {
    val leftGen = SGen.listOfN(25, SGen.zip(SGen.chooseNum(1L, 3L), tsGen))
    val rightGen = SGen.listOfN(25, SGen.zip(SGen.chooseNum(1L, 3L), SGen.zip(tsGen, SGen.chooseNum(1, 100))))
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs0) =>
      (ls.isEmpty || rs0.isEmpty) || {
        // unique (key, ts) on the right, as the operator requires
        val rs = rs0.map { case (k, (t, v)) => ((k, t), v) }.toMap.toList
          .map { case ((k, t), v) => (k, t, v) }
        val left = ls.zipWithIndex
          .map { case ((u, s), i) => (u, new Timestamp(base + s * 1000), i.toLong) }
          .toDF("k", "ts", "lid")
        val right = rs.map { case (u, s, v) => (u, new Timestamp(base + s * 1000), v) }
          .toDF("k", "ts", "v")
        val got = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
          .select(col("lid"), col("v")).collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
          .toMap
        val want = ls.zipWithIndex.map { case ((u, s), i) =>
          val candidates = rs.filter(r => r._1 == u && r._2 <= s)
          i.toLong -> candidates.sortBy(_._2).lastOption.map(_._3)
        }.toMap
        got == want
      }
    }
    check(prop, tests = 10)
  }

  // qa04b's equivalence claim, pinned on arbitrary inputs: the ONE-shuffle
  // pitMulti (all feature carries in a single Window) must equal the
  // N-shuffle sequential asofJoin composition feature-for-feature — any
  // divergence in tie handling (__is_obs ordering) or per-column carry
  // independence shows up here before it could reach a gate.
  test("property: pitMulti equals sequential asofJoin composition on 3 features") {
    val obsGen = SGen.listOfN(20, SGen.zip(SGen.chooseNum(1L, 3L), tsGen))
    val featGen = SGen.listOfN(15,
      SGen.zip(SGen.chooseNum(1L, 3L), SGen.zip(tsGen, SGen.chooseNum(1, 100))))
    val prop = Prop.forAll(obsGen, featGen, featGen, featGen) { (os, f1, f2, f3) =>
      os.isEmpty || {
        def featDf(rows: List[(Long, (Long, Int))], name: String) = {
          // unique (key, ts), as the operator requires
          val uniq = rows.map { case (k, (t, v)) => ((k, t), v) }.toMap.toList
          uniq.map { case ((k, t), v) => (k, new Timestamp(base + t * 1000), v) }
            .toDF("k", "ts", name)
        }
        val obs = os.zipWithIndex
          .map { case ((u, s), i) => (u, new Timestamp(base + s * 1000), i.toLong) }
          .toDF("k", "ts", "oid")
        val feats = Seq(featDf(f1, "v1") -> "v1", featDf(f2, "v2") -> "v2",
          featDf(f3, "v3") -> "v3")
        def key(r: org.apache.spark.sql.Row) =
          r.getLong(r.fieldIndex("oid")) ->
            Seq("v1", "v2", "v3").map(c =>
              if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getInt(r.fieldIndex(c))))
        val single = AsOf.pitMulti(obs, feats, "k", "ts").collect().map(key).toMap
        val sequential = feats.foldLeft(obs) { case (acc, (fdf, name)) =>
          AsOf.asofJoin(acc, fdf, "k", "ts", Seq(name))
        }.collect().map(key).toMap
        single == sequential
      }
    }
    check(prop, tests = 8)
  }

  test("property: pointer-doubling components match union-find on random graphs") {
    val edgeGen = SGen.listOfN(40,
      SGen.zip(SGen.chooseNum(0L, 29L), SGen.chooseNum(0L, 29L)))
    val prop = Prop.forAll(edgeGen) { raw =>
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      edges.isEmpty || {
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v)).toMap
        // min-id canonicalization: union-find with min-root merging yields
        // the component minimum as root for every member
        val got = graft.ext.Dedup.components(
          edges.toDF("doc_a", "doc_b"), maxRounds = 15)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    }
    check(prop, tests = 10)
  }
}

/** Property checks for the round-5 pipeline operators: span coverage,
  * shard-shuffle permutations, temperature allocation bounds — each against
  * a brute-force in-JVM reference on arbitrary small inputs. */
class PipelinePropertySpec extends SparkSpec {

  private def check(prop: org.scalacheck.Prop, tests: Int = 10): Unit = {
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(tests).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  import spark.implicits._
  import org.scalacheck.{Gen => SGen, Prop}

  // random docs over a tiny vocabulary, so 5-gram collisions are common
  private val docGen = SGen.listOfN(12, SGen.chooseNum(0, 5))
    .map(_.map(i => s"v$i").mkString(" "))
  private val corpusGen = SGen.listOfN(8, docGen)

  test("property: span coverage is bounded by n_tokens; full dup covers fully") {
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = graft.ext.SpanDedup.dupSpans(docs).collect()
      val bounded = rows.forall { r =>
        r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)
      }
      // duplicating the whole corpus makes every doc fully covered
      val doubled = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        texts.zipWithIndex.map { case (t, i) => (100L + i, t) })
        .toDF("doc_id", "text")
      val full = graft.ext.SpanDedup.dupSpans(doubled).collect()
        .forall(r => r.getLong(2) == r.getLong(1))
      bounded && full
    }
    check(prop)
  }

  test("property: shard shuffle is a per-shard dense permutation of all docs") {
    val idsGen = SGen.listOfN(80, SGen.chooseNum(0L, 5000L)).map(_.distinct)
    val prop = Prop.forAll(idsGen) { ids =>
      ids.isEmpty || {
        val docs = ids.map(i => Tuple1(i)).toDF("doc_id")
        val out = graft.operators.Scale.shardShuffle(docs).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        out.length == ids.length &&
          out.groupBy(_._2).forall { case (_, rows) =>
            rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq
          }
      }
    }
    check(prop)
  }

  test("property: temperature allocation never exceeds budget + rounding slack") {
    val srcGen = SGen.listOfN(4, SGen.chooseNum(1, 40))
    val prop = Prop.forAll(srcGen) { sizes =>
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map(i => ((s * 1000 + i).toLong, s"src$s",
          (1 to 50).map(j => s"t$j").mkString(" ")))
      }.toDF("doc_id", "source", "text")
      val out = graft.operators.Scale.temperatureMix(docs).collect()
      val allocSum = out.map(_.getLong(4)).sum
      // floor-division rounding can only lose tokens, never exceed budget
      allocSum <= 20000L &&
        out.forall(r => r.getLong(5) >= 0 && r.getLong(5) <= 100)
    }
    check(prop)
  }
  test("property: block-dedup rewrite yields a globally block-unique corpus, idempotently") {
    val wordGen = SGen.chooseNum(0, 5).map(i => s"w$i") // tiny vocab -> heavy block collisions
    val docGen = SGen.listOfN(45, wordGen).map(_.mkString(" "))
    val corpusGen = SGen.listOfN(8, docGen)
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.ext.SpanDedup.blockDedupRewrite(df).cache()
      val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      // 1. every surviving block hash is unique corpus-wide
      val blocks = rows.flatMap { case (_, _, clean) =>
        clean.split(" ").grouped(graft.ext.SpanDedup.BlockTokens).map(_.mkString(" "))
      }
      val unique = blocks.distinct.length == blocks.length
      // 2. idempotent: re-deduping the rewritten corpus drops nothing
      val again = graft.ext.SpanDedup.blockDedupRewrite(
          out.select(col("doc_id"), col("clean_text").as("text")))
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      out.unpersist()
      val fixed = rows.forall { case (id, _, clean) => again.get(id).contains(clean) }
      unique && fixed
    }
    check(prop, tests = 8)
  }

  test("property: epoch mix conserves allocation and epoch structure on random skews") {
    val sizesGen = SGen.listOfN(4, SGen.chooseNum(1, 40))
    val prop = Prop.forAll(sizesGen) { sizes =>
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => ((s * 1000 + i).toLong, s"src$s"))
      }.toDF("doc_id", "source")
      val out = graft.operators.Scale.epochMix(docs)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val bySrc = out.groupBy(_._1)
      bySrc.forall { case (src, rows) =>
        val n = sizes(src.drop(3).toInt).toLong
        val epochs = rows.map(_._2).sorted.toList
        // contiguous epochs from 0; all but the last full; last <= full
        epochs == (0L until epochs.length).toList &&
          rows.sortBy(_._2).dropRight(1).forall(_._3 == n) &&
          rows.maxBy(_._2)._3 <= n
      }
    }
    check(prop, tests = 10)
  }
}
