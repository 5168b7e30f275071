package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Num

/** Property-based checks for the determinism-critical primitives,
  * driven by seeded ScalaCheck generators (the scalatest-scalacheck
  * bridge artifact isn't available offline, so sampling is explicit —
  * and reproducible by construction). */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("decimal-exact sum equals BigDecimal arithmetic for any partitioning") {
    val moneyGen = Gen.listOfN(200, Gen.chooseNum(-99999L, 999999L).map(_ / 100.0))
    samples(Gen.zip(moneyGen, Gen.chooseNum(1, 13)), 8).foreach {
      case (xs, parts) if xs.nonEmpty =>
        val expect = xs.map(BigDecimal.valueOf).sum.toDouble
        val got = xs.toDF("x").repartition(parts)
          .agg(Num.dsum(col("x"))).collect()(0).getDouble(0)
        assert(got === expect, s"parts=$parts n=${xs.length}")
      case _ => ()
    }
  }

  test("ratio6 equals BigDecimal HALF_UP division, including exact boundaries") {
    // exact .5e-6 boundaries (65/128 = 0.5078125) are the cases double
    // round() gets engine-ambiguously wrong — the whole point of ratio6
    val boundary = Seq((65L, 128L), (-65L, 128L), (1L, 2000000L),
      (3L, 2000000L), (1L, 3L), (-1L, 3L), (0L, 7L), (9475L, 10000L))
    val rnd = samples(Gen.zip(Gen.chooseNum(-2000000L, 2000000L),
      Gen.chooseNum(1L, 99999L)), 400)
    val cases = boundary ++ rnd
    val got = cases.toDF("p", "q")
      .select(col("p"), col("q"), Num.ratio6(col("p"), col("q")).as("r"))
      .collect()
    got.foreach { r =>
      val expect = new java.math.BigDecimal(r.getLong(0))
        .divide(new java.math.BigDecimal(r.getLong(1)), 6,
          java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r.getDouble(2) === expect, s"${r.getLong(0)}/${r.getLong(1)}")
    }
  }

  test("tokens() agrees with a reference scalar tokenizer on arbitrary input") {
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", ",", ".", "!", "-", "_", "É", "ß")))
      .map(_.mkString)
    val texts = samples(textGen, 60)
    val got = texts.toDF("text")
      .select(graft.text.Text.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g === "[\\p{L}\\p{N}]+".r.findAllIn(t.toLowerCase).toSeq,
        s"input=<$t>")
    }
  }

  test("shingles(k) emits exactly max(n-k+1, 0) ordered joins") {
    val tokGen = Gen.zip(
      Gen.listOfN(12, Gen.identifier.map(_.take(5).toLowerCase).suchThat(_.nonEmpty)),
      Gen.chooseNum(2, 4))
    samples(tokGen, 20).foreach { case (toks, k) =>
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(graft.text.Text.shingles(
          graft.text.Text.tokens(col("text")), k).as("s"))
        .as[Seq[String]].collect()(0)
      // identifiers may contain '_' which the tokenizer splits — derive
      // the expected token stream from the tokenizer contract itself
      val flat =
        "[\\p{L}\\p{N}]+".r.findAllIn(toks.mkString(" ").toLowerCase).toSeq
      val expect =
        if (flat.length < k) Seq()
        else flat.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
      assert(got === expect, s"k=$k toks=$toks")
    }
  }

  test("OrderStats.keysAtRanks equals sort-based selection on arbitrary distributions") {
    // distribution shapes that stress the histogram: uniform, massive
    // ties, one dominating cluster (single hot bin), negatives, and a
    // power-law-ish spread; values quantized so duplicates are common
    val distGen = Gen.oneOf[Seq[Double]](
      Gen.listOfN(300, Gen.chooseNum(-1e6, 1e6)),
      Gen.listOfN(300, Gen.chooseNum(0, 5).map(_.toDouble)),
      Gen.listOfN(300, Gen.frequency(
        9 -> Gen.const(123.456), 1 -> Gen.chooseNum(-1e3, 1e3))),
      Gen.listOfN(300, Gen.chooseNum(1, 1000).map(x => math.pow(1.01, x % 700))))
    samples(Gen.zip(distGen, Gen.chooseNum(1, 7)), 6).foreach { case (vsRaw, parts) =>
      val vs = vsRaw.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      val sorted = vs.sorted
      val ranks = Seq(1L, 7L, vs.length / 2L, vs.length - 1L, vs.length.toLong)
        .distinct.filter(r => r >= 1 && r <= vs.length)
      val targets = ranks.zipWithIndex.map { case (t, i) => (i, t) }
        .toDF("idx", "t")
      val got = graft.functions.OrderStats
        .keysAtRanks(vs.toDF("v", "id").repartition(parts), targets)
        .collect().map(r => r.getAs[Long]("t") ->
          (r.getAs[Double]("v"), r.getAs[Long]("id"))).toMap
      ranks.foreach { r =>
        assert(got(r) === sorted((r - 1).toInt), s"rank $r of ${vs.length}")
      }
    }
  }

  test("PrefixSum raises on a key span exceeding Long.MaxValue") {
    // hi - lo wraps negative here; without the in-plan assert the bin
    // mapping silently loses monotonicity and the sums come out wrong
    val rows = Seq((Long.MinValue + 10L, 0L, 1L), (Long.MaxValue - 10L, 1L, 1L))
    val ex = intercept[Exception] {
      graft.functions.PrefixSum
        .withRunningSum(rows.toDF("k", "id", "v"), "k", Seq("id"), "v", "cum")
        .collect()
    }
    assert(ex.getMessage.contains("span exceeds Long.MaxValue") ||
      Option(ex.getCause).exists(_.getMessage.contains("span exceeds Long.MaxValue")))
  }

  test("PrefixSum.withRunningSum equals a sequential scan on arbitrary keys") {
    // key shapes that stress the binning: spread, heavy ties (many rows
    // per bin AND per key — the tiebreak path), negatives, tight range
    // (sub-NumBins span → width clamps to 1); values include negatives
    val keyGen = Gen.oneOf[Seq[Long]](
      Gen.listOfN(400, Gen.chooseNum(-1000000L, 1000000L)),
      Gen.listOfN(400, Gen.chooseNum(0L, 3L)),
      Gen.listOfN(400, Gen.chooseNum(-5L, 5L)))
    samples(Gen.zip(keyGen, Gen.chooseNum(1, 7)), 6).foreach { case (ks, parts) =>
      val rows = ks.zipWithIndex.map { case (k, i) =>
        (k, i.toLong, (k % 13) - 6) } // v correlated with key, negative-heavy
      val expect = rows.sortBy { case (k, id, _) => (k, id) }
        .scanLeft(0L) { case (acc, (_, _, v)) => acc + v }.tail
      val ordered = rows.sortBy { case (k, id, _) => (k, id) }.map(t => (t._1, t._2))
      val got = graft.functions.PrefixSum
        .withRunningSum(rows.toDF("k", "id", "v").repartition(parts),
          "k", Seq("id"), "v", "cum")
        .select(col("k"), col("id"), col("cum"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      ordered.zip(expect).foreach { case (key, want) =>
        assert(got(key) === want, s"cum at $key")
      }
    }
  }

  test("native tokenizer ≡ regexp_extract_all(segSpaced, '[\\p{L}\\p{N}]+') on mixed ASCII/Unicode inputs") {
    // charset mixes token runs, ASCII delimiters, multi-byte scripts,
    // and case-folding edge cases (Turkish İ lowers to i + combining
    // dot via String.toLowerCase — both paths must agree because both
    // lowercase FIRST with the same method; the combining dot is Mn,
    // not L/N, so it splits the run identically on both paths). The
    // arbitrary-BMP-char generator also fuzzes the category test
    // itself against Java regex's \p{L}\p{N} across every script.
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', ',', '.', '-', '_', '!', '№'),
      1 -> Gen.oneOf('Ä', 'ß', 'İ', 'Σ', 'ς', 'д', '中'),
      1 -> Gen.choose(0, 0xFFFF).map(_.toChar).filter(c =>
        !Character.isSurrogate(c)))
    val strGen = Gen.listOfN(40, charGen).map(_.mkString)
    val cases = samples(Gen.listOfN(25, strGen), 4).flatten :+
      "" :+ "   " :+ "a" :+ "É9z" :+ "İİİ abc İ9"
    val df = cases.toDF("text")
    val got = df.select(graft.text.Text.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    // the declarative twin (r15): unsegmented-script codepoints are
    // spaced out before the run extract — the oracle's exact form
    val want = df.select(
        regexp_extract_all(graft.text.Text.segSpaced(col("text")),
          lit("[\\p{L}\\p{N}]+"), lit(0)).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    got.zip(want).zip(cases).foreach { case ((g, w), c) =>
      assert(g === w, s"tokenizer divergence on ${c.take(60)}") }
    // and the interpreted (non-codegen) path agrees too
    cases.foreach { c =>
      val ev = graft.expressions.TokensOf.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(c))
      val evList = (0 until ev.numElements())
        .map(i => ev.getUTF8String(i).toString).toList
      // reference lowering must be Lower's (ICU at UTF8_BINARY), not
      // String.toLowerCase — their final-sigma ignorable sets differ
      // on inputs like "_Σ!" (this fuzzer found exactly that)
      val low = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
        .exec(org.apache.spark.unsafe.types.UTF8String.fromString(c), 0, true)
        .toString
      val spaced = low.replaceAll(
        graft.text.Text.UnsegmentedClassJava, " $1 ")
      val re = "[\\p{L}\\p{N}]+".r.findAllIn(spaced).toList
      assert(evList === re, s"eval divergence on ${c.take(60)}")
    }
  }

  test("water-filling fixpoint map: monotone, non-increasing from T0, caps honored, shares exact when uncapped") {
    // driver-side mirror of q120's integer-micros iteration (the same
    // idivHalfAway formula the Spark plan and the DuckDB oracle run)
    def idivHA(p: Long, q: Long) = (2 * p + q) / (2 * q) // nonneg args
    val langGen = Gen.listOfN(6,
      Gen.zip(Gen.chooseNum(0L, 2000000L), Gen.chooseNum(1L, 8L)))
    samples(langGen, 40).foreach { langs =>
      // (clean_tokens, weight) per lang; raw implied = clean * wobble
      val tw = langs.map { case (c, w) => c * w + w } // >0 weights
      val tws = tw.sum
      if (tws > 0) {
        val shares = tw.map(t => idivHA(t * 1000000L, tws))
        val clean = langs.map(_._1)
        def step(t: Long): Long =
          clean.zip(shares).map { case (c, s) =>
            math.min(c, idivHA(s * t, 1000000L)) }.sum
        val t0 = clean.sum
        val ts = Iterator.iterate(t0)(step).take(12).toList
        // T1 ≤ T0 (allocations never exceed supply) and the map is
        // monotone ⇒ the whole sequence is non-increasing — the
        // invariant that makes a FIXED iteration count well-defined
        // (stability itself is data-dependent; q120's spec pins it on
        // the shipped corpus, not universally)
        assert(ts.zip(ts.tail).forall { case (a, b) => b <= a },
          s"not monotone: $ts")
        assert(ts.forall(t => t >= 0 && t <= t0))
        val tFin = ts.last
        val alloc = clean.zip(shares).map { case (c, s) =>
          math.min(c, idivHA(s * tFin, 1000000L)) }
        // caps honored, and an uncapped language gets EXACTLY its share
        alloc.zip(clean).foreach { case (a, c) => assert(a <= c) }
        alloc.lazyZip(clean).lazyZip(shares).foreach { case (a, c, s) =>
          if (a < c) assert(a === idivHA(s * tFin, 1000000L)) }
        // one more application from the final T never increases it
        assert(step(tFin) <= tFin)
      }
    }
  }

  test("q129 chunking on arbitrary token streams: lossless, strided, W-bounded") {
    import graft.operators.PipelineOps.{ChunkW, ChunkStride}
    val word = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    val docGen = Gen.chooseNum(0, 3 * ChunkW + 5)
      .flatMap(n => Gen.listOfN(n, word))
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val got = graft.operators.PipelineOps.q129Of(
        docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = if (text.isEmpty) Array.empty[String] else text.split(" ")
      val cs = got.getOrElse(id, Array.empty).sortBy(_._2)
      if (toks.isEmpty) assert(cs.isEmpty, s"doc $id: chunks from empty doc")
      else {
        // model: starts at 1, 1+S, ... while ≤ n; width min(W, remaining)
        val starts = (1 to toks.length by ChunkStride).toList
        assert(cs.map(_._3).toList === starts.map(_.toLong), s"doc $id starts")
        cs.foreach { case (_, cid, st, fin, n, txt) =>
          assert(fin === math.min(st + ChunkW - 1, toks.length.toLong))
          assert(n === fin - st + 1 && n <= ChunkW)
          assert(txt === toks.slice(st.toInt - 1, fin.toInt).mkString(" "),
            s"doc $id chunk $cid")
        }
        // lossless: concatenating the non-overlapped prefixes rebuilds
        // the doc exactly (stride-S prefix of every chunk + full tail)
        val rebuilt = cs.zipWithIndex.flatMap { case ((_, _, _, _, _, txt), i) =>
          val take = if (i == cs.length - 1) Int.MaxValue else ChunkStride
          txt.split(" ").take(take)
        }
        assert(rebuilt.toList === toks.toList, s"doc $id not lossless")
      }
    }
  }

  test("unit-budget chunking on arbitrary streams and unit prices: partition, grid starts, lossless") {
    // the q157/q158 chunking contract, generatively: for arbitrary token
    // streams under an ARBITRARY positive unit pricing (not just a
    // trained mapping), the engine's chunkReadout partitions each doc's
    // positions contiguously, assigns every token to the chunk where its
    // running unit total STARTS (floor(start/Budget)), conserves token
    // and unit mass, and reassembles the doc losslessly in chunk order
    import graft.operators.BpeOps
    val word = Gen.chooseNum(0, 20).map(i => s"w$i")
    val docGen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(docGen, 50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }
    val price = docs.flatMap(_._2).distinct
      .map(t => t -> (1L + math.abs(t.hashCode) % 9)).toMap
    val toksDf = docs.flatMap { case (id, ws) =>
      ws.zipWithIndex.map { case (w, p) => (id, (p + 1).toLong, w) }
    }.toDF("doc_id", "pos", "token")
    val mapping = price.toSeq.toDF("token", "units")
    val got = BpeOps.chunkReadout(toksDf, mapping).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
      .groupBy(_._1)
    docs.foreach { case (id, ws) =>
      val cs = got.getOrElse(id, Array.empty).sortBy(_._2)
      if (ws.isEmpty) assert(cs.isEmpty, s"doc $id: chunks from empty doc")
      else {
        // local model: running start offsets → chunk ids on the grid
        var cum = 0L
        val model = ws.zipWithIndex.map { case (w, i) =>
          val start = cum; cum += price(w)
          (start / BpeOps.ChunkUnitBudget, i + 1L, w, price(w))
        }
        val byChunk = model.groupBy(_._1).toSeq.sortBy(_._1)
        assert(cs.map(_._2).toList === byChunk.map(_._1).toList, s"doc $id ids")
        cs.zip(byChunk).foreach { case ((_, cid, st, fin, n, nu, txt), (_, rs)) =>
          assert(st === rs.map(_._2).min && fin === rs.map(_._2).max,
            s"doc $id chunk $cid positions")
          assert(n === rs.length.toLong && nu === rs.map(_._4).sum,
            s"doc $id chunk $cid masses")
          assert(txt === rs.map(_._3).mkString(" "), s"doc $id chunk $cid text")
        }
        // contiguity + lossless reassembly across the whole doc
        assert(cs.map(_._5).sum === ws.length.toLong, s"doc $id token mass")
        assert(cs.map(_._7).mkString(" ") === ws.mkString(" "),
          s"doc $id not lossless")
      }
    }
  }

  test("banded blocking admits a superset of full-pattern blocking on arbitrary corpora") {
    // the q149 ⊆ q153 contract, generatively: for random small corpora,
    // every full-pattern candidate pair is a banded candidate pair, and
    // BOTH variants' emitted pairs satisfy the exact integer cos rule —
    // with the engine run against the corpus, not a replay
    import graft.operators.EmbedOps
    val docGen = Gen.listOfN(14,
      Gen.listOf(Gen.chooseNum(0, 30).map(i => s"w$i")).map(_.take(25)))
    samples(docGen, 4).zipWithIndex.foreach { case (texts, i) =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft-prop153-$i").toString
      texts.zipWithIndex
        .map { case (ts, j) => (j.toLong + 1, "en", "s", ts.mkString(" ")) }
        .filter(_._4.nonEmpty)
        .toDF("doc_id", "lang", "source", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val full = EmbedOps.q149(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rows = EmbedOps.q153(spark, tmp).collect()
      val banded = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(full.subsetOf(banded), s"corpus $i: $full ⊄ $banded")
      rows.foreach(r => assert(r.getDouble(2) >= 0.95, s"corpus $i: $r"))
      // banded emits no duplicate pair despite the two-band join
      assert(rows.length === banded.size, s"corpus $i")
    }
  }

  test("key-folded group ranking equals per-group ROW_NUMBER on arbitrary skew (the r13 grouped-rank rule)") {
    import org.apache.spark.sql.expressions.Window
    // the rule q179/q180 ship: rank within SKEWED groups via ONE
    // PrefixSum scan over okey = group·2^40 + in-group key, recovering
    // per-group ranks by subtracting offsets cumulated over the group
    // dim — must equal Window.partitionBy(group) exactly, for any skew
    // (incl. one group holding ~all rows) and any partitioning
    val rowGen = Gen.listOfN(300, Gen.zip(
      Gen.frequency(6 -> Gen.const(0L), 2 -> Gen.chooseNum(1L, 3L),
        1 -> Gen.chooseNum(4L, 15L)),           // Zipf-ish group skew
      Gen.chooseNum(0L, (1L << 40) - 1)))       // in-group hash key
    samples(Gen.zip(rowGen, Gen.chooseNum(1, 7)), 6).foreach {
      case (rs, parts) =>
        val rows = rs.zipWithIndex.map { case ((g, h), i) => (g, h, i.toLong) }
        val df = rows.toDF("g", "h", "id").repartition(parts)
          .withColumn("okey", col("g") * (1L << 40) + col("h"))
        val ranked = graft.functions.PrefixSum
          .withRunningSum(df.withColumn("one", lit(1L)), "okey",
            Seq("id"), "one", "grank")
        val cum = Window.orderBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offs = ranked.groupBy(col("g")).agg(count(lit(1)).as("n"))
          .withColumn("off", sum(col("n")).over(cum) - col("n"))
          .select(col("g"), col("off"))
        val got = ranked.join(broadcast(offs), "g")
          .select(col("g"), col("id"), (col("grank") - col("off")).as("r"))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        val want = df.withColumn("r",
            row_number().over(Window.partitionBy(col("g"))
              .orderBy(col("okey"), col("id"))).cast("long"))
          .select(col("g"), col("id"), col("r"))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        assert(got === want, s"parts=$parts")
    }
  }
}
