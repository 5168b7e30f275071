package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EmbedOps, SimOps}

/** q145 embedding trainer: components equal an independent local replay
  * of the signed-hash projection, identical token multisets map to
  * identical vectors, and the trained vectors drive the q53 brute-kNN
  * consumer end-to-end (the text→vector→ANN seam). */
class EmbedSpec extends AnyFunSuite with SharedSpark {

  private def md5ParitySign(token: String, dim: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$token#$dim".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    if (BigInt(hex, 16) % 2 == 1) 1L else -1L
  }

  private def localVec(text: String): Array[Long] = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    Array.tabulate(EmbedOps.Dim)(d => toks.map(md5ParitySign(_, d)).sum)
  }

  test("q145 components equal the local signed-hash replay") {
    val got = EmbedOps.q145(spark, SF).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val docs = Tables.documents(spark, SF).select("doc_id", "text").collect()
    assert(got.size === docs.length)
    docs.take(25).foreach { r =>
      assert(got(r.getLong(0)) === localVec(r.getString(1)).toSeq,
        s"doc ${r.getLong(0)}")
    }
  }

  test("q148 word2vec: deterministic seeded fit, Dim components per doc") {
    val a = EmbedOps.q148(spark, SF).collect()
    assert(a.length === Tables.documents(spark, SF).count() * EmbedOps.W2vDim)
    // numPartitions=1 + fixed seed ⇒ bit-deterministic fit (the contract
    // the scaladoc documents; production raises partitions and trades it)
    val b = EmbedOps.q148(spark, SF).collect()
    assert(a === b)
    // vectors are non-degenerate: some component differs across docs
    val byDim0 = a.filter(_.getInt(1) == 0).map(_.getDouble(2)).distinct
    assert(byDim0.length > 1)
  }

  test("q175 w2v release artifact: loaded-model vectors ≡ the in-memory fit, generation lifecycle, named load errors") {
    // write → LOAD → transform ≡ the straight in-memory q148 run, value
    // for value (numPartitions=1 determinism is already pinned above)
    val loaded = EmbedOps.q175(spark, SF).collect()
    val mem = EmbedOps.q148(spark, SF).collect()
    assert(loaded === mem)
    // standing reuse: a second registered call must not refit/republish
    val base = EmbedOps.q175Base(spark)
    val gen = graft.GenManifest.current(base, "w2v")
    EmbedOps.q175(spark, SF).collect()
    assert(graft.GenManifest.current(base, "w2v") === gen)
    // lifecycle: a re-publish advances the generation atomically; the
    // loaded model still reproduces the same vectors; retained depth
    // keeps the predecessor on disk (a pinned reader is undisturbed)
    val next = EmbedOps.w2vWrite(spark, base, EmbedOps.w2vFit(spark, SF))
    assert(next === gen + 1)
    assert(graft.GenManifest.current(base, "w2v") === next)
    assert(EmbedOps.w2vDir(base, gen).exists(),
      "the previous generation must stay within the retain depth")
    val again = EmbedOps.q175(spark, SF).collect()
    assert(again === mem)
    // a missing manifest is a NAMED error at the load seam — never a
    // silent refit
    val fresh = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_w2v_none_${gen}")
    val e = intercept[RuntimeException](EmbedOps.w2vLoad(spark, fresh))
    assert(e.getMessage.contains("w2v"))
  }

  test("q149 semantic dedup equals a local sign-block + exact-threshold replay") {
    val docs = Tables.documents(spark, SF).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> localVec(r.getString(1)))
    def bucket(v: Array[Long]): Long =
      v.zipWithIndex.map { case (x, d) => if (x >= 0) 1L << d else 0L }.sum
    val expect = (for {
      (a, va) <- docs; (b, vb) <- docs
      if a < b && bucket(va) == bucket(vb)
      dot = va.zip(vb).map { case (x, y) => BigInt(x) * y }.sum
      if dot > 0
      na2 = va.map(x => BigInt(x) * x).sum; nb2 = vb.map(x => BigInt(x) * x).sum
      if dot * dot * 400 >= na2 * nb2 * 361
    } yield (a, b)).toSet
    val got = operators.EmbedOps.q149(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === expect)
    assert(got.length === got.distinct.length)
    // the emitted cosine really clears the 0.95 contract
    operators.EmbedOps.q149(spark, SF).collect()
      .foreach(r => assert(r.getDouble(2) >= 0.95, r.toString))
    assert(expect.nonEmpty)
  }

  test("q153 banded blocking: local replay agrees, candidates contain q149's") {
    val docs = Tables.documents(spark, SF).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> localVec(r.getString(1)))
    def bandKey(v: Array[Long], band: Int): Long =
      (0 until EmbedOps.BandBits).map { i =>
        val d = band * EmbedOps.BandBits + i
        if (v(d) >= 0) 1L << i else 0L
      }.sum
    val expect = (for {
      (a, va) <- docs; (b, vb) <- docs
      if a < b &&
        (0 until EmbedOps.Bands).exists(bd => bandKey(va, bd) == bandKey(vb, bd))
      dot = va.zip(vb).map { case (x, y) => BigInt(x) * y }.sum
      if dot > 0
      na2 = va.map(x => BigInt(x) * x).sum; nb2 = vb.map(x => BigInt(x) * x).sum
      if dot * dot * 400 >= na2 * nb2 * 361
    } yield (a, b)).toSet
    val rows = EmbedOps.q153(spark, SF).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === expect)
    assert(got.length === got.distinct.length) // the distinct-before-verify rule
    rows.foreach(r => assert(r.getDouble(2) >= 0.95, r.toString))
    // OR-amplification only ever ADDS candidates: full-pattern agreement
    // implies every band agrees, so q149 ⊆ q153 structurally
    val full = EmbedOps.q149(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.subsetOf(got.toSet))
  }

  test("q153 catches the cos≈1 boundary pair q149's full-pattern block drops") {
    // craft two docs whose trained vectors differ ONLY by one extra token
    // that flips the sign of a single near-zero component: cos stays ≥
    // 0.95 but the full Dim-bit sign patterns diverge at that bit — the
    // exact recall hole r9's VERDICT flags. Search the token pool for
    // (g, h) agreeing in sign everywhere but one dim d0 (so 60·(g+h)
    // zeroes that component) and an x that pushes it to −1.
    val pool = (0 until 300).map(i => s"tok$i")
    val sig = pool.map(t =>
      t -> Array.tabulate(EmbedOps.Dim)(d => md5ParitySign(t, d))).toMap
    val (g, h, d0) = (for {
      a <- pool.iterator; b <- pool.iterator
      if a < b
      diffs = (0 until EmbedOps.Dim).filter(d => sig(a)(d) != sig(b)(d))
      if diffs.length == 1
    } yield (a, b, diffs.head)).next()
    val x = pool.find(t => t != g && t != h && sig(t)(d0) == -1L).get
    val textA = (Seq.fill(60)(g) ++ Seq.fill(60)(h)).mkString(" ")
    val textB = textA + " " + x
    // premise check on the local replay: signs flip ONLY at d0, and the
    // pair still clears the exact cos ≥ 0.95 rule
    val (va, vb) = (localVec(textA), localVec(textB))
    assert(va(d0) === 0L && vb(d0) === -1L)
    assert((0 until EmbedOps.Dim).filter(d => (va(d) >= 0) != (vb(d) >= 0))
      === Seq(d0))
    val dot = va.zip(vb).map { case (p, q) => BigInt(p) * q }.sum
    assert(dot * dot * 400 >=
      va.map(p => BigInt(p) * p).sum * vb.map(q => BigInt(q) * q).sum * 361)
    val tmp = java.nio.file.Files.createTempDirectory("graft-boundary").toString
    import spark.implicits._
    Seq((1L, "en", "src1", textA), (2L, "en", "src1", textB))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val full = EmbedOps.q149(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = EmbedOps.q153(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!full.contains((1L, 2L)), "q149's full-pattern block must drop it")
    assert(banded.contains((1L, 2L)), "q153's surviving band must catch it")
  }

  test("banded blocking at the production profile: Dim=16, 4×4-bit bands — volume bounded, recall holds") {
    // r10 VERDICT #5: the registered q153 runs at toy constants (Dim=8,
    // 2×4-bit bands); the documented production knobs (Dim≥16,
    // BandBits≈Dim/Bands) existed only in prose. Run the SAME generic
    // machinery at Dim=16 / 4 bands on a generated corpus and pin the
    // measured trade: (a) candidate volume ≤ Σ_band Σ_bucket n_b², and
    // (b) seeded near-dup recall at the production profile ≥ the Dim=8
    // profile's on the same pairs.
    import spark.implicits._
    val pool = (0 until 300).map(i => s"tok$i")
    // 8 seeded near-dup pairs (one extra token — the boundary class) +
    // 60 deterministic filler docs, all from the same token pool
    val pairTexts = (0 until 8).flatMap { i =>
      val base = (0 until 30).map(j => pool((i * 31 + j * 7) % 300))
        .flatMap(t => Seq.fill(4)(t)).mkString(" ")
      val extra = pool((i * 13 + 5) % 300)
      Seq((2L * i, base), (2L * i + 1, base + " " + extra))
    }
    val fillers = (0 until 60).map { i =>
      (100L + i, (0 until 40).map(j => pool((i * 7 + j * 11 + 3) % 300))
        .mkString(" "))
    }
    val docs = (pairTexts ++ fillers).toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.Text.tokens(col("text")).as("toks"))
      .cache()
    val seeded = (0 until 8).map(i => (2L * i, 2L * i + 1)).toSet
    def runProfile(dim: Int, bands: Int): (Set[(Long, Long)], Long, Long) = {
      val v = EmbedOps.vRelationOf(EmbedOps.componentsOf(docs, dim)).cache()
      try {
        val cand = EmbedOps.bandedCandidatesOf(v, dim, bands)
        val nCand = cand.count()
        val verified = EmbedOps.verifiedPairsOf(cand, v).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // the documented volume bound, measured: per band, bucket keys
        // from the assembled sign patterns, Σ over buckets of n_b²
        val bandBits = dim / bands
        val buckets = v.select(col("doc_id"), col("bucket")).collect()
          .map(_.getLong(1))
        val bound = (0 until bands).map { bd =>
          buckets.groupBy(b => (b >> (bd * bandBits)) & ((1L << bandBits) - 1))
            .values.map(g => g.length.toLong * g.length).sum
        }.sum
        (verified, nCand, bound)
      } finally { v.unpersist(); () }
    }
    val (got16, cand16, bound16) = runProfile(16, 4)
    val (got8, _, _) = runProfile(8, 2)
    docs.unpersist()
    // (a) the candidate volume respects the documented Σ n_b² bound —
    // and genuinely BLOCKS (strictly under the all-pairs count)
    assert(cand16 <= bound16, s"cand $cand16 vs bound $bound16")
    val n = pairTexts.length + fillers.length
    assert(cand16 < n.toLong * (n - 1) / 2, "banding must beat all-pairs")
    // (b) recall on the seeded boundary pairs: the production profile
    // loses nothing vs the registered one (finer hyperplane resolution,
    // more OR-chances to agree)
    val recall16 = seeded.count(got16.contains)
    val recall8 = seeded.count(got8.contains)
    assert(recall16 >= recall8, s"recall16 $recall16 < recall8 $recall8")
    assert(recall16 === seeded.size, "a seeded near-identical pair was lost")
  }

  test("q148 partitioned fit: numPartitions=1 is a determinism knob, not a quality one") {
    // r9 VERDICT #4: prove quality survives a PARTITIONED skip-gram fit.
    // Components differ at numPartitions=4 (update order changes), but
    // the invariant the vectors exist for — known near-dup pairs project
    // to top-3 high-cosine neighbors — must hold at both settings.
    import org.apache.spark.ml.functions.vector_to_array
    val pairs = operators.DedupOps.q50(spark, SF)
      .select("id_a", "id_b").collect().take(3)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    Seq(1, 4).foreach { np =>
      val vecs = EmbedOps.w2vDocVectors(spark, SF, numPartitions = np)
        .select(col("doc_id").as("vec_id"),
          transform(vector_to_array(col("vec")), _.cast("float"))
            .as("embedding"))
        .cache()
      try {
        val probes = vecs.filter(col("vec_id").isin(pairs.map(_._1): _*))
        val top = SimOps.knnBrute(vecs, probes, 3).collect()
          .groupBy(_.getLong(0))
        pairs.foreach { case (a, b) =>
          val hit = top(a).find(_.getLong(1) === b)
          assert(hit.isDefined, s"np=$np: dup partner $b not in doc $a's " +
            s"top-3 w2v neighbors: ${top(a).toSeq}")
          // near-dup docs average nearly identical token-vector sets, so
          // the doc-vector cosine stays high REGARDLESS of fit noise
          assert(hit.get.getDouble(2) >= 0.9,
            s"np=$np: cos of dup pair ($a,$b): $hit")
        }
      } finally vecs.unpersist()
    }
  }

  test("trained vectors drive the kNN consumer: MinHash dup pairs land at rank 1") {
    val vecs = EmbedOps.trainedVectors(spark, SF).cache()
    try {
      // every vector is Dim-wide and dim-ordered
      assert(vecs.filter(size(col("embedding")) =!= EmbedOps.Dim).count() === 0)
      // end-to-end seam: near-dup pairs the MINHASH path verifies (q50)
      // must ALSO surface as rank-1 high-cosine neighbors under the
      // TRAINED projection — the similarity-preservation property the
      // hash embedding exists for (measured: jaccard≈0.99 pairs project
      // to cos≈0.997 at Dim=8 vs a ~0.52 random-pair median).
      val pairs = operators.DedupOps.q50(spark, SF)
        .select("id_a", "id_b").collect().take(3)
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty)
      val probes = vecs.filter(col("vec_id").isin(pairs.map(_._1): _*))
      val top = SimOps.knnBrute(vecs, probes, 3).collect()
        .groupBy(_.getLong(0))
      pairs.foreach { case (a, b) =>
        // top-3, not exactly rank-1: a doc inside a dup CLUSTER has
        // several jaccard≈0.99 partners competing for rank 1
        val hit = top(a).find(_.getLong(1) === b)
        assert(hit.isDefined,
          s"dup partner $b should be in doc $a's top-3 neighbors: " +
            top(a).toSeq)
        // q50 admits pairs down to jaccard ~0.5, so the bound is 0.9
        // (still far above the ~0.52 random-pair median), not the 0.997
        // a jaccard-0.99 pair measures
        assert(hit.get.getDouble(2) >= 0.9, s"cos of dup pair ($a,$b): $hit")
      }
      // determinism (md5 signs, integer sums)
      val again = EmbedOps.trainedVectors(spark, SF).collect()
      assert(vecs.collect().sortBy(_.getLong(0)).toSeq ===
        again.sortBy(_.getLong(0)).toSeq)
    } finally vecs.unpersist()
  }
}
