package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r14 Unicode token class (`[\p{L}\p{N}]+` runs of the
  * lowercased input, [[graft.expressions.TokensOf]]):
  *
  *  1. the ASCII SUBSET is bit-identical to the pre-r14 `[a-z0-9]+`
  *     class — every committed oracle hash over the (pure-ASCII)
  *     corpus is unchanged by construction;
  *  2. CJK / Cyrillic / Arabic / Greek / Devanagari fixtures produce
  *     non-empty tokens and shingles (the r13 VERDICT #1 gap: these
  *     scripts tokenized to NOTHING, blinding every text gate);
  *  3. the two documented cross-engine divergence edges (full Java
  *     case mapping here vs utf8proc simple mapping in DuckDB) have
  *     pinned Spark-side outputs, so a behavior change is loud;
  *  4. category boundaries: Nl/No digits are tokens, combining marks
  *     (Mn) split runs, punctuation/symbols split runs.
  *
  * Cross-engine agreement on live data is proven by the driver oracle:
  * q195 transliterates the corpus into five scripts and hash-compares
  * token/shingle md5 fingerprints between the native expression and
  * DuckDB's `regexp_extract_all(lower(..), '[\p{L}\p{N}]+')`.
  */
class UnicodeTokenSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def toks(s: String): List[String] = {
    val a = graft.expressions.TokensOf.tokenize(UTF8String.fromString(s))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toList
  }

  test("ASCII subset is bit-identical to the pre-r14 [a-z0-9]+ class") {
    // the exact pre-r14 contract, as a reference implementation
    def old(s: String): List[String] =
      "[a-z0-9]+".r.findAllIn(s.toLowerCase).toList
    val asciiGen = Gen.listOfN(60, Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', ',', '.', '-', '_', '!', '@', '#',
        '/', '\\', '\'', '"', '(', ')', '[', ']'),
      1 -> Gen.choose(0, 127).map(_.toChar))).map(_.mkString)
    val cases = (0 until 200)
      .flatMap(i => asciiGen.apply(Gen.Parameters.default, Seed(7L + i))) ++
      Seq("", " ", "a", "A1b2", "Hello, World! 42", "__x__", "0")
    cases.foreach { c =>
      assert(toks(c) === old(c), s"ASCII drift on <$c>")
    }
  }

  test("CJK/Cyrillic/Arabic/Greek/Devanagari fixtures tokenize and shingle non-empty") {
    val fixtures = Seq(
      "東京は日本の首都です 2025年",             // CJK (Lo, no case)
      "Привет мир это тестовый документ",        // Cyrillic
      "مرحبا بالعالم هذا مستند تجريبي",          // Arabic (RTL, Lo)
      "γειά σου κόσμε αυτό είναι δοκιμή",        // Greek lowercase
      "नमस्ते दुनिया यह परीक्षण है ५")           // Devanagari + Nd digit
    val got = fixtures.toDF("text")
      .select(graft.text.Text.tokens(col("text")).as("t"),
        graft.text.Text.shingles(
          graft.text.Text.tokens(col("text")), 2).as("s"))
      .collect()
    got.zip(fixtures).foreach { case (r, f) =>
      val t = r.getSeq[String](0)
      val sh = r.getSeq[String](1)
      assert(t.nonEmpty, s"no tokens for <$f>")
      assert(sh.nonEmpty, s"no shingles for <$f>")
      assert(sh.head === s"${t(0)} ${t(1)}", s"shingle join for <$f>")
    }
    // unsegmented scripts (no word delimiters) tokenize PER CODEPOINT
    // (r15 — the byte/char-level fallback; dictionary segmentation
    // stays out of scope, SURVEY §7)
    assert(toks("東京は日本の首都です") ===
      List("東", "京", "は", "日", "本", "の", "首", "都", "で", "す"))
    // mixed-script runs stay single tokens (all \p{L})
    assert(toks("naïve café résumé") === List("naïve", "café", "résumé"))
  }

  test("uppercase non-ASCII folds before classification (Cyrillic/Greek/fullwidth)") {
    assert(toks("МИР ПРИВЕТ") === List("мир", "привет"))
    assert(toks("Ωμέγα") === List("ωμέγα"))
    // fullwidth Latin (Lu/Ll) lowers to fullwidth lowercase, stays L
    assert(toks("ＡＢＣ") === List("ａｂｃ"))
  }

  test("documented cross-engine divergence edges are pinned (Spark side)") {
    // Java FULL case mapping lowers word-final Σ to ς (U+03C2); DuckDB's
    // utf8proc simple mapping yields σ (U+03C3) — divergent token BYTES.
    // Oracle fixtures (q195's translate targets) therefore avoid capital
    // Greek; a change here means the lowercasing engine changed.
    assert(toks("ΑΒΓΟΣ") === List("αβγος"))
    assert(toks("ΣΣ") === List("σς"))
    // Turkish İ (U+0130) lowers to i + combining dot (U+0307, Mn) under
    // full mapping — the mark SPLITS the run; utf8proc yields bare "i"
    // and would keep "istanbul" whole. Divergent token BOUNDARIES.
    assert(toks("İstanbul") === List("i", "stanbul"))
  }

  test("category boundaries: N subcategories are tokens, marks/symbols split") {
    // Nd beyond ASCII (Devanagari ५), No (superscript ², vulgar ½),
    // Nl (Roman numeral Ⅻ → lowercase ⅻ) are all \p{N}
    assert(toks("५") === List("५"))
    assert(toks("x²y") === List("x²y"))
    assert(toks("1½") === List("1½"))
    assert(toks("Ⅻ42") === List("ⅻ42"))
    // combining mark (Mn) splits; standalone marks produce nothing
    assert(toks("i̇x") === List("i", "x"))
    assert(toks("̇́") === List())
    // currency/symbols/punctuation split runs exactly like ASCII
    assert(toks("€100·賞金¥42") === List("100", "賞", "金", "42"))
    // empty and whitespace-only stay empty
    assert(toks("") === List())
    assert(toks(" 　\t") === List())
  }

  test("BPE token classes: ASCII subset bit-identical, Unicode classes segment per category") {
    import org.apache.spark.sql.functions.col
    // ASCII identity vs the pre-r14 class set
    val asciiGen = Gen.listOfN(50, Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', ',', '.', '-', '!', '@', '(', ')')))
      .map(_.mkString)
    val cases = (0 until 120)
      .flatMap(i => asciiGen.apply(Gen.Parameters.default, Seed(3L + i))) ++
      Seq("", "a1!", "Hello, World!", "  .. ")
    val got = cases.toDF("text")
      .select(graft.text.Text.bpeTokenCount(col("text"))).as[Long].collect()
    val oldRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    cases.zip(got).foreach { case (c, g) =>
      assert(g === oldRe.findAllIn(c.toLowerCase).size.toLong,
        s"BPE ASCII drift on <$c>")
    }
    // Unicode classes: letter runs, number runs, one token per symbol
    val uni = Seq(
      "Привет, мир!" -> 4L,   // [привет][,][мир][!]
      "東京42" -> 3L,          // Han per codepoint -> [東][京][42]
      "५½ x" -> 2L,            // N-run [५½] + [x]
      "a†b" -> 3L)             // symbol † is So -> its own token
    val gotU = uni.map(_._1).toDF("text")
      .select(graft.text.Text.bpeTokenCount(col("text"))).as[Long].collect()
    uni.map(_._2).zip(gotU).zip(uni.map(_._1)).foreach {
      case ((want, g), c) => assert(g === want, s"BPE classes on <$c>")
    }
  }

  test("alnum mass (q45 quality): ASCII subset identical, Unicode letters/digits count") {
    import org.apache.spark.sql.functions.col
    val cases = Seq("Hello, World! 42", "a_b-c", "", "...", "Привет, мир!",
      "東京 2025年", "naïve café", "५½")
    val got = cases.toDF("text")
      .select(graft.text.Text.alnumLen(col("text"))).as[Int].collect()
    cases.zip(got).foreach { case (c, g) =>
      // reference: count codepoints in category L or N of the lowered text
      val want = c.toLowerCase.codePoints().toArray.count { cp =>
        val t = Character.getType(cp)
        t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
        t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
        t == Character.OTHER_LETTER || t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
      }
      assert(g === want, s"alnumLen on <$c>")
      // ASCII inputs: identical to the pre-r14 [^a-z0-9] strip
      if (c.forall(_ < 128))
        assert(g === c.toLowerCase.count(ch =>
          (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')),
          s"ASCII drift on <$c>")
    }
  }

  test("q198 script profile equals a driver-side replay (counts, dominance, tiebreak, purity)") {
    val got = graft.operators.TextOps.q198(spark, SF).collect()
      .map(r => r.getAs[String]("script") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("dom_chars"),
          r.getAs[Long]("script_chars"), r.getAs[Double]("purity"))).toMap
    assert(got.nonEmpty)
    // replay: same transliteration, Java script properties, same
    // alphabetical-tiebreak dominance rule, exact half-up purity
    val from = "abcdefghijklmnopqrstuvwxyz"
    val to = "абвГдежηθικλμمرسЖρσ東京५Дבыш"
    val scripts = Seq("Arabic", "Cyrillic", "Devanagari", "Greek", "Han",
      "Hebrew", "Latin")
    val docs = Tables.documents(spark, SF).select("doc_id", "text").collect()
    val perDoc = docs.map { r =>
      val lowered = r.getString(1).toLowerCase
      val utext = lowered.map { ch =>
        val i = from.indexOf(ch)
        if (i >= 0) to(i) else ch
      }
      val counts = scripts.map(sc =>
        sc.toLowerCase -> utext.codePoints().toArray.count(cp =>
          Character.UnicodeScript.of(cp) ==
            Character.UnicodeScript.forName(sc)).toLong)
      val g = counts.map(_._2).max
      val dom = counts.find { case (_, c) => c == g && g > 0 }
        .map(_._1).getOrElse("none")
      (dom, g, counts.map(_._2).sum)
    }
    val expect = perDoc.groupBy(_._1).map { case (sc, rs) =>
      val domC = rs.map(_._2).sum
      val allC = rs.map(_._3).sum
      val purity = if (allC == 0) 0.0
        else new java.math.BigDecimal(domC)
          .divide(new java.math.BigDecimal(allC), 6,
            java.math.RoundingMode.HALF_UP).doubleValue()
      sc -> ((rs.length.toLong, domC, allC, purity))
    }
    assert(got === expect)
    // purity is a real signal: mixed-script transliterated docs sit
    // strictly below 1; every purity is in (0, 1]
    got.filterNot(_._1 == "none").values.foreach { case (_, _, _, p) =>
      assert(p > 0.0 && p <= 1.0)
    }
  }

  test("the q195 transliteration exercises every intended script class") {
    // one char per target class, through the same translate the op uses:
    // Cyrillic upper+lower, Greek lower, Arabic, Hebrew, CJK, Devanagari
    val from = "abcdefghijklmnopqrstuvwxyz"
    val to = "абвГдежηθικλμمرسЖρσ東京५Дבыш"
    assert(to.codePointCount(0, to.length) === 26,
      "translate targets must map 1:1")
    val got = Seq("the quick brown fox jumps over a lazy dog 99")
      .toDF("text")
      .select(graft.text.Text.tokens(
        translate(lower(col("text")), from, to)).as("t"))
      .as[Seq[String]].collect()(0)
    // expected stream via the declarative segmentation twin: the Han
    // targets (s→東, t→京) are solo tokens, everything else keeps its
    // transliterated word boundaries
    val trans = "the quick brown fox jumps over a lazy dog 99"
      .map(c => { val i = from.indexOf(c); if (i >= 0) to(i) else c })
    val spaced = trans.toLowerCase  // the expression lowers again (Г/Ж/Д)
      .replaceAll(graft.text.Text.UnsegmentedClassJava, " $1 ")
    val want = "[\\p{L}\\p{N}]+".r.findAllIn(spaced).toList
    assert(got.toList === want, got.mkString(","))
    assert(got.count(_ == "東") ===
      "the quick brown fox jumps over a lazy dog 99".count(_ == 's'))
    // uppercase targets (d→Г, q→Ж, w→Д) came back lowercased
    assert(got.forall(t => t == t.toLowerCase), got.mkString(","))
    // digits unchanged
    assert(got.last === "99")
  }

  test("unsegmented-script rule: per-codepoint for Han/Kana/Thai/Lao/Khmer/Myanmar, run-based for everything else, cross-engine spellings agree") {
    // per-codepoint classes
    assert(toks("ไทยทดสอบ") === "ไทยทดสอบ".map(_.toString).toList) // Thai
    assert(toks("カタカナ") === List("カ", "タ", "カ", "ナ"))
    assert(toks("ພາສາລາວ") === "ພາສາລາວ".map(_.toString).toList)  // Lao
    // segmented scripts keep their runs: Hangul IS space-delimited,
    // Devanagari and Cyrillic too — NOT in the unsegmented set
    assert(toks("한국어 단어") === List("한국어", "단어"))
    assert(toks("नमस्ते") === List("नमस", "त"))  // Mn signs split runs
    assert(toks("привет") === List("привет"))
    // mixed: runs break cleanly around solo codepoints
    assert(toks("abc漢def") === List("abc", "漢", "def"))
    assert(toks("12東34") === List("12", "東", "34"))
    // the three spellings of the script set agree codepoint-by-codepoint
    // over the BMP: the native scan (UnicodeScript.of), the Java regex
    // twin (\p{IsHan}…), and — by the shared Unicode script data — the
    // RE2 oracle class; sampled across the BMP
    val javaRe = graft.text.Text.UnsegmentedClassJava.r
    (0 until 0xFFFF by 7).map(_.toChar).filter(c =>
      !Character.isSurrogate(c) && Character.isLetterOrDigit(c))
      .foreach { c =>
        val nat = toks(s"x${c}x")
        val viaRegex = javaRe.findFirstIn(c.toString).isDefined
        if (viaRegex)
          assert(nat.contains(c.toString.toLowerCase) ||
            nat.contains(c.toString),
            s"U+${c.toInt.toHexString}: regex says unsegmented, scan disagrees: $nat")
        else
          assert(nat.size === 1,
            s"U+${c.toInt.toHexString}: run must not split: $nat")
      }
  }

  test("CJK fixture: BPE's word-keyed vocab stays bounded; the clause-run counterfactual explodes") {
    import graft.operators.TextOps
    val ct = Tables.documents(spark, SF)
      .select(translate(lower(col("text")),
        TextOps.CjkFrom + " ", TextOps.CjkTo).as("ctext"))
    val segVocab = ct
      .select(explode(graft.text.Text.tokens(col("ctext"))).as("w"))
      .distinct().collect().map(_.getString(0))
    // every Han-bearing token is a single codepoint, and the Han
    // alphabet is exactly the 26 mapped ideographs — the relation BPE
    // keys its vocab by can never exceed alphabet + digit runs
    val hanToks = segVocab.filter(_.exists(c =>
      Character.UnicodeScript.of(c.toInt) == Character.UnicodeScript.HAN))
    assert(hanToks.forall(_.codePointCount(0, 1) == 1) &&
      hanToks.forall(_.length == 1))
    assert(hanToks.length <= 26)
    // the clause-run counterfactual (pre-r15): one "word" per distinct
    // clause — the vocab-explosion mode the per-codepoint rule prevents
    val clauseVocab = ct
      .select(explode(regexp_extract_all(lower(col("ctext")),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("w"))
      .distinct().count()
    assert(clauseVocab > 10L * segVocab.length,
      s"clause vocab $clauseVocab vs segmented ${segVocab.length}")
  }

  test("CJK shingle-dedup sanity: docs sharing a Han clause share shingles (q49/q50 granularity restored)") {
    // pre-r15 a shared clause was ONE token, so k=3 shingles needed 3
    // whole clauses to overlap; per-codepoint segmentation restores
    // sub-clause granularity — the near-dup signal shingle dedup needs
    val docs = Seq("前文 東京は日本の首都です 後文",
      "別の 東京は日本の首都です 結び").toDF("text")
    val sh = docs
      .select(graft.text.Text.shingles(
        graft.text.Text.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect()
    val common = sh(0).toSet intersect sh(1).toSet
    assert(common.size >= 8, s"shared-clause shingles: ${common.size}")
  }

  test("q202 routing reconciliation: Latin-only input is one script, routed ≡ global, nothing flips") {
    import graft.operators.TextOps
    val latin = Tables.documents(spark, SF)
      .select(col("doc_id"), lower(col("text")).as("utext"))
    val rows = TextOps.scriptRoutedGateOf(latin).collect()
    assert(rows.length === 1 && rows(0).getString(0) === "latin")
    assert(rows(0).getAs[Long]("n_pass_routed") ===
      rows(0).getAs[Long]("n_pass_global"))
    assert(rows(0).getAs[Long]("n_flipped") === 0L)
    // ...and on the transliterated corpus the routing CHANGES decisions
    // (the primitive earns its place — r14 VERDICT #7's done-condition)
    val routed = TextOps.q202(spark, SF).collect()
    assert(routed.map(_.getAs[Long]("n_flipped")).sum > 0L)
  }
}
