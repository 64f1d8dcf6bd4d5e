package graft

import graft.functions.{GramHash64, MinHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level checks of the native expressions/aggregates against their
  * declarative reference implementations (seeded-random inputs). */
class FunctionsSpec extends GraftSpecBase {

  test("graft_dot equals aggregate(zip_with(*)) on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def arr() = Array.fill(64)(rnd.nextLong() % 100000)
    val df = Seq.fill(200)((arr(), arr())).toDF("a", "b")
    val out = df.select(
      call_function("graft_dot", col("a"), col("b")).as("nat"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("ref"))
    assert(out.filter(col("nat") =!= col("ref")).count() == 0)
  }

  test("graft_vec_sum equals the posexplode reference aggregation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq
      .fill(300)((rnd.nextInt(5).toLong, Array.fill(16)(rnd.nextLong() % 1000)))
      .toDF("k", "v")
    val nat = df
      .groupBy("k")
      .agg(call_function("graft_vec_sum", col("v")).as("s"))
    val ref = df
      .select(col("k"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("k", "pos")
      .agg(sum("x").as("sx"))
      .groupBy("k")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("sx")))), c => c.getField("sx"))
          .as("s"))
    assert(nat.exceptAll(ref).isEmpty && ref.exceptAll(nat).isEmpty)
  }

  test("graft_vec_min equals the posexplode min reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq
      .fill(300)((rnd.nextInt(4).toLong, Array.fill(16)(rnd.nextLong() % 100000)))
      .toDF("k", "v")
    val nat = df.groupBy("k").agg(call_function("graft_vec_min", col("v")).as("s"))
    val ref = df
      .select(col("k"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("k", "pos")
      .agg(min("x").as("sx"))
      .groupBy("k")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("sx")))), c => c.getField("sx"))
          .as("s"))
    assert(nat.exceptAll(ref).isEmpty && ref.exceptAll(nat).isEmpty)
  }

  test("vec aggregates skip null arrays and arrays containing null elements") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[java.lang.Long](1L, 2L)),
      (1L, Array[java.lang.Long](10L, null)), // contains null -> skipped
      (1L, null.asInstanceOf[Array[java.lang.Long]]), // null array -> skipped
      (1L, Array[java.lang.Long](3L, 4L)))
      .toDF("k", "v")
    val s = df
      .groupBy("k")
      .agg(call_function("graft_vec_sum", col("v")).as("s"))
      .collect()(0)
      .getSeq[Long](1)
    assert(s == Seq(4L, 6L), s"expected Seq(4, 6), got $s")
    val m = df
      .groupBy("k")
      .agg(call_function("graft_vec_min", col("v")).as("m"))
      .collect()(0)
      .getSeq[Long](1)
    assert(m == Seq(1L, 2L), s"expected Seq(1, 2), got $m")
  }

  test("minhash kernel: deterministic, 64 wide, null under 3 words, dup-invariant") {
    def sig(t: String) = Option(MinHash64.compute(UTF8String.fromString(t))).map(_.toLongArray())
    assert(sig("a b").isEmpty)
    val s1 = sig("the quick brown fox jumps").get
    assert(s1.length == 64)
    assert(sig("the quick brown fox jumps").get.sameElements(s1))
    // shingle multiset invariance: repeating the exact shingles cannot
    // change any permutation minimum
    val rep = sig("the quick brown fox jumps the quick brown fox jumps").get
    // repeated text introduces cross-boundary shingles, so minima can only
    // DECREASE, never increase
    assert(rep.zip(s1).forall { case (r, o) => r <= o })
    assert(!sig("entirely different words here now").get.sameElements(s1))
  }

  test("gram kernel: distinct count, sorted output, null under 3 words") {
    def grams(t: String) = Option(GramHash64.compute(UTF8String.fromString(t))).map(_.toLongArray())
    assert(grams("one two").isEmpty)
    val g = grams("a b c d e").get
    assert(g.length == 3) // (a b c), (b c d), (c d e)
    assert(g.sameElements(g.sorted) && g.distinct.length == g.length)
    // duplicated shingles collapse: "a b c a b c" has grams
    // (a b c), (b c a), (c a b), (a b c) -> 3 distinct
    assert(grams("a b c a b c").get.length == 3)
    // extra internal spaces produce the same tokens
    assert(grams("a  b   c d e").get.sameElements(g))
  }

  test("char-gram kernel: distinct grams, codepoint lengths, null under L, SQL parity") {
    import graft.functions.CharGrams
    def cg(t: String, l: Int) =
      Option(CharGrams.compute(UTF8String.fromString(t), l))
        .map(_.toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString))
    assert(cg("abc", 4).isEmpty) // shorter than L -> null
    assert(cg("abcd", 4).get.toSeq == Seq("abcd"))
    assert(cg("abcde", 3).get.toSeq == Seq("abc", "bcd", "cde"))
    // within-doc duplicates collapse, first occurrence kept
    assert(cg("ababab", 2).get.toSeq == Seq("ab", "ba"))
    // codepoints, not bytes: 3 two-byte chars hold exactly one 3-gram
    assert(cg("éèê", 3).get.toSeq == Seq("éèê"))
    assert(cg("éèê", 4).isEmpty)
    // astral (4-byte) chars count as ONE codepoint each, matching
    // Spark's substring and DuckDB's substr
    val astral = "😀a😁" // 😀 a 😁 = 3 codepoints
    assert(cg(astral, 2).get.length == 2)
    // SQL-registered form agrees with the codegen'd path and with the
    // substring reference on real data
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over it"), (2L, "abcabcabc")).toDF("doc_id", "text")
    val viaKernel = docs
      .select(col("doc_id"), explode(call_function("graft_char_grams", col("text"), lit(5))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaSubstr = docs
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("text"), explode(sequence(lit(1), length(col("text")) - 4)).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 5)").as("g"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaKernel == viaSubstr)
  }

  test("char-gram hash kernel: stride sampling, stride-1 count parity, determinism") {
    import graft.functions.CharGrams
    def ch(t: String, l: Int, s: Int) =
      Option(CharGrams.computeHashed(UTF8String.fromString(t), l, s)).map(_.toLongArray())
    assert(ch("abc", 4, 1).isEmpty) // below L -> null, like the string kernel
    // 10 chars, L=4: positions 0..6; stride 1 -> 7 grams, stride 3 -> {0,3,6}
    assert(ch("abcdefghij", 4, 1).get.length == 7)
    assert(ch("abcdefghij", 4, 3).get.length == 3)
    // stride-1 distinct-hash count equals the exact string kernel's
    // distinct-gram count (collision-free at these sizes), incl. repeats
    val rep = "ababababab"
    val strCount = Option(CharGrams.compute(UTF8String.fromString(rep), 2))
      .map(_.numElements()).get
    assert(ch(rep, 2, 1).get.length == strCount)
    // deterministic and sorted
    val a = ch("the quick brown fox jumps", 5, 2).get
    assert(a.sameElements(ch("the quick brown fox jumps", 5, 2).get))
    assert(a.sameElements(a.sorted))
    // equal grams hash equal regardless of position/document
    val h1 = ch("XXXXabcdefghijklmnopqrstuvwxyzABCDEF", 32, 1).get
    val h2 = ch("abcdefghijklmnopqrstuvwxyzABCDEFYYYY", 32, 1).get
    assert(h1.intersect(h2).nonEmpty, "the shared 32-gram must share a hash")
  }

  test("winnow kernel: shared 10-word run guarantees a shared fingerprint") {
    def fp(t: String) =
      Option(GramHash64.winnow(UTF8String.fromString(t))).map(_.toLongArray().toSet)
    assert(fp("a b").isEmpty)
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    val d1 = s"left padding words here $run and a tail"
    val d2 = s"completely other prefix tokens $run different ending words"
    val common = fp(d1).get.intersect(fp(d2).get)
    assert(common.nonEmpty, "10-word shared run must share a fingerprint element")
    assert(fp("x1 x2 x3 x4 x5").get != fp("y1 y2 y3 y4 y5").get)
    // deterministic
    assert(fp(d1).get == fp(d1).get)
  }

  test("graft_collect_capped: sorted under cap, NULL past cap, skips null inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long)](
      (1L, 5L), (1L, 3L), (1L, 9L), // under cap -> sorted [3,5,9]
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L), // over cap(3) -> NULL
      (3L, 7L), (3L, null), // null input skipped -> [7]
      (4L, null) // only nulls -> NULL
    ).toDF("k", "v")
    val out = df
      .groupBy("k")
      .agg(
        expr("graft_collect_capped(v, 3)").as("c"),
        count(col("v")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)))
      .toMap
    assert(out(1L).get == Seq(3L, 5L, 9L))
    assert(out(2L).isEmpty, "past-cap group must evaluate to NULL")
    assert(out(3L).get == Seq(7L))
    assert(out(4L).isEmpty, "all-null group must evaluate to NULL")
    // repartitioned (forces partial/merge path across many partitions):
    // same results — merge must respect the cap and ordering
    val shuffled = df.repartition(7, col("v"))
      .groupBy("k")
      .agg(expr("graft_collect_capped(v, 3)").as("c"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)))
      .toMap
    assert(shuffled == out)
  }

  test("minhash agreement tracks true jaccard on overlapping docs") {
    def sig(t: String) = MinHash64.compute(UTF8String.fromString(t)).toLongArray()
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 to 140).map(i => s"w$i").mkString(" ")
    def agree(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y } / 64.0
    assert(agree(sig(base), sig(near)) > 0.7, "near-dup signatures should mostly agree")
    assert(agree(sig(base), sig(far)) < 0.3, "unrelated signatures should rarely agree")
  }

  test("native kernels survive arbitrary unicode and are deterministic (fuzz)") {
    import org.scalacheck.{Gen, rng}
    import graft.functions.{DeflateLen, SimHash64}
    // generator biased toward the nasty cases: multi-byte UTF-8,
    // surrogate-pair emoji, runs of spaces, empty and huge tokens
    val token = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("日本語のテキスト"),
      Gen.const("😀😀😀"),
      Gen.const("Ωμέγα"),
      Gen.const(""),
      Gen.const("x" * 300),
      Gen.const("  "))
    val textGen = for {
      n <- Gen.choose(0, 40)
      ts <- Gen.listOfN(n, token)
      sep <- Gen.oneOf(" ", "  ", " \t ")
    } yield ts.mkString(sep)
    val seed0 = rng.Seed(424242L)
    val texts = Iterator
      .iterate(seed0)(_.next)
      .take(300)
      .map(s => textGen.pureApply(Gen.Parameters.default, s))
      .toSeq
    for (t <- texts) {
      val u = UTF8String.fromString(t)
      // every kernel: no exception, and run-to-run determinism
      assert(DeflateLen.compute(u) == DeflateLen.compute(u), s"deflate nondet on: $t")
      assert(SimHash64.compute(u) == SimHash64.compute(u), s"simhash nondet on: $t")
      val g1 = Option(GramHash64.compute(u)).map(_.toLongArray.toSeq)
      val g2 = Option(GramHash64.compute(u)).map(_.toLongArray.toSeq)
      assert(g1 == g2, s"grams nondet on: $t")
      val r1 = Option(GramHash64.rolling(u)).map(_.toLongArray.toSeq)
      assert(r1.map(_.sorted.distinct) == g1.map(_.sorted),
        s"positional grams' distinct set must equal graft_grams on: $t")
      val w1 = Option(GramHash64.winnow(u)).map(_.toLongArray.toSeq)
      val w2 = Option(GramHash64.winnow(u)).map(_.toLongArray.toSeq)
      assert(w1 == w2, s"winnow nondet on: $t")
      val m1 = Option(MinHash64.compute(u)).map(_.toLongArray.toSeq)
      assert(m1 == Option(MinHash64.compute(u)).map(_.toLongArray.toSeq), s"minhash nondet on: $t")
      assert(m1.forall(_.size == 64))
      // bpe kernel vs an independent per-text reference (greedy
      // left-to-right merges over CODE-POINT symbols — the fit side's
      // expansion) — exercises surrogate pairs (the 😀😀 merge genuinely
      // fires on the emoji token), space runs, empty words
      val b1 = bpeIds(u)
      assert(b1 == bpeIds(u), s"bpe nondet on: $t")
      assert(b1 == bpeRef(t), s"bpe != reference on: $t")
    }
  }

  private val bpeFuzzTable = new graft.functions.BpeIds.Table(
    Array("a", "ab", "😀", "x"), Array("b", "c", "😀", "x"), Array(1, 2, 3, 4))

  private def bpeIds(u: UTF8String): Seq[Any] =
    graft.functions.BpeIds.tokenize(u, bpeFuzzTable).array.toSeq

  /** Independent reference of the bpe kernel's contract (TrainingSpec's
    * refTokenize specialized to the fuzz table): code-point symbols,
    * greedy left-to-right merges in rank order. */
  private def bpeRef(t: String): Seq[Any] = {
    val merges = Seq((1, "a", "b"), (2, "ab", "c"), (3, "😀", "😀"), (4, "x", "x"))
    val ids = merges.groupBy { case (_, l, r) => l + r }
      .map { case (tx, ms) => (tx, 0x110000 + ms.map(_._1).min) }
    def codePoints(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n)
        i += n
      }
      out.result()
    }
    Option(t).getOrElse("").split(" ", -1).toSeq.filter(_.nonEmpty).flatMap { w =>
      var syms = codePoints(w)
      for ((_, l, r) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (x <- syms)
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        syms = out.toVector
      }
      syms.map(tok =>
        if (tok.codePointCount(0, tok.length) == 1) Int.box(tok.codePointAt(0))
        else ids.get(tok).map(Int.box).orNull)
    }
  }

  test("graft_bpe_ids rejects NULL merge-table elements with a clean analysis error") {
    import spark.implicits._
    val df = Seq("a b").toDF("t")
    // analysis-time rejection (TypeCheckFailure → an AnalysisException
    // subtype, raised eagerly at select()), never a raw NPE from the
    // table parse
    val e = intercept[Exception] {
      df.select(call_function("graft_bpe_ids", col("t"),
        array(lit("a"), lit(null).cast("string")), array(lit("b"), lit("c")),
        array(lit(1), lit(2)))).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL element"),
      s"want a diagnosable analysis message, got: $e")
    assert(!e.isInstanceOf[NullPointerException])
    val e2 = intercept[Exception] {
      df.select(call_function("graft_bpe_ids", col("t"),
        array(lit("a")), array(lit("b")), array(lit(null).cast("int")))).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("NULL element"))
  }

  test("graft_unigram_ids: Viterbi segmentation via SQL front door, astral-safe, unk = -1") {
    import spark.implicits._
    import graft.functions.UnigramIds
    // vocabulary in utf8 id order: cheap 'ab', expensive singles
    val pieces = Seq("a", "ab", "b", "\ud83d\ude00") // last: one astral cp (two UTF-16 chars)
    val costs = Seq(5000000L, 1000000L, 5000000L, 1000000L)
    def ids(t: String): Seq[Int] = Seq(t).toDF("t")
      .selectExpr(
        "graft_unigram_ids(t, " +
          s"array(${pieces.map("'" + _ + "'").mkString(",")}), " +
          s"array(${costs.map(_.toString + "L").mkString(",")})) AS ids")
      .collect()(0).getSeq[Int](0)
    // 'ab' (cost 1e6) beats 'a'+'b' (1e7): one piece id 1
    assert(ids("ab") == Seq(1), s"got ${ids("ab")}")
    // two words, unknown 'z' -> -1; astral char is ONE symbol with its id
    assert(ids("ab z") == Seq(1, -1))
    assert(ids("\ud83d\ude00ab") == Seq(3, 1),
      "astral code point must segment as one symbol (fit/apply consistency)")
    // longest-achieving tie rule: 'aab' -> a + ab (backtrack takes the
    // LONGEST piece at the word end first)
    assert(ids("aab") == Seq(0, 1))
    // arity + null-table rejection surface as analysis errors, not NPEs
    val e = intercept[Exception] {
      Seq("x").toDF("t").selectExpr("graft_unigram_ids(t, array('a'), array(1L, 2L))").collect()
    }
    assert(e.getMessage.contains("disagree") && !e.isInstanceOf[NullPointerException])
    val e2 = intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("graft_unigram_ids", col("t"),
          array(lit("a"), lit(null).cast("string")), array(lit(1L), lit(2L)))).collect()
    }
    assert(e2.getMessage.contains("NULL element"))
    // NULL text -> empty array, never NULL (the BpeIds contract)
    val n = Seq((1, null: String)).toDF("i", "t")
      .selectExpr("graft_unigram_ids(t, array('a'), array(1L)) AS ids").collect()(0)
    assert(!n.isNullAt(0) && n.getSeq[Int](0).isEmpty)
  }

  test("deflate kernel: deterministic, positive, repetition compresses far below entropy") {
    import graft.functions.DeflateLen
    def dl(t: String) = DeflateLen.compute(UTF8String.fromString(t))
    val loop = "spam ham " * 500                      // degenerate machine loop
    val rnd = new scala.util.Random(7)
    val entropy = Array.fill(4500)(('a' + rnd.nextInt(26)).toChar).mkString
    assert(dl(loop) == dl(loop), "non-deterministic compression")
    assert(dl(loop) > 0 && dl(entropy) > 0)
    // same length inputs: the loop must compress at least 10× below the
    // high-entropy text — the separation the quality filter rests on
    assert(loop.length == entropy.length, "fixture lengths drifted")
    assert(dl(loop) * 10 < dl(entropy),
      s"loop=${dl(loop)} entropy=${dl(entropy)} — compressibility signal has no separation")
    // the operator on the real (ASCII) table: independent range property —
    // prose never compresses to nothing, and DEFLATE of text never
    // exceeds input by more than framing slack
    val cr = graft.operators.TextAnalysis.compressRatio(spark, sfDir)
    assert(cr.filter(col("deflate_len") <= 0).count() == 0)
    assert(cr.filter(col("compress_ratio") <= 0.05 || col("compress_ratio") > 1.1).count() == 0,
      "compress_ratio outside the plausible text band (0.05, 1.1]")
  }

  test("bloom kernel: no false negatives, bounded false positives, NULL key false") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(10000, 0.03)
    val rnd = new scala.util.Random(11)
    val present = Array.fill(10000)(rnd.nextLong())
    present.foreach(bf.putLong)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    // the sketch contract the admission operator's exactness rests on:
    // EVERY inserted key answers true
    val inDf = present.toSeq.toDF("k")
      .select(call_function("graft_bloom_contains", lit(bytes), col("k")).as("m"))
    assert(inDf.filter(!col("m")).count() == 0, "false negative — sketch contract broken")
    // disjoint probe keys: observed fpp within 3x nominal (seeded, stable)
    val presentSet = present.toSet
    val absent = Iterator.continually(rnd.nextLong()).filterNot(presentSet).take(20000).toSeq
    val fp = absent.toDF("k")
      .select(call_function("graft_bloom_contains", lit(bytes), col("k")).as("m"))
      .filter(col("m")).count()
    assert(fp < 20000 * 0.03 * 3, s"observed fpp ${fp / 20000.0} vs nominal 0.03")
    // NULL key is false, never NULL (a NULL never entered the filter)
    val nullRow = Seq(Tuple1(Option.empty[Long])).toDF("k")
      .select(call_function("graft_bloom_contains", lit(bytes), col("k")).as("m"))
      .collect()
    assert(!nullRow.head.isNullAt(0) && !nullRow.head.getBoolean(0))
  }

  test("char-trigram bucket kernel equals the declarative md5 census (unicode fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // mixed ascii / multi-byte / astral content, incl. sub-3-char texts
    val pool = "abc def παρά 漢字 🙂x yz "
    def randText(): String =
      (0 until rnd.nextInt(40)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    val texts = Seq.fill(200)(randText()) :+ "" :+ "ab" :+ "αβ" :+ "🙂🙂🙂🙂"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    df.createOrReplaceTempView("tri_fuzz")
    val nat = spark.sql(
      """SELECT doc_id, p DIV 1099511627776 AS bucket, p % 1099511627776 AS occ
         FROM tri_fuzz LATERAL VIEW explode(graft_char_trigram_buckets(text)) AS p""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = spark.sql(
      """SELECT doc_id,
                CAST(conv(substring(md5(g), 1, 3), 16, 10) AS BIGINT) AS bucket,
                CAST(COUNT(*) AS BIGINT) AS occ
         FROM (SELECT doc_id, explode(transform(sequence(1, length(text) - 2),
                        i -> substring(text, i, 3))) AS g
               FROM tri_fuzz WHERE length(text) >= 3)
         GROUP BY doc_id, 2""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(nat == ref, s"kernel census diverged from declarative md5 census")
    assert(nat.nonEmpty)
    // determinism across evaluations
    val nat2 = spark.sql(
      """SELECT doc_id, p DIV 1099511627776 AS bucket, p % 1099511627776 AS occ
         FROM tri_fuzz LATERAL VIEW explode(graft_char_trigram_buckets(text)) AS p""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(nat2 == nat)
  }

  test("lsh probes kernel: base parity, margin-ordered single-bit flips, 18 probes") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vecs = Seq.fill(120)(Array.fill(64)(rnd.nextLong() % 20000))
    val df = vecs.map(Tuple1(_)).toDF("qv")
    val out = df.select(
      call_function("graft_lsh_buckets", col("qv")).as("base"),
      call_function("graft_lsh_probes", col("qv")).as("probes")).collect()
    // driver-side margin replay with the pinned weight formula
    def weights(t: Int, p: Int): Array[Long] =
      Array.tabulate(64)(d => (((t * 31 + p) * 97 + d) * 40503L) % 65536L - 32768L)
    for ((v, r) <- vecs.zip(out)) {
      val base = r.getSeq[Long](0)
      val probes = r.getSeq[Long](1)
      assert(probes.length == 18, s"expected 6 tables x 3 probes, got ${probes.length}")
      for (t <- 0 until 6) {
        val trio = probes.slice(t * 3, t * 3 + 3)
        assert(trio.head == base(t), s"table $t: probe 0 must be the own bucket")
        val margins = (0 until 4).map { p =>
          (math.abs(v.zip(weights(t, p)).map { case (x, w) => x * w }.sum), p)
        }.sorted
        assert(trio(1) == (base(t) ^ (1L << margins(0)._2)),
          s"table $t: probe 1 must flip the smallest-margin plane")
        assert(trio(2) == (base(t) ^ (1L << margins(1)._2)),
          s"table $t: probe 2 must flip the second-smallest-margin plane")
        // every flip is exactly one bit away and distinct from the base
        assert(trio.tail.forall(b =>
          java.lang.Long.bitCount(b ^ base(t)) == 1 && b != base(t)))
      }
    }
  }

  test("SQL front door: wrong argument count is a clean analysis-time error") {
    // the builder arity gate: a miscounted call must surface as an
    // error naming the expected signature, never an
    // IndexOutOfBoundsException escaping the builder lambda
    import spark.implicits._
    val df = Seq("abc").toDF("text")
    df.createOrReplaceTempView("arity_probe")
    for ((sqlCall, sig) <- Seq(
        ("graft_char_grams(text)", "graft_char_grams(text, L)"),
        ("graft_char_grams_hash(text, 8)", "graft_char_grams_hash(text, L, stride)"),
        ("graft_dot(array(1L))", "graft_dot(a, b)"),
        ("graft_simhash(text, 1)", "graft_simhash(text)"))) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT $sqlCall FROM arity_probe").collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      val all = chain(e)
      assert(!all.exists(_.isInstanceOf[IndexOutOfBoundsException]),
        s"$sqlCall leaked IndexOutOfBoundsException")
      assert(all.exists(t => Option(t.getMessage).exists(_.contains(sig))),
        s"$sqlCall error does not name the signature $sig: ${e.getMessage}")
    }
  }
}
