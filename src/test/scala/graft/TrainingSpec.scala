package graft

import graft.operators.{CorpusOps, TextAnalysis, Training}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The trainable-artifact pipeline: BPE apply (token ids), materialized
  * sequence packing, and the split-partitioned export — the spec-side
  * twin of [[Training]]'s scaladoc contracts. */
class TrainingSpec extends GraftSpecBase {

  /** Plain-Scala reference tokenizer: greedy left-to-right application of
    * each learned merge in rank order (the reference twin of
    * [[TextAnalysis.bpeMergePass]]), then the id scheme — code point for
    * single-code-point symbols, 0x110000 + min rank for merged texts.
    * Symbols are CODE POINTS (an astral char is one symbol), matching
    * bpeTrain's substring() fit-side expansion — the fit/apply
    * consistency contract. */
  private def refTokenize(text: String, merges: Seq[(Int, String, String)]): Vector[Int] = {
    val idsByText = merges
      .groupBy { case (_, l, r) => l + r }
      .map { case (t, ms) => (t, 0x110000 + ms.map(_._1).min) }
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
    Option(text)
      .getOrElse("")
      .split(" ", -1)
      .toVector
      .filter(_.nonEmpty)
      .flatMap { w =>
        var syms = codePoints(w)
        for ((_, l, r) <- merges.sortBy(_._1)) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- syms)
            if (out.nonEmpty && out.last == l && x == r) {
              out.remove(out.length - 1); out += (l + r)
            } else out += x
          syms = out.toVector
        }
        syms.map(t =>
          if (t.codePointCount(0, t.length) == 1) t.codePointAt(0) else idsByText(t))
      }
  }

  private def collectMerges(): Seq[(Int, String, String)] =
    TextAnalysis
      .bpeTrain(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq
      .sortBy(_._1)

  test("tokenizeIds equals the plain-Scala reference tokenizer on every doc") {
    val merges = collectMerges()
    val got = Training
      .tokenizeIdsRaw(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](3).toVector, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val texts = graft.sources.Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    assert(got.length == texts.length, "one output row per document")
    got.zip(texts).foreach { case ((id, ids, nIds, nMerged), (tid, text)) =>
      assert(id == tid)
      val want = refTokenize(text, merges)
      assert(ids == want, s"doc $id: operator ids != reference ids")
      assert(nIds == ids.length.toLong)
      assert(nMerged == ids.count(_ >= 0x110000).toLong)
    }
    // the learned merges genuinely fire: some ids are merged tokens
    assert(got.map(_._4).sum > 0, "no merged token ever produced — apply side inert")
  }

  test("driver-facing fingerprints equal a JVM reference digest of the raw arrays") {
    def refMd5(ids: Seq[Int]): String =
      java.security.MessageDigest
        .getInstance("MD5")
        .digest(ids.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
    val raw = Training
      .tokenizeIdsRaw(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](3)))
      .toMap
    val fp = Training.tokenizeIds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(fp.length == raw.size, "fingerprint projection must keep one row per doc")
    fp.foreach { case (id, m) => assert(m == refMd5(raw(id)), s"doc $id fingerprint drifts") }
    // and the packed side: same move, same digest contract, keyed per
    // (split, seq_id)
    val rawSeq = Training
      .packIdsRaw(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getSeq[Int](6)))
      .toMap
    val fpSeq = Training.packIds(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getString(6)))
    assert(fpSeq.length == rawSeq.size)
    fpSeq.foreach { case (k, m) => assert(m == refMd5(rawSeq(k)), s"seq $k fingerprint drifts") }
  }

  test("packRows tiles the corpus gaplessly and matches a sequential reference") {
    val L = 2048L
    val rows = Training
      .packRows(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .sortBy(_._1)
    // sequential reference: every non-empty doc's whitespace tokens in
    // doc_id order, as one global stream
    val docs = graft.sources.Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (_, t) => t != null && t.trim.nonEmpty }
      .sortBy(_._1)
    val stream = docs.flatMap { case (id, t) => t.split(" ", -1).map(tok => (id, tok)) }
    val total = stream.length.toLong
    assert(rows.map(_._2).sum == total, "token conservation")
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong).toSeq, "seq_id contiguous from 0")
    rows.init.foreach { case (sid, n, _, _, _, _) => assert(n == L, s"seq $sid not full") }
    assert(rows.last._2 == (if (total % L == 0) L else total % L), "ragged tail length")
    // content: every sequence's md5 equals the reference slice's md5
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (sid, _, nDocs, firstDoc, lastDoc, gotMd5) =>
      val slice = stream.slice((sid * L).toInt, math.min((sid + 1) * L, total).toInt)
      val wantMd5 = md
        .digest(slice.map(_._2).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      assert(gotMd5 == wantMd5, s"seq $sid content diverges from the sequential reference")
      val docsIn = slice.map(_._1).distinct
      assert(nDocs == docsIn.length.toLong && firstDoc == docsIn.min && lastDoc == docsIn.max)
    }
    // cross-operator pin: corpus_pack's per-doc n_seqs and packRows'
    // per-seq n_docs count the same (doc × seq) incidences
    val packMeta = CorpusOps.corpusPack(spark, sfDir).agg(sum(col("n_seqs"))).head.getLong(0)
    assert(rows.map(_._3).sum == packMeta, "placement metadata and materialized rows disagree")
  }

  test("packIds: per-split gapless coverage, exact-L sequences, no cross-split mixing") {
    spark.conf.set("spark.graft.corpus.packSeqLen", "7")
    try {
      val seqs = Training
        .packIdsRaw(spark, sfDir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Int](6).toVector))
      val docIds = Training
        .tokenizeIdsRaw(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Int](3).toVector))
        .filter(_._2.nonEmpty)
        .sortBy(_._1)
        .toVector
      val splitOf = CorpusOps
        .dataSplit(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getString(3)))
        .toMap
      for (split <- Seq("train", "val", "test")) {
        val want = docIds.filter { case (id, _) => splitOf(id) == split }.flatMap(_._2)
        val got = seqs.filter(_._1 == split).sortBy(_._2).toVector
        assert(got.nonEmpty, s"$split produced no sequences at L=7")
        assert(got.map(_._2) == (0L until got.length.toLong).toVector,
          s"$split seq_id not contiguous")
        got.init.foreach { case (_, sid, n, ids) =>
          assert(n == 7L && ids.length == 7, s"$split seq $sid not exactly L")
        }
        assert(got.flatMap(_._4) == want,
          s"$split: packed id stream != doc-order tokenized stream")
      }
      assert(seqs.map(_._3).sum == docIds.map(_._2.length.toLong).sum, "id conservation")
    } finally spark.conf.unset("spark.graft.corpus.packSeqLen")
  }

  test("seqBounds: fragments tile every sequence gaplessly and agree with packRows") {
    val bounds = Training.seqBounds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = Training.packRows(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // seq_id, n_tokens, n_docs
      .sortBy(_._1)
    val bySeq = bounds.groupBy(_._1)
    assert(bySeq.keySet == rows.map(_._1).toSet, "same sequence set as packRows")
    for ((sid, nTok, nDocs) <- rows) {
      val fr = bySeq(sid).sortBy(_._3)
      assert(fr.length.toLong == nDocs, s"seq $sid: fragment count != packRows n_docs")
      assert(fr.map(_._4).sum == nTok, s"seq $sid: fragment tokens != packRows n_tokens")
      // gapless within-sequence tiling from offset 0
      var off = 0L
      for ((_, _, startOff, n) <- fr) {
        assert(startOff == off, s"seq $sid: gap at $off (fragment starts $startOff)")
        off += n
      }
    }
  }

  test("epochPlan: each epoch is a dense-per-shard permutation of the sequence set") {
    val plan = Training.epochPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val seqIds = Training.packRows(spark, sfDir).collect().map(_.getLong(0)).toSet
    for (ep <- Seq(0L, 1L)) {
      val rows = plan.filter(_._1 == ep)
      assert(rows.map(_._4).toSet == seqIds, s"epoch $ep must cover every sequence once")
      assert(rows.length == seqIds.size)
      for ((sh, xs) <- rows.groupBy(_._2))
        assert(xs.map(_._3).sorted.toSeq == (1L to xs.length).toSeq,
          s"epoch $ep shard $sh positions not dense from 1")
    }
    // the two epochs genuinely differ (the permutation is epoch-keyed)
    val order0 = plan.filter(_._1 == 0L).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    val order1 = plan.filter(_._1 == 1L).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order0 != order1, "epoch permutations must differ")
  }

  test("packedTrainingExport lands split-partitioned and a train read prunes") {
    val dir = Files.createTempDirectory("graft_train").toString
    Training.packedTrainingExport(spark, sfDir, s"$dir/export")
    val dirs = new java.io.File(s"$dir/export")
      .listFiles()
      .map(_.getName)
      .filter(_.startsWith("split="))
    assert(dirs.toSet == Set("split=train", "split=val", "split=test"),
      s"unexpected partition layout: ${dirs.toSeq}")
    val train = spark.read.parquet(s"$dir/export").filter(col("split") === "train")
    val plan = train.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*split".r.findFirstIn(plan).isDefined,
      s"split filter not pushed to partition pruning:\n$plan")
    val direct = Training.packIds(spark, sfDir).filter(col("split") === "train")
    assert(train.count() == direct.count() && train.count() > 0)
    assert(spark.read.parquet(s"$dir/export").count() ==
      Training.packIds(spark, sfDir).count())
  }

  test("curriculum: NTILE balance, monotone phase boundaries, covers every sequence") {
    val out = Training.curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // every packed sequence id gets exactly one phase row
    val seqIds = Training.seqBounds(spark, sfDir)
      .select("seq_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == seqIds && out.length == seqIds.size,
      "curriculum rows must cover the sequence set exactly once")
    // NTILE(3) balance: group sizes differ by at most one, phases 1..3
    val sizes = out.groupBy(_._4).map { case (k, v) => k -> v.length }
    assert(sizes.keySet.subsetOf(Set(1, 2, 3)), s"phases out of range: $sizes")
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced tiles: $sizes")
    // phases are monotone in (mean quality, seq_id): sorting by the rank
    // key must yield phase 1 block, then 2, then 3
    val ordered = out.sortBy(r => (r._3, r._1)).map(_._4)
    assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a <= b },
      "phase assignment not monotone in the rank order")
    // the weighted mean is genuinely token-weighted: recompute one
    // sequence by hand from fragments + quality
    val q = TextAnalysis.quality(spark, sfDir)
      .select(col("doc_id"), floor(col("quality_score") * 1000000).cast("long").as("qu"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frags = Training.seqBounds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val someSeq = out.head._1
    val fs = frags.filter(_._1 == someSeq)
    val num = fs.map { case (_, d, n) => n * q(d) }.sum
    val den = fs.map(_._3).sum
    val expect = out.find(_._1 == someSeq).get
    assert(expect._2 == den && expect._3 == num / den, s"weighted mean mismatch for seq $someSeq")
  }
}
