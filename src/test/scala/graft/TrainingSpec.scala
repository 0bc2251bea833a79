package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.embed.Similarity
import graft.text.TextFns
import graft.ops.TrainingSuite
import graft.functions.RollingHash

class TrainingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = TrainingSuite.dupCorpus(spark, TestSpark.sf0001).cache()

  test("exact dedup groups the injected normalized duplicates") {
    val e = Dedup.exact(corpus)
    // every doc_id%10==5 original got an upper+whitespace twin at +200000
    val twins = e.filter($"doc_id" >= 200000)
    assert(twins.count() === 50)
    assert(twins.filter($"rep_id" === $"doc_id" - 200000).count() === 50)
    assert(twins.filter($"group_size" >= 2).count() === 50)
  }

  test("minhash pairs: precision 1.0 and high recall vs exact jaccard") {
    val exact = Dedup.jaccardPairs(corpus, 3, 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(corpus, 3, 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(exact)) // verified candidates => precision 1.0
    assert(exact.nonEmpty)
    val recall = mh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${mh.size}/${exact.size})")
  }

  test("minhash on a duplicate-heavy corpus: exact groups collapse before LSH") {
    // 1000 identical docs + 5 distinct: naive LSH would generate ~500k
    // candidate pairs and verify each with a shingle join; the exact
    // pre-pass collapses them to ONE representative, and the C(1000,2)
    // output pairs come from a pure join expansion.
    val dups = Seq.tabulate(1000)(i =>
      (i.toLong, "the same exact duplicated text repeated across the corpus many times"))
    val uniq = Seq.tabulate(5)(i =>
      (10000L + i, s"completely different document number $i talking about topic-$i only"))
    val docs = (dups ++ uniq).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, 3, 0.6).cache()
    assert(pairs.count() === 1000L * 999 / 2)
    assert(pairs.filter($"jaccard" === 1.0d).count() === 1000L * 999 / 2)
    pairs.unpersist()
  }

  test("simhash: identical normalized docs at hamming 0; pairs found") {
    val pairs = Dedup.simhashPairs(corpus)
    val exactTwins = pairs.filter($"a" + 200000 === $"b" && $"hamming" === 0)
    assert(exactTwins.count() === 50)
  }

  test("rolling_hash native expression matches reference implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val inputs = Seq("abc", "", "hello world", "üñïçødé", "a" * 1000)
    val got = inputs.toDF("s").select(RollingHash($"s").as("h"))
      .as[Long].collect()
    assert(got.toSeq === inputs.map(ref))
    // codegen path actually exercised over a real scan (no fallback)
    val fpPlan = TextFns.fingerprint(
      spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"))
    // `*(1) Project [... rolling_hash ...]` — the star marks the
    // WholeStageCodegen stage; rolling_hash must sit inside it
    val planStr = fpPlan.queryExecution.executedPlan.toString
    assert(planStr.contains("*(1) Project") && planStr.contains("rolling_hash"),
      planStr)
    assert(fpPlan.count() === 500) // executes the generated code
  }

  test("fingerprint: normalized duplicates collide, distinct docs spread") {
    val fp = TextFns.fingerprint(corpus).cache()
    // the +200000 twins differ only by case/whitespace => same fingerprint
    val twins = fp.as("x").join(fp.as("y"),
      col("x.doc_id") + 200000 === col("y.doc_id"))
    assert(twins.count() === 50)
    assert(twins.filter(col("x.fingerprint") === col("y.fingerprint"))
      .count() === 50)
    // base corpus texts are distinct => fingerprints (near-)distinct
    val base = fp.filter($"doc_id" < 100000)
    assert(base.select("fingerprint").distinct().count() >= base.count() - 2)
  }

  test("ann results are consistent with brute force sims") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 3, 50)
      .select($"probe_id", $"vec_id", $"sim").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val ann = Similarity.annTopK(emb, col("vec_id") < 3, 10, nPlanes = 4)
      .select($"probe_id", $"vec_id", $"sim").as[(Long, Long, Double)]
      .collect()
    assert(ann.nonEmpty)
    // every ANN sim must equal the exact cosine when the pair is in bf's 50
    ann.foreach { case (p, v, s) =>
      bf.get((p, v)).foreach(exact => assert(math.abs(exact - s) < 1e-9))
    }
  }
}
