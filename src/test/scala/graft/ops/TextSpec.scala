package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K5/K6/K8 + langid + fingerprint sketch unit coverage. */
class TextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("langid identifies real-language samples via marker words") {
    val samples = Seq(
      ("en", "the cat sat on the mat and the dog is here"),
      ("de", "der hund und die katze das ist gut"),
      ("es", "el perro y la casa que los gatos es bueno"),
      ("fr", "le chien est dans la maison les chats une porte"),
      ("zh", "这 是 一个 测试 的 句子 在 这里 了"),
      ("und", "qwerty asdfgh zxcvbn"))
    val got = samples.toDF("expected", "text")
      .withColumn("predicted", Text.langid($"text"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("predicted") == r.getAs[String]("expected"),
        s"text: ${r.getAs[String]("text")}")
    }
  }

  test("sentiment: lexicon hits sum per doc; docs without hits absent") {
    val docs = Seq(
      (1L, "fast join fast error"), // 2+1+2-2 = 3, 4 matches
      (2L, "zzz qqq")
    ).toDF("doc_id", "text")
    val got = Text.sentiment(spark, docs, "text", "doc_id").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("score_sum") == 3L)
    assert(got.head.getAs[Long]("n_matched") == 4L)
  }

  test("quality metrics and keep rule") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // keep
      (2L, "a b"),                                 // too few words
      (3L, "the the the the of of of and and to") // stopword ratio 1.0
    ).toDF("doc_id", "text")
    val q = Text.withQualityMetrics(df, "text")
    val kept = q.filter(Text.qualityKeep).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    val r1 = q.filter($"doc_id" === 1).head()
    assert(r1.getAs[Int]("n_words") == 6)
    assert(math.abs(r1.getAs[Double]("stop_ratio")) < 1e-12)
  }

  test("fingerprint sketch: identical docs → similarity 1; near docs high; " +
    "disjoint docs 0") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 39).map(i => s"w$i").mkString(" ")
    val c = (100 to 140).map(i => s"x$i").mkString(" ")
    val df = Seq((a, a), (a, b), (a, c)).toDF("t1", "t2")
      .select(Text.sketchSimilarity(
        Text.fingerprintSketch($"t1", 3, 16),
        Text.fingerprintSketch($"t2", 3, 16)).as("sim"))
    val sims = df.collect().map(_.getDouble(0))
    assert(sims(0) == 1.0)
    assert(sims(1) > 0.5)
    assert(sims(2) == 0.0)
  }

  test("redactPii scrubs emails, phones, IPv4s; idempotent; leaves clean text") {
    val docs = Seq(
      ("a", "mail bob.smith+x@sub.example.co.uk now"),
      ("b", "call 415-555-0199 or visit 192.168.001.1 today"),
      ("c", "mixed a@b.org 555-555-5555 10.0.0.1"),
      ("d", "clean text with digits 12345 and dots a.b but no pii"),
      ("e", "not-an-ip 1.2.3 and 1.2.3.4.5 edge"),
      // octet-bounded pattern (VERDICT r7 wrong #3): >255 octets never match
      ("f", "bogus 999.999.999.999 and 256.1.1.1 stay"),
      // zero-padded display octets and version-string-shaped VALID quads
      // both redact (recall-biased by design — see Text.piiPatterns)
      ("g", "padded 010.001.000.255 and ver 1.2.3.4 go")).toDF("id", "text")
    val got = docs.select($"id", Text.redactPii($"text").as("r"))
      .as[(String, String)].collect().toMap
    assert(got("a") == "mail <EMAIL> now")
    assert(got("b") == "call <PHONE> or visit <IP> today")
    assert(got("c") == "mixed <EMAIL> <PHONE> <IP>")
    assert(got("d") == "clean text with digits 12345 and dots a.b but no pii")
    // 1.2.3 is not an IP; 1.2.3.4.5 — RE2/java both match the leading
    // 4-octet run (the \b after '4' holds because '.' is a non-word char)
    assert(got("e") == "not-an-ip 1.2.3 and <IP>.5 edge")
    assert(got("f") == "bogus 999.999.999.999 and 256.1.1.1 stay")
    assert(got("g") == "padded <IP> and ver <IP> go")
    // idempotent: replacement tokens contain no redactable substrings
    val twice = docs.select(Text.redactPii(Text.redactPii($"text")).as("r"))
      .as[String].collect().toSet
    assert(twice == got.values.toSet)
  }

  test("chunkDocs: stride/overlap boundaries, full coverage, short docs pass through") {
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, mk(10)), (2L, mk(5)), (3L, mk(4)), (4L, mk(1)))
      .toDF("doc_id", "text")
    val chunks = Text.chunkDocs(docs, "text", window = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk_tok", "chunk_text")
      .as[(Long, Int, Long, String)].collect().sortBy(c => (c._1, c._2)).toSeq
    // n=10, W=4, stride=3: m = 1+ceil(6/3) = 3; [t1..t4][t4..t7][t7..t10]
    assert(chunks.filter(_._1 == 1L).map(c => (c._2, c._4)) == Seq(
      (0, "t1 t2 t3 t4"), (1, "t4 t5 t6 t7"), (2, "t7 t8 t9 t10")))
    // n=5: m = 2, last chunk is the 2-token tail with 1 overlap token
    assert(chunks.filter(_._1 == 2L).map(c => (c._2, c._4)) == Seq(
      (0, "t1 t2 t3 t4"), (1, "t4 t5")))
    // n <= W: one chunk, text unchanged
    assert(chunks.filter(_._1 == 3L).map(_._4) == Seq("t1 t2 t3 t4"))
    assert(chunks.filter(_._1 == 4L).map(_._4) == Seq("t1"))
    // every chunk within the window; coverage: dropping each chunk's
    // leading overlap (after the first) reconstructs the doc exactly
    assert(chunks.forall(c => c._3 >= 1 && c._3 <= 4))
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val cs = chunks.filter(_._1 == id).sortBy(_._2).map(_._4.split(" ").toSeq)
      val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(1))
      assert(rebuilt == mk(rebuilt.length).split(" ").toSeq &&
        rebuilt.length == Seq(10, 5, 4, 1)(id.toInt - 1))
    }
    // invalid parameters fail loudly
    intercept[IllegalArgumentException](Text.chunkDocs(docs, "text", 4, 4))
  }

  test("k32 rarity buckets: integer scoring on a hand corpus; vocab join " +
    "is a broadcast") {
    // The fixture entry is exercised for its output shape + broadcast
    // plan; the toy corpus below pins the integer scoring itself.
    val df = KQueries.k32(spark, graft.TestSpark.sf)
    assert(df.columns.toSeq ==
      Seq("lang", "bucket", "n_docs", "sum_score"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // hand-check the floor semantics through the same expression
    import spark.implicits._
    val toy = Seq((1L, "a a a a"), (2L, "b c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val toks = toy.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("w"))
    val cnt = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("t"))
    val scores = toks.join(broadcast(cnt), Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(expr("sum(t DIV c) DIV count(1)").as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // T=8: c(a)=5, c(b)=2, c(c)=1 ⇒ per-token T DIV c: a→1, b→4, c→8.
    // doc1: (1·4) DIV 4 = 1; doc2: (4+8) DIV 2 = 6;
    // doc3: (1+4) DIV 2 = 2 — the floor of 2.5, pinning integer (not
    // float-mean) semantics.
    assert(scores === Map(1L -> 1L, 2L -> 6L, 3L -> 2L))
  }

  test("BPE encoder (k39): greedy rank-order merges, hand-computed cases") {
    def count(word: String, merges: Seq[String]): Long =
      Seq(word).toDF("w")
        .select(Text.bpeTokenCount($"w",
          array(merges.map(lit): _*)).as("n"))
        .as[Long].head()
    // merge (a,b) fuses EVERY left-to-right occurrence, then (b,c)
    // finds its operand consumed: abcab -> [ab, c, ab]
    assert(count("abcab", Seq("ab", "bc")) === 3L)
    // consecutive occurrences all fuse in one pass: abab -> [ab, ab]
    assert(count("abab", Seq("ab")) === 2L)
    // overlap resolves left-to-right: aaa under (a,a) -> [aa, a]
    assert(count("aaa", Seq("aa")) === 2L)
    // rank order decides which pairs survive: under ranks [bc, ab],
    // abcab -> a [bc] a b, then the trailing (a,b) still fuses -> 3
    assert(count("abcab", Seq("bc", "ab")) === 3L)
    // ...and can change the COUNT: aabb under [ab, aa, bb] fuses the
    // middle pair first, blocking both outer merges (a [ab] b = 3);
    // under [aa, bb, ab] the outer pairs fuse ([aa] [bb] = 2)
    assert(count("aabb", Seq("ab", "aa", "bb")) === 3L)
    assert(count("aabb", Seq("aa", "bb", "ab")) === 2L)
    // no merges: plain character count
    assert(count("hello", Nil) === 5L)
    // a merge can never fire inside an already-merged token: abc under
    // [ab] leaves [ab, c]; a later (b,c) must not split ab
    assert(count("abc", Seq("ab", "bc")) === 2L)
  }

  test("BPE merges derive deterministically by (count DESC, bigram ASC) " +
    "and whitespace-vs-BPE window budgets DIFFER on the fixture (k39 " +
    "vs k22)") {
    val docs = Seq(
      (1L, "s1", "aa ab aa"), (2L, "s1", "ab aa xy"))
      .toDF("doc_id", "source", "text")
    // bigrams: aa x3 (two docs' aa's... doc1: aa, ab, aa; doc2: ab, aa, xy
    // -> aa:3, ab:2, xy:1); topM=2 -> [aa, ab]
    val ms = Text.bpeMerges(docs, "text", topM = 2)
      .as[Seq[String]].head()
    assert(ms === Seq("aa", "ab"))
    // fixture divergence: whitespace token budget != BPE token budget,
    // so the two packing entries answer differently on the same corpus
    val sf = "/root/testdata/sf0.001"
    val k22 = graft.ops.KQueries.declared
      .find(_._1 == "k22_sequence_packing").get._2(spark, sf)
      .select("source", "sum_tokens").as[(String, Long)].collect().toMap
    val k39 = graft.ops.KQueries.declared
      .find(_._1 == "k39_bpe_packing").get._2(spark, sf)
      .select("source", "sum_tokens").as[(String, Long)].collect().toMap
    assert(k22.nonEmpty && k39.nonEmpty)
    assert(k22 !== k39,
      "BPE token budgets must differ from whitespace budgets on the fixture")
    // per-doc direction (unfiltered, so the comparison is apples-to-
    // apples): a word is >= 1 subword, so BPE never undercounts — and on
    // real text it strictly overcounts somewhere
    val fixtureDocs = graft.Tables.load(spark, sf, "documents")
    val merges = Text.bpeMerges(fixtureDocs, "text", topM = 32)
    val perDoc = fixtureDocs.crossJoin(broadcast(merges))
      .select(
        size(Text.tokens($"text")).cast("long").as("n_word"),
        Text.bpeDocTokens($"text", $"merges").as("n_bpe"))
      .agg(
        sum(when($"n_bpe" < $"n_word", 1).otherwise(0)).as("undercounts"),
        sum(when($"n_bpe" > $"n_word", 1).otherwise(0)).as("overcounts"))
      .as[(Long, Long)].head()
    assert(perDoc._1 === 0L, "BPE must never undercount words")
    assert(perDoc._2 > 0L, "BPE must strictly overcount on real text")
  }
}
