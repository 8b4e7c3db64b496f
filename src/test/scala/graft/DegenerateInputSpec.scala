package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness under Spark 4's default ANSI mode: the
  * rows a 100 TB corpus is guaranteed to contain — empty text, NULL
  * text, zero-norm and NULL embeddings, empty frames — must flow
  * through the operator families without an ANSI arithmetic throw, and
  * must come out with DOCUMENTED values (NULL cosine, 0.0 ratios, null
  * cluster, loud requires for genuinely-undefined ops). The r13 cosine
  * zero-norm fix was found by exactly this class of probe; this spec
  * pins the whole family so a future expression rewrite cannot silently
  * reintroduce an `x / 0` on the hot path.
  *
  * Note this session runs with whatever ansi default the build ships —
  * the zero-division probes are meaningful either way: under ANSI they
  * assert no-throw, without ANSI they assert the documented values
  * (never NaN leaking into a gated comparison).
  */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("quality/text functions: empty, null, punct-only, whitespace-only text") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, ""), (2L, null.asInstanceOf[String]), (3L, "!!!...???"),
      (4L, "   \t  \n "), (5L, "one normal sentence here."))
      .toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.stopwordRatio(col("text")).as("sr"),
        TextFunctions.punctRatio(col("text")).as("pr"),
        TextFunctions.meanTokenLen(col("text")).as("mtl"),
        TextFunctions.fleschScore(col("text")).as("fl"),
        TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // empty text: every ratio 0.0 by the documented guards
    assert(out(1L).getDouble(2) === 0.0 && out(1L).getDouble(3) === 0.0)
    assert(out(1L).getDouble(5) === 0.0) // flesch empty → 0
    // null text: null propagates, never throws
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(5))
    // whitespace-only: zero tokens, ratios still defined
    assert(out(4L).getInt(6) === 0 && out(4L).getDouble(2) === 0.0)
    // punct-only text: punctRatio 1.0, qualityScore still in [0, 1]
    assert(out(3L).getDouble(3) === 1.0)
    assert(out(3L).getDouble(1) >= 0.0 && out(3L).getDouble(1) <= 1.0)
  }

  test("cosine family: zero-norm and null vectors yield NULL cos, never throw") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]]), (4L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val cos = df.select(col("vec_id"),
        Similarity.cosineLit(col("embedding"), Seq(1.0, 0.0)).as("cos"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(cos(1L) === Some(1.0))
    assert(cos(2L) === None) // zero norm → NULL, the r13 contract
    assert(cos(3L) === None) // null vector propagates
    // top-k ranks NULL cos last — the live rows fill k first
    val topIds = Similarity.cosineTopK(df, "vec_id", "embedding",
      Seq(1.0, 0.0), k = 2).collect().map(_.getLong(0)).toSet
    assert(topIds === Set(1L, 4L))
  }

  test("semDedupLsh and its ingest form tolerate zero/null vectors") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // exact dup of 1 → dropped
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))  // zero vector
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedupLsh(df, "vec_id", "embedding",
        dim = 4, bits = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) === true && out(2L) === false)
    assert(out(3L) === true) // NULL cos matches nothing → kept
    val standing = df.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 4, 2).as("cluster"),
      col("embedding"))
    val wave = Seq((10L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
        (11L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ing = Similarity.semDedupLshIngest(standing, wave,
        "vec_id", "embedding", dim = 4, bits = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(ing(10L) === true)   // zero vector matches nothing standing
    assert(ing(11L) === false)  // exact dup of the standing corpus
  }

  test("minhash LSH: sub-shingle docs and empty text flow through") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "only two"), (2L, ""), (3L, "a proper three token document"),
      (4L, "a proper three token document"))
      .toDF("doc_id", "text")
    // docs with < k tokens produce no shingles and thus no signature —
    // they simply never pair; the real dup pair still verifies
    val pairs = Dedup.minhashLsh(df, "doc_id", "text",
        numHashes = 16, bands = 4, k = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((3L, 4L)))
  }

  test("graph ops: empty edge frames fail loud or return empty, never divide by zero") {
    import graft.operators.Graphs
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRank(empty, "src", "dst", iterations = 1)
    }
    assert(e.getMessage.contains("at least one edge"))
    // k-core of nothing is nothing (converges at round 0, no throw)
    assert(Graphs.kCore(empty, "src", "dst", k = 2).count() === 0L)
    // self-loops only → zero live edges after the a =!= b filter
    val loops = Seq(("x", "x"), ("y", "y")).toDF("src", "dst")
    assert(Graphs.kCore(loops, "src", "dst", k = 1).count() === 0L)
  }
}
