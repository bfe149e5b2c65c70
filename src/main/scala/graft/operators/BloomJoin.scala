package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filter for fact-fact joins (SURVEY §5
  * "minimize shuffles"): when a selective dimension filter reaches a big
  * fact only THROUGH another fact (segment → customer → orders →
  * lineitem), the probe side would shuffle every row just to drop most of
  * them at the join. Building a Bloom filter over the qualifying keys and
  * broadcasting it to the probe scan drops non-matching rows BEFORE the
  * exchange — the classic runtime-filter technique (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects the same
  * shape when statistics allow; this is the explicit, statistics-free
  * form an engine user can apply deliberately).
  *
  * Representation: the filter is a word map — a DataFrame of
  * (word INT, bits BIGINT) with at most `words` rows, i.e. a 64·`words`-bit
  * bitmap stored sparsely. Build is one explode of [[NumHashes]] positions
  * per key and a `bit_or` rollup (map-side combined to ≤ `words` rows per
  * partition); probe is [[NumHashes]] BROADCAST hash joins against the
  * word map — no shuffle touches the probe side, and the build subtree is
  * planned once (Catalyst exchange/subquery reuse dedups the identical
  * broadcasts).
  *
  * Exactness: a Bloom filter has false positives but NEVER false negatives
  * (build and probe derive positions from the same [[positions]]
  * expression), so `prune` keeps a superset of the matching rows and the
  * downstream exact join restores exact results — the correctness gate
  * compares the pruned plan against the plain-join oracle on every run.
  *
  * Sizing (100 TB): ≈16 bits/key with k=3 hashes gives ≈0.5% false
  * positives (64·`words` ≥ 16·|keys|). The word map broadcast is
  * 12 bytes/word — 1e8 qualifying keys need ~200 MB of bitmap, past which
  * a shuffled LEFT SEMI join is the right plan; this utility targets the
  * common selective-build case (≤ tens of millions of qualifying keys).
  */
object BloomJoin {

  /** Hash functions per key (k). */
  val NumHashes = 3

  /** Word-map size giving ≈16 bits/key (≈0.5% FPR at k=3): the next
    * power of two covering 16·nKeys bits, clamped to [4096, 2^20] words
    * (32 KiB – 8 MiB of bitmap). Size from a (possibly approximate)
    * build-side count — a filter sized below its key count saturates
    * toward all-ones and prunes NOTHING while still paying the probe
    * joins; past the cap a shuffled LEFT SEMI join is the right plan.
    */
  def sizeWords(nKeys: Long): Int = {
    val capKeys = (1L << 20) * 4L // 2^22 keys fill the cap at 16 bits/key
    if (nKeys >= capKeys) 1 << 20 // clamp BEFORE multiplying (no overflow)
    else {
      val needWords = (math.max(1L, nKeys) * 16L + 63L) / 64L
      val floored = math.max(4096L, needWords)
      java.lang.Long.highestOneBit(floored * 2L - 1L).toInt
    }
  }

  /** Bit positions of `key` in a 64·`words`-bit Bloom filter: k
    * independent xxhash64 draws (the lane literal makes each draw an
    * independent 64-bit hash), reduced mod the bitmap size. Shared by
    * build and probe — false-negative freedom is structural.
    */
  private def positions(key: Column, words: Int): Seq[Column] =
    (0 until NumHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(words.toLong * 64L)))

  /** Builds the word map (word INT, bits BIGINT) over `keys(key)`;
    * ≤ `words` rows. One narrow exchange of (word, mask) pairs with
    * map-side `bit_or` partials — the corpus never ships.
    */
  def build(keys: DataFrame, key: String, words: Int): DataFrame = {
    require(words > 0, "words must be positive")
    keys
      .select(explode(array(positions(col(key), words): _*)).as("_pos"))
      .select(shiftright(col("_pos"), 6).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos & 63 AS INT))")
          .as("_mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(_mask)").as("bits"))
  }

  /** Drops rows of `df` whose `key` is definitely absent from the filter
    * (word map built with the same `words` by [[build]]). k broadcast
    * hash joins + bit tests — stays in whole-stage codegen, no exchange
    * on `df`. Keeps a superset of matching rows (false positives pass;
    * the caller's exact join removes them).
    */
  def prune(df: DataFrame, key: String, wordMap: DataFrame,
      words: Int): DataFrame = {
    require(words > 0, "words must be positive")
    // The probe stages use _p/_w/_m/_b temporaries; withColumn would
    // silently REPLACE a caller column of the same name (and the final
    // drop would delete it), so reject such frames up front.
    val reserved = (0 until NumHashes)
      .flatMap(i => Seq(s"_p$i", s"_w$i", s"_m$i", s"_b$i")).toSet
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"prune() reserves column names ${clash.mkString(", ")}; rename them first")
    val pos = positions(col(key), words)
    (0 until NumHashes).foldLeft(df) { (cur, i) =>
      val probe = cur
        .withColumn(s"_p$i", pos(i))
        .withColumn(s"_w$i", shiftright(col(s"_p$i"), 6).cast("int"))
        .withColumn(s"_m$i",
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(_p$i & 63 AS INT))"))
      probe
        .join(broadcast(wordMap
          .withColumnRenamed("word", s"_w$i")
          .withColumnRenamed("bits", s"_b$i")), Seq(s"_w$i"), "left")
        .filter(col(s"_b$i").isNotNull &&
          (col(s"_b$i").bitwiseAND(col(s"_m$i")) =!= 0L))
        .drop(s"_p$i", s"_w$i", s"_m$i", s"_b$i")
    }
  }
}
