package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.strhash
import graft.functions.StrHash

/** Shared column builders for the text-pipeline operators (dedup,
  * fingerprinting, analysis). Everything here is deterministic arithmetic
  * over the engine-portable [[graft.functions.StrHash]] so the DuckDB
  * oracle can reproduce results bit-for-bit; the numeric constants live
  * in [[TextOps]] and are interpolated into BOTH the Spark plans and the
  * generated oracle SQL (single source of truth).
  *
  * All builders are pure Column expressions: they stay inside codegen,
  * no UDFs, no driver round-trips — the shape that survives 100 TB.
  */
object TextOps {

  /** Hash modulus (mirrors StrHash.P). */
  val P: Long = StrHash.P

  /** MinHash: number of hash functions / permutations. */
  val MinhashK = 32

  /** MinHash LSH: bands × rows-per-band (NB * R == MinhashK). */
  val Bands = 8
  val Rows = 4

  /** Affine permutation constants: a_i = (i*AMul mod (P-1)) + 1,
    * b_i = (i*BMul + 7) mod P. Knuth's 2654435761 gives well-spread odd
    * multipliers; everything stays < 2^63 (a_i, x < P → a_i*x < P² ≈
    * 1.0e18).
    */
  val AMul = 2654435761L
  val BMul = 97531L

  /** SimHash: signature width in bits. Must stay < 53 so the
    * double-based pow(2, b) bit masks are exact on both engines.
    */
  val SimBits = 48

  /** Fingerprint: char n-gram width and mod-sampling divisor. */
  val FpGram = 8
  val FpMod = 13L

  // ------------------------------------------------------- tokenization

  /** Whitespace tokens, empties removed. DuckDB mirror:
    * `list_filter(string_split(text, ' '), w -> w <> '')`.
    */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Word 3-gram shingles (space-joined); docs with < 3 words collapse to
    * a single whole-text shingle.
    */
  def shingles(text: Column): Column = {
    val w = words(text)
    when(size(w) < 3, array(text)).otherwise(
      transform(
        sequence(lit(0), size(w) - 3),
        i =>
          concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))
      )
    )
  }

  /** Distinct shingle hash set — the document's content signature input.
    * Fused native kernel (graft.functions.ShingleHashes): one pass over
    * the string, no intermediate shingle strings. Semantics identical to
    * `array_distinct(transform(shingles(text), strhash))`.
    */
  def shingleHashes(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.ShingleHashes(Bridge.expression(text), 3))
  }

  /** Positioned NON-distinct word-n-gram shingle hashes: slot i hashes
    * the span starting at word i; empty for docs with < n words. The
    * span-removal dedup keys on these (position matters there, and
    * within-doc repeats must count toward the corpus frequency).
    */
  def shingleHashesPos(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.ShingleHashesPos(Bridge.expression(text), n))
  }

  // ----------------------------------------------------------- minhash

  /** k-element MinHash signature over a distinct-hash array `xs`:
    * sig[i] = min over xs of (a_i*x + b_i) mod P. Native kernel
    * (graft.functions.MinHashSig) — same arithmetic as the HOF
    * formulation, primitive loops instead of interpreted lambdas.
    */
  def minhashSignature(xs: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(
      graft.functions.MinHashSig(Bridge.expression(xs), MinhashK, AMul, BMul)
    )
  }

  /** LSH band digests: band j = fold of its `Rows` signature slots with
    * (acc*31 + v) mod P. Two docs sharing any band digest are candidates.
    */
  def bandDigests(sig: Column): Column =
    transform(
      sequence(lit(0), lit(Bands - 1)),
      j =>
        aggregate(
          slice(sig, j * Rows + 1, lit(Rows)),
          lit(0L),
          (acc, v) => (acc * 31 + v) % lit(P)
        )
    )

  /** Estimated Jaccard from two equal-length signatures. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, m) => acc + m
    ).cast("double") / MinhashK

  // ----------------------------------------------------------- simhash

  /** Word-bigram features for SimHash: space-joined adjacent word pairs
    * (whole text if fewer than 2 words). Bigrams — not unigrams — so
    * corpora drawn from a small shared vocabulary still discriminate.
    */
  def bigrams(text: Column): Column = {
    val w = words(text)
    when(size(w) < 2, array(text)).otherwise(
      transform(
        sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))
      )
    )
  }

  /** Word-bigram feature hashes for SimHash. StrHash yields < 2^30;
    * pairing two independent hashes spreads signal across ~60 bits.
    * Fused native kernel (graft.functions.BigramPairHashes), identical
    * to `transform(bigrams(text), w => strhash(w+"#") * P + strhash(w))`.
    */
  def simhashFeatures(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.BigramPairHashes(Bridge.expression(text)))
  }

  /** SimBits-bit SimHash over word-bigram hashes WITH multiplicity:
    * bit b = 1 iff sum over features of (bit b of hash ? +1 : -1) is
    * positive. Frequency weighting separates docs sharing a vocabulary.
    * Native kernel (graft.functions.SimHash): a single pass over the
    * feature array per doc, so `hs` can be the raw [[simhashFeatures]]
    * expression — it is evaluated exactly once per row.
    */
  def simhash(hs: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.SimHash(Bridge.expression(hs), SimBits))
  }

  /** Char n-gram rolling fingerprint: hashes of every FpGram-char window,
    * mod-sampled (h % FpMod == 0), distinct, sorted. Winnowing-style
    * content fingerprint for plagiarism/near-dup detection.
    */
  def fingerprint(text: Column): Column = {
    // True rolling hash (graft.functions.RollingFpHashes): O(1) window
    // update per char instead of hashing a fresh substring per
    // position. Same output as
    // sort(distinct(filter(strhash(g) for g in char n-grams, % mod))).
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.RollingFpHashes(Bridge.expression(text), FpGram, FpMod))
  }
}
