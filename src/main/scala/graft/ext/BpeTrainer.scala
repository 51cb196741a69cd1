package graft.ext

import java.nio.charset.StandardCharsets

/** VOCAB-LOCAL BPE training — the production-scale training path for
  * the tokenizer lifecycle (`x_bpe_merges` trains the same table
  * relationally; `BpeTrainerSpec` proves the two agree merge-for-
  * merge).
  *
  * Cost model (the r7 verdict's ask — why the relational loop cannot
  * carry a real merge budget, and why this one can):
  *  - RELATIONAL loop: each merge step is one pair-count aggregation
  *    JOB over the vocabulary relation plus a 1-row argmax and a
  *    re-encode projection — O(merges) driver-coordinated Spark job
  *    rounds after the single corpus pass. At the 5-merge fixture
  *    that is 5 rounds; at a production budget (~32k merges for a
  *    GPT-2-class vocab) it is ~32k scheduler round-trips — a
  *    non-starter regardless of cluster size, because the
  *    parallelizable work per round is vocabulary-sized, i.e. tiny.
  *  - VOCAB-LOCAL: ONE corpus pass builds the stored (word, freq)
  *    vocabulary (language-bounded, ≪ corpus — the only corpus-scale
  *    step, already shared state); training then runs the classic
  *    in-memory merge loop over that table in a SINGLE task:
  *    O(merges · Σ|word syms|) local string work, no further jobs, no
  *    further corpus reads. This is exactly how production BPE
  *    trainers operate (the word-frequency table fits one machine
  *    even for web-scale corpora); 32k merges is minutes of
  *    single-core work, not 32k job rounds.
  * The relational loop remains the AUDIT TWIN: same algorithm stated
  * as oracle-mirrorable DataFrame algebra, kept green at fixture
  * scale.
  *
  * Determinism contract (identical to the relational loop's, so the
  * tables match bit-for-bit):
  *  - symbols string is " c1 c2 ... cn " (space-delimited, space-
  *    padded), split from the word's characters;
  *  - pair counting weights each adjacent symbol pair by the word's
  *    corpus frequency — exact Long sums;
  *  - argmax tie-breaks on the pair's UTF-8 BYTE order (Spark's and
  *    DuckDB's binary string collation — NOT Java's UTF-16
  *    `compareTo`, which disagrees above U+FFFF);
  *  - the merge applies via `String.replace` — left-to-right
  *    non-overlapping, the same semantics as Spark's `replace` and
  *    DuckDB's `replace` (all three agree on the self-adjacent
  *    " a b a b " case).
  */
object BpeTrainer {

  /** One learned merge — row-compatible with the stored merge table. */
  final case class Merge(step: Long, pair: String, merged: String, cnt: Long)

  /** UTF-8 byte-order less-than — the binary collation both engines
    * sort VARCHAR by.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Train `steps` merges over a (word, freq) vocabulary. Input order
    * is irrelevant (counts aggregate; argmax is (cnt desc, pair asc))
    * so a shuffled or re-partitioned vocabulary trains the same
    * table. Stops early if no pair remains (all words single-symbol).
    */
  def train(vocab: Iterator[(String, Long)], steps: Int): Seq[Merge] = {
    var words = vocab.map { case (w, f) =>
      (" " + w.split("").filter(_.nonEmpty).mkString(" ") + " ", f)
    }.toArray
    val out = Seq.newBuilder[Merge]
    var s = 1
    var exhausted = false
    while (s <= steps && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((syms, f) <- words) {
        val toks = syms.trim.split(" ")
        var i = 0
        while (i < toks.length - 1) {
          val p = toks(i) + " " + toks(i + 1)
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestPair: String = null
        var bestCnt = Long.MinValue
        for ((p, c) <- counts)
          if (c > bestCnt || (c == bestCnt && utf8Lt(p, bestPair))) {
            bestPair = p; bestCnt = c
          }
        val merged = bestPair.replace(" ", "")
        words = words.map { case (syms, f) =>
          (syms.replace(" " + bestPair + " ", " " + merged + " "), f)
        }
        out += Merge(s.toLong, bestPair, merged, bestCnt)
        s += 1
      }
    }
    out.result()
  }
}
