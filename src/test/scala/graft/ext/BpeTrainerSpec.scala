package graft.ext

import graft.SparkSpec
import graft.queries.ExtQueries

class BpeTrainerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("vocab-local trainer equals the relational merge loop on the 5-merge fixture") {
    // the audit-twin contract behind x_bpe_merges_local sharing
    // x_bpe_merges' oracle: same corpus, same 5 merges, bit-equal rows
    val relational = ExtQueries.queries("x_bpe_merges")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = ExtQueries.queries("x_bpe_merges_local")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(relational.nonEmpty)
    assert(local.toSeq == relational.toSeq)
  }

  test("trainer is input-order independent and honors the (cnt desc, pair asc) tie-break") {
    val vocab = Seq("abab" -> 3L, "abba" -> 2L, "zz" -> 5L)
    val fwd = BpeTrainer.train(vocab.iterator, 3)
    val rev = BpeTrainer.train(vocab.reverse.iterator, 3)
    assert(fwd == rev)
    // step 1 counts: "a b" 3+3+2=8, "b a" 3+2=5, "b b" 2+... wait:
    // abab -> pairs (a b),(b a),(a b); abba -> (a b),(b b),(b a);
    // zz -> (z z). So "a b"=3*2+2=8 wins outright.
    assert(fwd.head.pair == "a b" && fwd.head.cnt == 8L && fwd.head.merged == "ab")
  }

  test("merge application is left-to-right non-overlapping (the ' a b a b ' case)") {
    // one word "abab" freq 1: step 1 merges "a b" (cnt 2), and the
    // replace of " a b " in " a b a b " consumes the separating space,
    // leaving " ab a b " — the same quirk Spark's and DuckDB's replace
    // share, which the relational loop (and so the oracle) exhibits
    val m = BpeTrainer.train(Iterator("abab" -> 1L), 2)
    assert(m.head == BpeTrainer.Merge(1L, "a b", "ab", 2L))
    // after step 1 syms are " ab a b ": pairs (ab a) and (a b), each
    // cnt 1 — tie-break picks "a b" (utf8 'a'<'ab ' ... actually
    // "a b" < "ab a" byte-wise because 0x20 < 'b')
    assert(m(1).pair == "a b" && m(1).cnt == 1L)
  }

  test("exhausted vocabulary stops early instead of emitting empty merges") {
    assert(BpeTrainer.train(Iterator("a" -> 5L, "b" -> 2L), 3) == Seq())
  }
}
