"""Dedup operator verification on constructed near-duplicates (the
documents testdata has no guaranteed dup pairs, so we make our own)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=BASE),  # exact dup of 1
        Row(doc_id=3, text="  " + BASE.upper() + "  "),  # normalized dup of 1
        Row(doc_id=4, text=BASE.replace("garden", "meadow")),  # near dup
        Row(doc_id=5, text="completely different content about spark and "
                           "distributed query engines running at scale"),
        Row(doc_id=6, text="another unrelated snippet mentioning minhash "
                           "signatures banding and locality sensitive hashing"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_normalized(spark, docs):
    out = {r.doc_id: r.dup_count for r in exact_dedup(docs).collect()}
    # 1,2,3 collapse to representative doc_id=1 with count 3
    assert out[1] == 3
    assert 2 not in out and 3 not in out
    assert out[4] == out[5] == out[6] == 1


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # case/whitespace normalize
    assert (1, 4) in pairs and pairs[(1, 4)] < 1.0  # one-word swap
    assert not any({a, b} == {5, 6} for a, b in pairs)


def test_minhash_lsh_candidates_cover_true_dups(spark, docs):
    cands = {(r.a, r.b) for r in minhash_lsh_pairs(docs, num_hashes=16, bands=4).collect()}
    assert (1, 2) in cands
    assert (1, 3) in cands
    assert (1, 4) in cands  # high-jaccard near dup should band-collide
    assert (5, 6) not in cands


def test_simhash_hamming_orders_similarity(spark, docs):
    fps = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    ham = lambda a, b: bin(fps[a] ^ fps[b]).count("1")
    assert ham(1, 2) == 0
    assert ham(1, 3) == 0
    assert ham(1, 4) < ham(1, 5)
    assert ham(1, 4) <= 10  # near dup stays within a few bits


def test_ngram_jaccard_with_df_cap(spark, docs):
    """Capping the inverted index by document frequency must still
    find the true near-dups (their overlap is in rare shingles)."""
    capped = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df_ratio=0.9).collect()
    }
    assert (1, 2) in capped and (1, 3) in capped


def test_incremental_lsh_index(spark, docs, tmp_path):
    """Persist the banded index for the corpus; a new near-dup batch
    finds its matches via one join, without re-hashing the corpus."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.dedup import (
        banded_signature_table,
        incremental_lsh_candidates,
    )

    index = banded_signature_table(docs)
    path = str(tmp_path / "lsh_index")
    index.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    new_batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=BASE),  # dup of docs 1/2/3
            Row(doc_id=101, text="fresh content with no twin anywhere "
                                 "in the existing corpus at all today"),
        ]
    )
    cands = {
        (r.new_id, r.existing_id)
        for r in incremental_lsh_candidates(new_batch, stored).collect()
    }
    assert (100, 1) in cands and (100, 2) in cands
    assert not any(nid == 101 for nid, _ in cands)


def test_minhash_component_agreement_tracks_jaccard(spark):
    """Guards against a degenerate hash family: if every (a_i, b_i)
    keeps a_i*h below the Mersenne prime, the mod never engages and
    every signature component becomes a monotone transform of the same
    min-shingle hash — all components then agree/disagree together and
    LSH banding gives no amplification. With a decorrelated family the
    per-component agreement rate is an unbiased estimator of Jaccard."""
    from streaming_recommendation_spark.operators.dedup import (
        MH_PARAMS,
        MH_PRIME,
        minhash_signatures,
    )

    # Carter-Wegman coefficients uniform in [1, P); a*h (28-bit h)
    # wraps the modulus many times, and stays int64-exact
    for a, b in MH_PARAMS:
        assert 1 <= a < MH_PRIME
        assert 1 <= b < MH_PRIME
        assert a * ((1 << 28) - 1) + b < (1 << 63)  # no int64 overflow

    words_common = [f"w{i}" for i in range(30)]
    words_a = words_common + [f"aa{i}" for i in range(10)]
    words_b = words_common + [f"bb{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(words_a)),
            Row(doc_id=2, text=" ".join(words_b)),
        ]
    )

    def shingle_set(ws, n=3):
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sa, sb = shingle_set(words_a), shingle_set(words_b)
    true_j = len(sa & sb) / len(sa | sb)
    assert 0.2 < true_j < 0.9  # strictly-partial overlap by construction

    sigs = {
        r.doc_id: r.sig
        for r in minhash_signatures(docs, num_hashes=64).collect()
    }
    n_agree = sum(x == y for x, y in zip(sigs[1], sigs[2]))
    # degeneracy symptom: all 64 agree or all 64 disagree
    assert 0 < n_agree < 64
    # unbiased estimator: within ~3 sigma of true Jaccard for 64 hashes
    assert abs(n_agree / 64 - true_j) < 0.2


def test_simhash_near_dups_matches_bruteforce(spark, docs):
    """Banded candidates must find EVERY pair within the pigeonhole
    guarantee (Hamming <= 3 with 4x15-bit bands) — compare against
    all-pairs bit_count over the same fingerprints."""
    import itertools

    from streaming_recommendation_spark.operators.dedup import (
        simhash64,
        simhash_near_dups,
    )

    fps = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    brute = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.a, r.b): r.hamming
        for r in simhash_near_dups(docs, max_hamming=3).collect()
    }
    assert got == brute
    assert brute, "fixture must contain at least one near-dup pair"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(docs, max_hamming=4)


def test_connected_components_chain_and_islands(spark):
    from streaming_recommendation_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3-4 (transitive: LSH would emit only adjacent pairs),
    # triangle 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["a", "b"],
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_star_components_match_propagation(spark):
    from streaming_recommendation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # same fixture as the propagation test: chain, triangle, pair
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["a", "b"],
    )
    want = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert got == want
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_star_beats_propagation_on_chains(spark):
    """The VERDICT-r3 gap: min-label propagation needs one round PER
    HOP, so a diameter-63 chain blows past practical round budgets;
    the alternating large-star/small-star rounds (Kiveris et al.)
    resolve it in O(log^2 n) — single digits here."""
    from streaming_recommendation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["a", "b"]
    )
    star_stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(chain, stats=star_stats).collect()
    }
    assert got == {i: 0 for i in range(64)}
    assert star_stats["rounds"] <= 8, star_stats

    # propagation moves labels one hop per round, so a 12-round
    # budget on a diameter-63 chain CANNOT converge — and rather than
    # silently returning a split cluster it now fails loudly
    # (agreement of the two algorithms when both converge is pinned
    # by test_star_components_match_propagation and the union-find
    # parity tests)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=12)


@pytest.mark.parametrize("seed", [7, 91])
def test_star_components_match_union_find_bruteforce(spark, seed):
    """Randomized parity: the distributed star rounds must agree with
    a driver-side union-find on arbitrary graphs (mixed chain/star/
    clique shapes arise naturally from random edges)."""
    import random

    from streaming_recommendation_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(70)
    ]
    # driver-side union-find ground truth
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in edges:
        if a != b:
            touched.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # union-by-min keeps the smaller root, so find(x) IS the
    # component minimum
    want = {x: find(x) for x in touched}

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert got == want


def test_star_components_isolated_nodes_and_self_loops(spark):
    from streaming_recommendation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # self-loop only node 5; normal pair (7, 8)
    edges = spark.createDataFrame([(5, 5), (7, 8)], ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    # self-loops carry no connectivity but DO introduce the node —
    # the node universe must match connected_components exactly
    want = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == want == {5: 5, 7: 7, 8: 7}


def test_star_components_raises_on_exhausted_rounds(spark):
    """Mid-contraction edge sets can hold conflicting parents; on
    max_iter exhaustion the operator must fail loudly rather than
    return duplicate (node, component) rows."""
    from streaming_recommendation_spark.operators.dedup import (
        connected_components_star,
    )

    chain = spark.createDataFrame([(i, i + 1) for i in range(63)], ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(chain, max_iter=2).collect()
    # an empty / all-self-loop edge set converges in zero rounds
    loops = spark.createDataFrame([(1, 1), (2, 2)], ["a", "b"])
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(loops, stats=stats).collect()
    }
    assert got == {1: 1, 2: 2} and stats["rounds"] == 0


def test_dedup_clusters_keeps_one_canonical_per_cluster(spark):
    from streaming_recommendation_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    # A~B, B~C (one cluster of 3); E~F; D and G singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["a", "b"])
    rows = dedup_clusters(docs, pairs).collect()
    assert len(rows) == 7  # every doc present
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sorted(by_cluster) == [1, 4, 5, 7]
    for cid, members in by_cluster.items():
        canon = [r for r in members if r["is_canonical"]]
        assert len(canon) == 1 and canon[0]["doc_id"] == cid
    # the transitive member 3 landed with 1 even though (1,3) was
    # never an LSH candidate pair
    assert {r["doc_id"] for r in by_cluster[1]} == {1, 2, 3}
    # the star algorithm resolves identical clusters
    star_rows = dedup_clusters(docs, pairs, algorithm="star").collect()
    assert sorted(map(tuple, star_rows)) == sorted(map(tuple, rows))
    with pytest.raises(ValueError, match="unknown algorithm"):
        dedup_clusters(docs, pairs, algorithm="bogus")


def test_duplicate_ngram_spans_full_and_zero_coverage(spark, docs):
    from streaming_recommendation_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    out = {r.doc_id: r for r in duplicate_ngram_spans(docs, n=8).collect()}
    # docs 1-3 are (normalized-)identical: every 8-gram duplicated,
    # merged span covers the whole text
    for d in (1, 2, 3):
        assert out[d].n_dup_grams == out[d].n_grams > 0
        assert out[d].dup_tokens == out[d].n_tokens
        assert out[d].dup_token_ratio == 1.0
    # doc 4 differs by one word mid-text: partial but nonzero coverage
    assert 0 < out[4].dup_tokens < out[4].n_tokens
    # unique docs: zero duplicated grams, zero coverage
    for d in (5, 6):
        assert out[d].n_dup_grams == 0
        assert out[d].dup_tokens == 0
        assert out[d].dup_token_ratio == 0.0


def test_duplicate_ngram_spans_interval_union(spark):
    from streaming_recommendation_spark.operators.dedup import (
        duplicate_ngram_spans,
    )
    from pyspark.sql import Row

    # two docs sharing two DISJOINT 3-gram regions separated by
    # unique middles: span union must not bridge the gap
    a = "x1 x2 x3 only in a middle part y1 y2 y3"
    b = "x1 x2 x3 unrelated other central words y1 y2 y3"
    df = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    out = {r.doc_id: r for r in duplicate_ngram_spans(df, n=3).collect()}
    # each doc: grams (x1 x2 x3) and (y1 y2 y3) duplicated -> two
    # islands of 3 tokens each
    for d in (1, 2):
        assert out[d].n_dup_spans == 2
        assert out[d].dup_tokens == 6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_duplicate_ngram_spans_matches_bruteforce(spark, seed):
    """Randomized corpus from a tiny vocab (forcing gram collisions)
    vs a brute-force python replay of the same span rules."""
    import random
    from collections import Counter

    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for d in range(1, 31)
    }
    n = 3
    toks = {d: t.split(" ") for d, t in docs.items()}
    grams = {
        d: [tuple(w[i:i + n]) for i in range(len(w) - n + 1)]
        for d, w in toks.items()
    }
    df_count = Counter()
    for d, gs in grams.items():
        for g in set(gs):
            df_count[g] += 1
    expected = {}
    for d, w in toks.items():
        dup_pos = [i for i, g in enumerate(grams[d]) if df_count[g] >= 2]
        spans = []
        for i in sorted(dup_pos):
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + n - 1)
            else:
                spans.append([i, i + n - 1])
        expected[d] = (
            len(w),
            len(grams[d]),
            len(dup_pos),
            len(spans),
            sum(e - s + 1 for s, e in spans),
        )

    out = duplicate_ngram_spans(
        spark.createDataFrame(
            [Row(doc_id=d, text=t) for d, t in docs.items()]
        ),
        n=n,
    ).collect()
    got = {
        r.doc_id: (r.n_tokens, r.n_grams, r.n_dup_grams, r.n_dup_spans,
                   r.dup_tokens)
        for r in out
    }
    assert got == expected


def test_duplicate_ngram_spans_within_doc_mode(spark):
    """Occurrence counting (Lee et al.'s form) flags intra-document
    boilerplate that document-frequency mode deliberately ignores."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    nav = "home products about contact"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{nav} unique middle content {nav}"),
            Row(doc_id=2, text="entirely different standalone words here"),
        ]
    )
    by_df = {r.doc_id: r for r in
             duplicate_ngram_spans(df, n=4).collect()}
    by_tf = {r.doc_id: r for r in
             duplicate_ngram_spans(df, n=4, count_within_doc=True).collect()}
    # the repeated nav block is invisible to document frequency...
    assert by_df[1].n_dup_grams == 0
    # ...but occurrence counting flags both copies
    assert by_tf[1].n_dup_grams == 2
    assert by_tf[1].n_dup_spans == 2 and by_tf[1].dup_tokens == 8
    assert by_tf[2].n_dup_grams == 0


def test_prefix_jaccard_matches_inverted_index(spark):
    """Prefix filtering must be LOSSLESS: identical pairs+scores to
    the plain inverted-index join on the real corpus."""
    from streaming_recommendation_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    full = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    pref = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in prefix_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert full == pref and len(full) > 0


def test_prefix_jaccard_repeating_decimal_threshold(spark):
    """threshold=2/3 reprs to a 16-digit numerator; the exact-integer
    prefix arithmetic must recover the intended rational (via
    limit_denominator) instead of overflowing num*sz — and stay
    lossless vs the inverted index."""
    from fractions import Fraction

    from streaming_recommendation_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    assert Fraction(str(2 / 3)).limit_denominator(1_000_000) == Fraction(2, 3)
    docs = load_table(spark, "documents", SF_DIR)
    full = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs, threshold=2 / 3).collect()
    }
    pref = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in prefix_jaccard_pairs(docs, threshold=2 / 3).collect()
    }
    assert full == pref


def test_prefix_jaccard_synthetic_prunes_but_keeps(spark):
    """Hand case: near-identical pair found, dissimilar pair pruned;
    a boilerplate shingle shared by all docs never joins alone."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon eta"),
            Row(doc_id=3, text="one two three four five six seven"),
        ]
    )
    out = {(r.a, r.b): r.jaccard for r in
           prefix_jaccard_pairs(docs, threshold=0.4, n=2).collect()}
    assert set(out) == {(1, 2)}
    # 2-gram shingles: doc1/doc2 share 4 of 5 each -> J = 4/6
    assert abs(out[(1, 2)] - 4 / 6) < 1e-9


def test_components_exact_budget_convergence(spark):
    """ADVICE r4: the changed==0 confirmation round must not be
    charged against max_iter — a graph converging in exactly
    max_iter propagation rounds succeeds, for both algorithms."""
    from streaming_recommendation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # chain 0-1-...-6: min-label propagation moves one hop per round,
    # so the fixpoint needs exactly 6 (= diameter) productive rounds
    chain = spark.createDataFrame([(i, i + 1) for i in range(6)], ["a", "b"])
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(chain, max_iter=6, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(7)}

    # star variant: measure the productive round count, then re-run
    # with max_iter set to exactly that — must not raise
    probe: dict = {}
    connected_components_star(chain, stats=probe).collect()
    tight: dict = {}
    got2 = {
        r["node"]: r["component"]
        for r in connected_components_star(
            chain, max_iter=probe["rounds"], stats=tight
        ).collect()
    }
    assert got2 == {i: 0 for i in range(7)}


def test_substitution_neighbors_exact_pairs(spark):
    """Pairs differ at exactly one position; diff_pos is 1-based;
    different-length and distance-2 strings never pair; duplicate
    texts (distance 0) are excluded."""
    from streaming_recommendation_spark.operators.dedup import (
        substitution_neighbors,
    )

    rows = [
        (1, "abcde"),
        (2, "abcdX"),   # differs from 1 at pos 5
        (3, "Xbcde"),   # differs from 1 at pos 1
        (4, "abcde"),   # duplicate of 1 -> distance 0, excluded
        (5, "abXdX"),   # distance 2 from 1, 2 from 2
        (6, "abcdef"),  # different length
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = sorted(
        (r.id_a, r.id_b, r.diff_pos)
        for r in substitution_neighbors(df, "id", "t").collect()
    )
    assert got == [
        (1, 2, 5),
        (1, 3, 1),
        (2, 4, 5),  # the duplicate pairs like the original does
        (2, 5, 3),  # abcdX vs abXdX differ at pos 3 only
        (3, 4, 1),
    ]


def test_substitution_neighbors_matches_bruteforce(spark):
    """Signature-join pairs == brute-force equal-length Hamming-1
    pairs on a random corpus."""
    import random

    from streaming_recommendation_spark.operators.dedup import (
        substitution_neighbors,
    )

    rng = random.Random(11)
    texts = [
        "".join(rng.choice("ab") for _ in range(4)) for _ in range(40)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, t string")
    got = sorted(
        (r.id_a, r.id_b, r.diff_pos)
        for r in substitution_neighbors(df, "id", "t").collect()
    )
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = texts[i], texts[j]
            diffs = [p for p in range(len(a)) if a[p] != b[p]]
            if len(diffs) == 1:
                want.append((i, j, diffs[0] + 1))
    assert got == sorted(want) and len(got) > 0


def test_substitution_neighbors_ignores_empty_strings(spark):
    """An empty string must produce NO signatures: before the length
    guard, sequence(1, 0)'s junk positions made '' collide with any
    1-char string as a fake distance-1 'substitution' (review-pass
    regression)."""
    from streaming_recommendation_spark.operators.dedup import (
        substitution_neighbors,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "b"), (4, "")],
        "id bigint, name string",
    )
    got = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in substitution_neighbors(df, "id", "name").collect()
    }
    # only the genuine equal-length substitution pair survives
    assert got == {(2, 3)}


def test_near_dedup_pipeline_transitive_cluster_and_canonicals(spark):
    """End-to-end pipeline (q175): exact dups A/B band together and
    verify at Jaccard 1; C is B with one word changed (high overlap);
    the cluster is the TRANSITIVE closure {A, B, C} with the min id
    canonical; the unrelated doc keeps itself. A second run with an
    unsatisfiable threshold (101%) must reject every LSH candidate at
    the verify gate and keep everything."""
    from streaming_recommendation_spark.operators.dedup import (
        near_dedup_pipeline,
    )

    # long enough that a one-word substitution keeps shingle Jaccard
    # >= 0.8: W words -> W-2 shingles, a mid-word change breaks 3 of
    # them, so J = (W-5)/(W+1) — needs W >= 29
    base = " ".join(
        f"w{i}" for i in range(20)
    ) + " the quick brown fox jumps over the lazy dog near the river bank " + " ".join(
        f"v{i}" for i in range(20)
    )
    rows = [
        (10, base),
        (11, base),  # exact dup of 10
        (12, base.replace("river", "creek")),  # near-dup of both
        (99, "completely different text about distributed query engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.cluster, r.kept)
        for r in near_dedup_pipeline(df, threshold_pct=80).collect()
    }
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    assert out[12] == (10, False)  # transitive closure, one cluster
    assert out[99] == (99, True)

    strict = {
        r.doc_id: (r.cluster, r.kept)
        for r in near_dedup_pipeline(df, threshold_pct=101).collect()
    }
    assert all(v == (k, True) for k, v in strict.items())


def test_cross_snapshot_dedup_matches_in_memory_path(spark):
    """q185's persisted-index read must produce exactly what the
    in-memory candidate computation produces on the same snapshot
    split — parquet round-trip of the signature index changes
    nothing."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators import dedup
    from streaming_recommendation_spark.queries import registry
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    out = {
        r.doc_id: r
        for r in registry()["q185_cross_snapshot_dedup"].fn(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR)
    old = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    mem = dedup.incremental_lsh_candidates(new, dedup.banded_signature_table(old))
    expected = {}
    for r in mem.collect():
        n, e = expected.get(r.new_id, (0, 1 << 62))
        expected[r.new_id] = (n + 1, min(e, r.existing_id))
    n_new = new.count()
    assert len(out) == n_new
    for doc_id, r in out.items():
        n, e = expected.get(doc_id, (0, -1))
        assert (r.n_index_matches, r.first_match, r.is_dup) == (
            n, e if n else -1, 1 if n else 0
        ), doc_id
