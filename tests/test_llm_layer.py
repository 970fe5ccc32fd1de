"""LLM-data layer: dedup guarantees, ANN recall, multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.functions import dedup as dd
from tg_reporting_etl_spark.functions import multimodal as mm
from tg_reporting_etl_spark.functions import similarity as sim
from tg_reporting_etl_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_exact_dedup_partitions_docs(docs):
    out = dd.exact_dedup(docs)
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()  # every doc accounted for exactly once


def test_minhash_candidates_superset_of_high_jaccard(docs):
    """LSH candidates must contain every pair the exact scan accepts at
    a high threshold (banding recall grows with similarity)."""
    sh = dd.char_shingles(docs)
    exact_high = {
        (r.doc_a, r.doc_b) for r in dd.jaccard_pairs(sh, 0.8).collect()
    }
    cands = {(r.doc_a, r.doc_b) for r in dd.minhash_candidates(sh).collect()}
    assert exact_high, "expected at least one >=0.8 near-dup pair in testdata"
    assert exact_high <= cands


def test_prefix_filter_is_lossless(docs):
    """Prefix-filtered ngram dedup == brute-force all-pairs Jaccard —
    the AllPairs/PPJoin guarantee, end to end (gate bypassed so the
    prefix join itself is what's under test)."""
    sh = dd.char_shingles(docs)
    brute = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6) for r in dd.jaccard_pairs(sh, 0.8).collect()
    }
    sink = {}
    fast = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dd.ngram_jaccard_dedup(docs, 0.8, on_blowup="force", path_sink=sink).collect()
    }
    assert sink["path"] == "prefix"
    assert brute, "expected at least one >=0.8 near-dup pair in testdata"
    assert fast == brute


def test_ngram_gate_allpairs_path_is_exact(spark):
    """On a low-entropy corpus (tiny vocabulary, near-identical docs)
    the prefix join degenerates — est = sum C(df_p, 2) exceeds
    n·(n-1)/2 — and the gate reroutes to brute-force candidates.
    Result must STILL equal ground truth."""
    base = "the quick brown fox jumps over the lazy dog again and again "
    suffixes = ["alpha", "bravo", "charlie", "delta"]
    rows = [(i, base * 2 + suffixes[i % 4]) for i in range(40)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dd.char_shingles(corpus)
    brute = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6) for r in dd.jaccard_pairs(sh, 0.8).collect()
    }
    sink = {}
    out = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dd.ngram_jaccard_dedup(
            corpus, 0.8, candidate_budget_per_doc=0, budget_floor=10**6, path_sink=sink
        ).collect()
    }
    assert sink["path"] == "allpairs", sink
    assert brute, "constructed corpus must contain >=0.8 pairs"
    assert out == brute


def test_ngram_gate_lsh_fallback_reports_only_exact_pairs(docs):
    """Gate forced into the LSH fallback (budget floor 0): every
    reported pair must carry the exact full-set Jaccard (verify is
    exact even when candidate recall < 1), and recall on the clearly-
    duplicated test corpus must stay high."""
    sh = dd.char_shingles(docs)
    brute = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6) for r in dd.jaccard_pairs(sh, 0.8).collect()
    }
    sink = {}
    out = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dd.ngram_jaccard_dedup(
            docs, 0.8, on_blowup="lsh", candidate_budget_per_doc=0, budget_floor=0, path_sink=sink
        ).collect()
    }
    assert sink["path"] == "lsh", sink
    assert set(out) <= set(brute)  # no false positives, exact values
    assert all(out[p] == brute[p] for p in out)
    assert len(out) >= 0.8 * len(brute)  # banding recall floor


def test_ngram_gate_error_mode_names_capped_alternative(docs):
    """'error' is the DEFAULT on_blowup: an operator documented as exact
    must not silently reroute to a bounded-recall candidate set — the
    lossy path is an explicit opt-in (on_blowup='lsh')."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ngram_jaccard_dedup_capped"):
        dd.ngram_jaccard_dedup(docs, 0.8, candidate_budget_per_doc=0, budget_floor=0)
    with _pytest.raises(ValueError, match="ngram_jaccard_dedup_capped"):
        dd.ngram_jaccard_dedup(
            docs, 0.8, on_blowup="error", candidate_budget_per_doc=0, budget_floor=0
        )


def _near_tau_corpus(spark):
    """Deterministic (seeded) corpus of twin pairs whose Jaccard spans
    [~0.80, ~0.95] — the regime where MinHash banding recall is most
    sensitive to band-count / salt changes."""
    import random

    rng = random.Random(42)
    vocab = ["%04x" % rng.randrange(16**4) for _ in range(4000)]
    rows = []
    for i in range(120):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(60)]
        rows.append((2 * i, " ".join(words)))
        tw = list(words)
        for _ in range(1 + (i % 6)):  # 1..6 mutated words -> J ~0.95..0.78
            tw[rng.randrange(len(tw))] = vocab[rng.randrange(len(vocab))]
        rows.append((2 * i + 1, " ".join(tw)))
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)


@pytest.mark.parametrize("corpus_kind", ["testdata", "near_tau"])
def test_ngram_gate_lsh_recall_floor(spark, docs, corpus_kind):
    """Regression guard for the documented lsh-reroute recall contract
    (plans/llm_plans.py q_doc_ngram_jaccard_exact: 'measured 255/256'):
    against on_blowup='force' ground truth, the lsh path must keep
    recall >= 0.95.  Both corpora are deterministic (md5 hash family,
    seeded generator), so a drop can only come from a code change —
    e.g. fewer bands or a different salt family silently degrading the
    1-(1-J^4)^4 candidate probability this floor pins."""
    corpus = docs.select("doc_id", "text") if corpus_kind == "testdata" else _near_tau_corpus(spark)
    truth = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_dedup(corpus, 0.8, on_blowup="force").collect()
    }
    sink = {}
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_dedup(
            corpus, 0.8, on_blowup="lsh", candidate_budget_per_doc=0, budget_floor=0,
            path_sink=sink,
        ).collect()
    }
    assert sink["path"] == "lsh", sink
    assert truth, "corpus must contain >=0.8 near-dup pairs"
    recall = len(got & truth) / len(truth)
    # measured: 25/25 (testdata sf0.01), 82/85 (near-tau) — deterministic
    assert recall >= 0.95, f"lsh candidate recall degraded: {recall:.4f} ({len(got & truth)}/{len(truth)})"


def test_candidate_path_gate_boundaries():
    """Pure-function gate: straddle each decision boundary."""
    # within budget and below brute-force count -> prefix
    assert dd._candidate_path(est=100, n_docs=1000, budget=1000) == "prefix"
    # est explodes past budget, brute force affordable -> allpairs
    assert dd._candidate_path(est=10**9, n_docs=1000, budget=10**6) == "allpairs"
    # est explodes, brute force too big -> lsh
    assert dd._candidate_path(est=10**12, n_docs=10**6, budget=10**6) == "lsh"
    # est within budget but above npairs (degenerate tiny corpus) -> allpairs
    assert dd._candidate_path(est=50, n_docs=10, budget=1000) == "allpairs"
    # big corpus, est within scale-linear budget -> prefix even though
    # npairs >> budget (the happy natural-text path)
    assert dd._candidate_path(est=10**6, n_docs=10**6, budget=64 * 10**6) == "prefix"
    # exact boundary: est == budget == npairs stays prefix
    assert dd._candidate_path(est=45, n_docs=10, budget=45) == "prefix"


def test_simhash_banding_is_lossless(docs, spark):
    """Banded pair generation == brute-force for hamming <= 3."""
    sig = dd.simhash_signatures(docs.limit(150)).cache()
    banded = {
        (r.doc_a, r.doc_b): r.hamming for r in dd.simhash_dedup(docs.limit(150)).collect()
    }
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.doc_a, r.doc_b): r.h
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(sa ^ sb)").cast("int").alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute


def test_ann_results_are_subset_quality(emb):
    """Every ANN neighbor's cosine is <= the brute-force best, and the
    two rankings overlap (same bucket family on this data)."""
    bf = sim.brute_force_topk(emb, F.col("vec_id") < 10, k=5).collect()
    ann = sim.ann_sign_lsh_topk(emb, F.col("vec_id") < 10, k=3).collect()
    best = {}
    for r in bf:
        best.setdefault(r.query_id, max(best.get(r.query_id, -2), r.cos_sim))
    assert ann
    for r in ann:
        assert r.cos_sim <= best[r.query_id] + 1e-9
    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf}
    ann_pairs = {(r.query_id, r.neighbor_id) for r in ann}
    assert bf_pairs & ann_pairs, "ANN found none of the true top-5"


def test_blocked_equals_fold(emb):
    """Blocked numpy GEMM cosine == exact sequential-fold cosine after
    6-place rounding (the scale path changes execution, not results)."""
    tau = 0.3
    fold = {
        (r.vec_a, r.vec_b): r.cos_sim for r in sim.embedding_dup_pairs(emb, tau).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in sim.embedding_dup_pairs_blocked(emb, tau).collect()
    }
    assert fold.keys() == blocked.keys()
    for k in fold:
        assert abs(fold[k] - blocked[k]) < 2e-6


def test_ivf_partitions_corpus_and_finds_neighbors(emb):
    """Every vector lands in exactly one cell; IVF answers overlap the
    exact top-k (recall sanity on a tiny corpus)."""
    import pyspark.sql.functions as F2

    assigned = sim.ivf_assign(emb)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    ivf = {(r.query_id, r.neighbor_id) for r in sim.ivf_topk(emb, F2.col("vec_id") < 10).collect()}
    bf = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, F2.col("vec_id") < 10, k=5).collect()
    }
    assert ivf and ivf & bf


def test_ivf_kmeans_quantizer_recall_holds(emb, spark):
    """Trained (seeded k-means) quantizer: same (cell_id, c_emb) index
    shape as the fixed variant, partitions the corpus exactly once, and
    on clustered data (what real embedding corpora look like — the
    driver's embeddings table is uniform random, where any coarse
    quantizer is equally blind) it reaches full recall at nprobe=1
    while the fixed quantizer needs the queries inside its centroid
    set to do the same."""
    import numpy as np
    import pyspark.sql.functions as F2

    # index-shape + partition checks on the real embeddings table
    cents = sim.kmeans_centroids(emb, n_cells=16, seed=7)
    assert cents.count() == 16
    assigned = sim.ivf_assign(emb, centroids=cents)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()

    # recall on clustered data, queries NOT in either quantizer's view
    rng = np.random.default_rng(42)
    centers = rng.normal(0, 10, (16, 8))
    rows = [
        (i, [float(x) for x in centers[i // 20] + rng.normal(0, 0.5, 8)])
        for i in range(320)
    ]
    cl = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = (F2.col("vec_id") >= 100) & (F2.col("vec_id") < 110)
    tcents = sim.kmeans_centroids(cl, n_cells=16, seed=7)
    bf = {(r.query_id, r.neighbor_id) for r in sim.brute_force_topk(cl, q, k=3).collect()}
    trained = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(cl, q, nprobe=1, centroids=tcents).collect()
    }
    fixed = {(r.query_id, r.neighbor_id) for r in sim.ivf_topk(cl, q, nprobe=1).collect()}
    assert trained & bf == bf  # full recall probing ONE of 16 cells
    assert len(trained & bf) >= len(fixed & bf)  # holds vs the fixed variant


def test_media_pandas_path_matches_expr_path(docs):
    """mapInPandas feature extraction (Arrow batches) == JVM expression
    twin — the multimodal plumbing is real even though decode is stubbed."""
    media = mm.attach_fake_media(docs.limit(100))
    via_pandas = {r.doc_id: r for r in mm.extract_media_features(media).collect()}
    via_expr = {r.doc_id: r for r in mm.media_metadata_expr(media).collect()}
    assert via_pandas.keys() == via_expr.keys()
    for k in via_pandas:
        assert via_pandas[k].byte_len == via_expr[k].byte_len
        assert via_pandas[k].checksum == via_expr[k].checksum
        assert via_pandas[k].header_hex == via_expr[k].header_hex


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")

SF01 = "/root/testdata/sf0.1"


def test_ann_recall_floors_at_sf01(spark):
    """Recall@k benchmark against the exact top-k ground truth at sf0.1
    (2000 vectors, 10 in-index queries), asserted as regression floors.

    Measured on the synthetic near-uniform corpus (see README):
    IVF fixed quantizer nprobe=2 r@3 ~ 0.97 (queries 0-9 are their own
    cell centers under the first-16-vectors quantizer, the favourable
    regime); trained KMeans nprobe=2 r@3 ~ 0.53 and nprobe=4 ~ 0.77
    (near-uniform data has little cluster structure to exploit — recall
    scales with probed fraction); sign-LSH r@3 ~ 0.20 (16 sign bits
    over near-uniform dims keep ~6% of the corpus as candidates).
    """
    import os

    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    emb = load_table(spark, SF01, "embeddings").cache()
    pred = F.col("vec_id") < 10
    exact = sim.brute_force_topk(emb, pred, k=5).cache()
    assert exact.count() == 50

    r_fixed = sim.recall_at_k(sim.ivf_topk(emb, pred, k=3, nprobe=2), exact, 3)
    assert r_fixed >= 0.9

    cents = sim.kmeans_centroids(emb, n_cells=16, seed=7)
    r_km2 = sim.recall_at_k(sim.ivf_topk(emb, pred, k=3, nprobe=2, centroids=cents), exact, 3)
    r_km4 = sim.recall_at_k(sim.ivf_topk(emb, pred, k=3, nprobe=4, centroids=cents), exact, 3)
    assert r_km2 >= 0.4
    assert r_km4 >= r_km2  # more probes never hurt recall
    assert r_km4 >= 0.6

    r_lsh = sim.recall_at_k(sim.ann_sign_lsh_topk(emb, pred, k=3), exact, 3)
    assert r_lsh >= 0.15

    for df in (emb, exact):
        df.unpersist()


@pytest.mark.parametrize("corpus_kind", ["low_entropy", "high_entropy", "boundary"])
def test_dense_and_array_verify_are_equivalent(spark, corpus_kind):
    """The adaptive verify representation (dense bitmask vs array
    intersect) must be a pure implementation detail: forcing either
    path on corpora either side of (and near) the
    ``v_est·1.2 <= min(64·tot/n, 2^16)`` gate yields identical pairs
    with identical exact Jaccard values.  An adaptive-representation
    bug would otherwise be silent — the gate picks ONE path per corpus,
    so no single-corpus test covers both."""
    import hashlib

    def txt(i: int, flavor: str) -> str:
        if flavor == "low_entropy":  # ~tiny shared vocabulary
            words = ["aaa", "bbb", "ccc", "ddd"]
            return " ".join(words[(i + j) % 4] for j in range(30)) + words[i % 2]
        if flavor == "high_entropy":  # per-doc unique shingles
            return hashlib.md5(f"hi|{i}".encode()).hexdigest() * 4
        # boundary: half shared template, half unique tail
        base = "shared template text " * 3
        return base + hashlib.md5(f"b|{i}".encode()).hexdigest()

    rows = [(i, txt(i, corpus_kind)) for i in range(24)]
    # near-dup injections so the >= tau result set is non-trivial
    rows += [(100 + i, rows[i][1] + "!") for i in range(4)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])

    sh = dd.char_shingles(corpus)
    hashed = dd.hash_shingles(sh).cache()
    ids = corpus.select("doc_id")
    a, b = ids.alias("a"), ids.alias("b")
    pairs = a.join(
        b, F.col("a.doc_id") < F.col("b.doc_id")
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))

    def run(dense):
        return {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd._jaccard_on_hashed(hashed, pairs, 0.5, dense=dense).collect()
        }

    dense_out, array_out, auto_out = run(True), run(False), run(None)
    assert dense_out, f"{corpus_kind}: expected non-trivial >=tau pairs"
    assert dense_out == array_out
    assert auto_out == array_out  # the self-gate picks one of the two


def test_prefix_filter_lossless_property(spark):
    """Property: for randomized corpora (mixed entropy, duplicates,
    short docs, shared templates) and several tau values, the forced
    prefix path equals brute force EXACTLY.  Deterministic seeds, one
    Spark job per case — a directed random sweep rather than
    hypothesis's adaptive engine (each example costs a Spark job)."""
    import random

    for seed, tau in [(1, 0.5), (2, 0.7), (3, 0.8), (4, 0.9), (5, 0.6)]:
        rng = random.Random(seed)
        vocab = ["lorem", "ipsum", "dolor", "sit", "amet", "alpha", "beta",
                 "gamma", "delta", "x1", "x2", "x3"]
        rows = []
        for i in range(30):
            n = rng.randint(3, 25)
            words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
            rows.append((i, " ".join(words)))
        # inject exact + near duplicates
        for j in range(5):
            base_id = rng.randrange(30)
            mutated = rows[base_id][1] + (" extra" if j % 2 else "")
            rows.append((100 + j, mutated))
        corpus = spark.createDataFrame(rows, ["doc_id", "text"])
        sh = dd.char_shingles(corpus)
        brute = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd.jaccard_pairs(sh, tau).collect()
        }
        fast = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd.ngram_jaccard_dedup(corpus, tau, on_blowup="force").collect()
        }
        assert fast == brute, (seed, tau)


def test_connected_components_shapes(spark):
    """Chain, clique, isolated pair — component = min doc_id; keeper
    flag marks exactly one doc per component."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {(r.doc_id, r.component_id, r.is_keeper) for r in dd.dedup_keepers(pairs).collect()}
    assert comp == {
        (1, 1, True), (2, 1, False), (3, 1, False), (4, 1, False),
        (10, 10, True), (11, 10, False), (12, 10, False),
        (20, 20, True), (21, 20, False),
    }


def test_connected_components_max_iter_zero_returns_identity(spark):
    """max_iter=0: loop body never runs — identity labels come back and
    LAST_COMPONENT_STATS records converged=False (no UnboundLocalError
    on the `changed` sentinel)."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    got = {r.doc_id: r.component_id for r in dd.connected_components(pairs, max_iter=0).collect()}
    assert got == {1: 1, 2: 2, 3: 3}
    assert dd.LAST_COMPONENT_STATS == {"rounds": 0, "max_iter": 0, "converged": False}


def test_connected_components_matches_python_union_find(spark):
    """Randomized graphs: Spark label propagation == driver union-find."""
    import random

    for seed in (7, 11):
        rng = random.Random(seed)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(35)]
        edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {r.doc_id: r.component_id for r in dd.connected_components(pairs).collect()}
        assert got == want, seed


def test_connected_components_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir switches the per-round lineage truncation from
    localCheckpoint (executor-local blocks, loss-fatal on a cluster) to
    reliable checkpoint() files.  Labels must be identical in both
    modes, and the reliable mode must actually write checkpoint files."""
    import glob
    import random

    rng = random.Random(13)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])

    local = {r.doc_id: r.component_id for r in dd.connected_components(pairs).collect()}
    ckpt = str(tmp_path / "ckpt")
    reliable = {
        r.doc_id: r.component_id
        for r in dd.connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert reliable == local
    assert glob.glob(ckpt + "/*/rdd-*"), "reliable mode must write checkpoint files"


def test_positional_filter_prunes_without_loss(spark):
    """PPJoin positional filter: candidates are a STRICT subset of the
    plain prefix-join candidates on a mixed corpus, survivors still
    contain every true >= tau pair, and the end result equals brute
    force (lossless by theorem, measured here)."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(vocab[rng.randrange(50)] for _ in range(rng.randint(8, 30))))
        for i in range(60)
    ]
    rows += [(100 + j, rows[j][1] + " tail") for j in range(8)]  # near-dups
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    tau = 0.7

    hashed = dd.hash_shingles(dd.char_shingles(corpus)).cache()
    prefixes = dd._prefix_frame(hashed, tau).cache()
    plain = {
        (r.doc_a, r.doc_b)
        for r in dd.candidate_pairs(prefixes.select("doc_id", "h"), key="h").collect()
    }
    positional = {
        (r.doc_a, r.doc_b) for r in dd._positional_candidates(prefixes, tau).collect()
    }
    brute = {
        (r.doc_a, r.doc_b) for r in dd.jaccard_pairs(dd.char_shingles(corpus), tau).collect()
    }
    assert brute, "constructed corpus must contain >= tau pairs"
    assert positional <= plain
    assert len(positional) < len(plain)  # the filter measurably prunes
    assert brute <= positional  # and loses nothing


def test_positional_filter_lossless_on_skewed_lengths(spark):
    """Skewed-length corpus: tiny docs sharing rare shingles with huge
    docs (high containment, low Jaccard) — exactly what the PPJoin
    length filter prunes pre-shuffle.  The per-row pushed filters must
    still equal brute force for several tau values."""
    import random

    rng = random.Random(99)
    vocab = [f"tok{i}" for i in range(120)]
    rows = []
    for i in range(25):  # tiny docs: 3-6 words
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 6)))))
    for i in range(25, 40):  # huge docs: 150-300 words
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(150, 300)))))
    # tiny doc fully CONTAINED in a huge doc: jaccard far below tau but
    # every shingle shared — length filter prunes these pre-shuffle
    for j in range(5):
        rows.append((200 + j, rows[j][1] + " " + rows[25 + j][1]))
    # true near-dups at both scales
    rows.append((300, rows[0][1]))
    rows.append((301, rows[26][1] + " tail"))
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])

    for tau in (0.5, 0.8):
        brute = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd.jaccard_pairs(dd.char_shingles(corpus), tau).collect()
        }
        fast = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd.ngram_jaccard_dedup(corpus, tau, on_blowup="force").collect()
        }
        assert brute, tau
        assert fast == brute, tau


def test_tau_fraction_small_denominator_rounds_down():
    """Long-decimal taus (1/3 as a float) must NOT become p/q with
    q=1e16 — the integer filter forms ub·(p+q) and p·(na+nb) would
    overflow int64 for large docs, silently wrapping under non-ANSI
    mode and turning the lossless filters lossy.  The normalized
    fraction stays small AND never exceeds tau (rounding UP could prune
    true pairs; rounding DOWN only weakens the filters)."""
    from fractions import Fraction

    # exact short decimals keep their exact form
    assert dd._tau_fraction(0.8) == (4, 5)
    assert dd._tau_fraction(0.5) == (1, 2)
    for tau in (1 / 3, 2 / 3, 0.123456789123456789, 1 / 7, 1 / 6):
        p, q = dd._tau_fraction(tau)
        assert q <= 10**6, (tau, p, q)
        assert Fraction(p, q) <= Fraction(str(tau)), (tau, p, q)
        # and TIGHT: within 1e-6 of tau.  The old 2/q bound was vacuous
        # at small q — the round-down nudge of 1/q once collapsed
        # tau=1/3 to (0,1), degenerating the prefix/positional pruning
        # to brute force while staying "lossless".
        assert Fraction(str(tau)) - Fraction(p, q) <= Fraction(1, 10**6), (tau, p, q)
        # int64 headroom: worst filter term is p·(na+nb) with doc sizes
        # up to ~2^31 shingles
        assert p * (2**32) < 2**63 and (p + q) * (2**32) < 2**63


def test_tau_fraction_rejects_sub_1e6_tau():
    """tau below 1e-6 is OUT of the supported range: the old clamp to
    1/10**6 exceeded such taus, so on ~1e6-shingle docs the lossless
    filters could prune a true pair with jaccard in [tau, 1e-6) that
    exact-verify can never recover.  Rejecting beats silent loss."""
    import pytest as _pytest

    for tau in (1e-7, 1e-9, 5e-7):
        with _pytest.raises(ValueError, match="supported minimum"):
            dd._tau_fraction(tau)
    # exact behavior right at the supported boundary
    p, q = dd._tau_fraction(1e-6)
    assert (p, q) == (1, 10**6)


def test_prefix_filter_lossless_with_long_decimal_tau(spark):
    """End-to-end: tau passed as the float 1/3 (q would be 1e16 without
    normalization) still yields exactly the brute-force pair set."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(vocab[rng.randrange(40)] for _ in range(rng.randint(6, 20))))
        for i in range(40)
    ]
    rows += [(100 + j, rows[j][1] + " tail") for j in range(6)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    # 1e-6 is the supported floor and exercises the degenerate-tau
    # machinery (p=1, q=1e6): at doc sizes far below 1e6 shingles the
    # prefix stays full-length and the positional/length thresholds
    # stay vacuous, so the floor fraction never prunes a true pair.
    for tau in (1 / 3, 1e-6):
        brute = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd.jaccard_pairs(dd.char_shingles(corpus), tau).collect()
        }
        fast = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in dd.ngram_jaccard_dedup(corpus, tau, on_blowup="force").collect()
        }
        assert brute, tau
        assert fast == brute, tau
    # below the floor the PUBLIC path refuses instead of silently using
    # a LARGER effective threshold (which could prune true pairs on
    # >=1e6-shingle docs — r13 advice item)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="supported minimum"):
        dd.ngram_jaccard_dedup(corpus, 1e-7, on_blowup="force").collect()


def test_repetition_stats_on_constructed_docs(spark):
    from tg_reporting_etl_spark.functions import text as tx

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),            # one token repeated 4x
            (2, "a b c d"),            # all distinct
            (3, "x x y z"),            # top token 2/4, distinct 3/4
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in tx.repetition_stats(docs).collect()}
    assert (got[1].n_tokens, got[1].distinct_tokens) == (4, 1)
    assert got[1].dup_token_fraction == 0.75 and got[1].top_token_fraction == 1.0
    assert got[2].dup_token_fraction == 0.0 and got[2].top_token_fraction == 0.25
    assert got[3].dup_token_fraction == 0.25 and got[3].top_token_fraction == 0.5


def test_cross_source_contamination_channels_and_orientation(spark):
    """Exact twins report once on the exact channel oriented
    train->eval; near pairs cross the boundary regardless of which side
    of the (doc_a < doc_b) pair normalization the eval doc landed on;
    same-side pairs and digest-equal near pairs are excluded."""
    docs = spark.createDataFrame(
        [
            (1, "identical text", "eval_set"),
            (2, "identical text", "train_a"),   # exact leak, eval id < train id
            (3, "near text one", "train_b"),
            (4, "near text two", "eval_set"),   # near leak, eval id > train id
            (5, "other eval doc", "eval_set"),
            (6, "other train doc", "train_a"),
        ],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame(
        [
            (1, 2, 1.0),   # digest-equal: must NOT be re-reported as near
            (3, 4, 0.6),   # cross-boundary near dup
            (5, 4, 0.5),   # eval-eval: excluded
            (3, 6, 0.5),   # train-train: excluded
        ],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {
        (r.train_doc_id, r.eval_doc_id): (r.kind, r.jaccard)
        for r in dd.cross_source_contamination(docs, pairs, ["eval_set"]).collect()
    }
    assert got == {(2, 1): ("exact", 1.0), (3, 4): ("near", 0.6)}


def test_best_representatives_argmax_and_ties(spark):
    """Per-component rep = highest quality, ties -> min doc_id; docs
    outside any pair never appear; n_members counts the component."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["doc_a", "doc_b"]
    )
    scored = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.5),     # chain: rep=2 (max quality)
            (10, 0.7), (11, 0.7),             # tie: rep=min id 10
            (20, 0.0), (21, 0.0),             # all-zero tie: rep=20
            (99, 1.0),                        # isolated — excluded
        ],
        ["doc_id", "quality"],
    )
    got = {
        (r.component_id, r.rep_doc_id, r.best_quality, r.n_members)
        for r in dd.best_representatives(scored, pairs).collect()
    }
    assert got == {(1, 2, 0.9, 3), (10, 10, 0.7, 2), (20, 20, 0.0, 2)}


def test_boilerplate_ngrams_and_fraction(spark):
    """Constructed corpus: 'the same footer' sits in 3 docs (df=3);
    fraction counts instances, not types; short docs drop out."""
    from tg_reporting_etl_spark.functions import text as tx

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma the same footer"),
            (2, "delta eps the same footer"),
            (3, "the same footer the same footer"),
            (4, "unique words only here now"),
            (5, "too short"),  # < 3 words: no grams
        ],
        ["doc_id", "text"],
    )
    bp = {(r.gram, r.df) for r in tx.boilerplate_ngrams(docs, n=3, min_df=3).collect()}
    assert bp == {("the same footer", 3)}

    frac = {r.doc_id: (r.n_grams, r.n_boiler, r.boiler_frac)
            for r in tx.boilerplate_fraction(docs, n=3, min_df=3).collect()}
    assert 5 not in frac
    assert frac[1] == (4, 1, 0.25)
    assert frac[2] == (3, 1, 0.333333)  # 5 words -> 3 trigram instances
    # doc 3 has 4 gram instances, 2 of them the footer
    assert frac[3] == (4, 2, 0.5)
    assert frac[4] == (3, 0, 0.0)


def test_boilerplate_matches_python_reference_property(spark):
    """Property: randomized corpora — Spark boilerplate df and per-doc
    fractions equal a driver-side pure-Python count.  Directed random
    sweep (deterministic seeds), one Spark job per case."""
    import random
    from collections import Counter

    from tg_reporting_etl_spark.functions import text as tx

    for seed, n, min_df in [(11, 2, 2), (12, 3, 2), (13, 3, 3), (14, 4, 2)]:
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d", "e"]
        rows = []
        for i in range(25):
            k = rng.randint(1, 12)  # include docs shorter than n
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])

        # pure-python reference
        per_doc = {}
        df_count: Counter = Counter()
        for i, text in rows:
            toks = text.split(" ")
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            if grams:
                per_doc[i] = grams
        for i, grams in per_doc.items():
            for g in set(grams):
                df_count[g] += 1
        want_bp = {(g, c) for g, c in df_count.items() if c >= min_df}
        got_bp = {(r.gram, r.df) for r in tx.boilerplate_ngrams(docs, n, min_df).collect()}
        assert got_bp == want_bp, (seed, n, min_df)

        want_frac = {
            i: (
                len(grams),
                sum(1 for g in grams if df_count[g] >= min_df),
            )
            for i, grams in per_doc.items()
        }
        got = {
            r.doc_id: (r.n_grams, r.n_boiler, r.boiler_frac)
            for r in tx.boilerplate_fraction(docs, n, min_df).collect()
        }
        assert set(got) == set(want_frac), (seed, n, min_df)
        for i, (ng, nb) in want_frac.items():
            assert got[i][:2] == (ng, nb), (seed, i)
            assert got[i][2] == round(nb / ng, 6), (seed, i)


def test_boilerplate_fraction_strided_matches_python_reference(spark):
    """Strided scale path: df AND instances run over every stride-th
    gram start; n_grams counts SAMPLED positions.  Verified against a
    pure-Python reference over randomized corpora (incl. docs whose
    last sampled position is mid-tail), plus stride=1 == exact."""
    import random
    from collections import Counter

    from tg_reporting_etl_spark.functions import text as tx

    for seed, n, min_df, stride in [(21, 3, 2, 2), (22, 3, 3, 3), (23, 2, 2, 4)]:
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d", "e"]
        rows = []
        for i in range(25):
            k = rng.randint(1, 15)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])

        per_doc = {}
        df_count: Counter = Counter()
        for i, text in rows:
            toks = text.split(" ")
            grams = [
                " ".join(toks[j : j + n]) for j in range(0, len(toks) - n + 1, stride)
            ]
            if len(toks) >= n:
                per_doc[i] = grams
        for i, grams in per_doc.items():
            for g in set(grams):
                df_count[g] += 1

        got = {
            r.doc_id: (r.n_grams, r.n_boiler, r.boiler_frac)
            for r in tx.boilerplate_fraction(docs, n, min_df, stride=stride).collect()
        }
        assert set(got) == set(per_doc), (seed, stride)
        for i, grams in per_doc.items():
            ng = len(grams)
            nb = sum(1 for g in grams if df_count[g] >= min_df)
            assert got[i] == (ng, nb, round(nb / ng, 6)), (seed, i, stride)

    # stride=1 is byte-identical to the exact operator
    docs = spark.createDataFrame(
        [(i, " ".join("abcde"[j % 5] for j in range(i + 1, i + 9))) for i in range(12)],
        ["doc_id", "text"],
    )
    exact = {tuple(r) for r in tx.boilerplate_fraction(docs, 3, 2).collect()}
    s1 = {tuple(r) for r in tx.boilerplate_fraction(docs, 3, 2, stride=1).collect()}
    assert s1 == exact


def test_ivf_index_roundtrip_and_partition_pruning(spark, emb, tmp_path):
    """Materialized IVF index: probe results equal the in-memory ivf_topk
    for the same quantizer, and the cell scan is DYNAMICALLY
    PARTITION-PRUNED (reads probed cell dirs, not the corpus)."""
    idx = str(tmp_path / "ivf_index")
    sim.build_ivf_index(emb, idx, n_cells=16)

    queries = emb.filter(F.col("vec_id") % 100 == 7).select("vec_id", "embedding")
    got = sim.ivf_index_topk(spark, idx, queries, k=3, nprobe=2)

    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in sim.ivf_topk(emb, F.col("vec_id") % 100 == 7, k=3, n_cells=16, nprobe=2).collect()
    }
    got_rows = {(r.query_id, r.rank): (r.neighbor_id, r.cos_sim) for r in got.collect()}
    assert got_rows == want

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "cell scan is not partition-pruned"


def test_curate_corpus_filters_and_keeper_semantics(spark):
    """Quality floor, repetition ceiling, and non-keeper removal each
    independently drop the right doc; keepers survive."""
    from tg_reporting_etl_spark.functions import curation as cu

    good = "the quick brown fox jumps over the lazy dog " * 12  # long, stopwordy
    docs = spark.createDataFrame(
        [
            (1, good + "one", "s1"),
            (2, good + "two", "s1"),          # near-dup of 1 (non-keeper)
            (3, "tiny text", "s1"),           # fails quality floor
            (4, "rep rep rep rep rep rep rep rep rep rep rep rep rep rep rep rep "
                * 8 + good, "s2"),            # fails dup-fraction ceiling
            (5, good + "five five", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    components = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "component_id"])
    kept = cu.curate_corpus(docs, components, min_quality=0.3, max_dup_fraction=0.93)
    assert {r.doc_id for r in kept.collect()} == {1, 5}
    budget = {(r.source): (r.n_docs, r.n_tokens) for r in cu.corpus_budget(kept).collect()}
    assert budget["s1"][0] == 1 and budget["s2"][0] == 1


def test_sharded_cumsum_equals_single_window(spark):
    """Two-pass distributed scan == the single-partition window, on a
    sparse, shuffled id space that spans many shards."""
    import random

    from tg_reporting_etl_spark.functions import packing as pk

    rng = random.Random(9)
    rows = [(i * 37 + rng.randrange(20), rng.randrange(1, 50)) for i in range(300)]
    ids = set()
    rows = [(oid, v) for oid, v in rows if not (oid in ids or ids.add(oid))]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(8)

    got = {
        r.doc_id: r.cum_before
        for r in pk.sharded_cumsum(df, "doc_id", "n_tokens", n_shards=16).collect()
    }
    acc, want = 0, {}
    for oid, v in sorted(rows):
        want[oid] = acc
        acc += v
    assert got == want


def test_pack_sequences_invariants(spark):
    """Every block is exactly seq_len full except the tail; fills sum to
    the corpus token count; a doc spanning blocks counts in each."""
    from tg_reporting_etl_spark.functions import packing as pk

    rows = [(1, 100), (2, 50), (3, 300), (4, 7), (5, 0), (6, 200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = sorted((r.seq_id, r.n_docs, r.n_tokens) for r in pk.pack_sequences(df, 128).collect())

    total = sum(v for _, v in rows)
    assert sum(t for _, _, t in out) == total
    *full, tail = out
    assert all(t == 128 for _, _, t in full)
    assert tail[2] == total - 128 * len(full)
    assert [s for s, _, _ in out] == list(range(len(out)))
    # doc 3 occupies offsets [150, 450): blocks 1,2,3 -> seq 1 counts docs 2? no:
    # offsets: d1 [0,100) d2 [100,150) d3 [150,450) d4 [450,457) d6 [457,657)
    by_seq = {s: nd for s, nd, _ in out}
    assert by_seq[0] == 2   # d1, d2
    assert by_seq[1] == 2   # d2, d3
    assert by_seq[2] == 1   # d3
    assert by_seq[3] == 3   # d3, d4, d6


def test_balanced_shard_writer_roundtrip(spark, docs, tmp_path):
    """Shards are contiguous in doc_id, balanced to within one doc's
    tokens, and the roundtrip loses nothing."""
    from tg_reporting_etl_spark.functions import packing as pk

    out = str(tmp_path / "shards")
    target = 3000
    pk.write_balanced_shards(docs.select("doc_id", "text"), out, target)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    stats = {
        r.shard: (r.toks, r.lo, r.hi)
        for r in back.select(
            "shard", F.size(F.split("text", " ")).alias("nt"), "doc_id"
        )
        .groupBy("shard")
        .agg(F.sum("nt").alias("toks"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    }
    max_doc_tokens = docs.select(F.max(F.size(F.split("text", " ")))).first()[0]
    shards = sorted(stats)
    for s in shards[:-1]:
        assert abs(stats[s][0] - target) < max_doc_tokens, (s, stats[s])
    # contiguity: id ranges never interleave
    for a, b in zip(shards, shards[1:]):
        assert stats[a][2] < stats[b][1]


def test_pack_token_ids_consistent_with_stats_twin(spark, docs):
    """The materialized blocks agree with the stats-only packer on
    (seq_id, n_tokens); serialized ids are well-formed and in-vocab."""
    from tg_reporting_etl_spark.functions import packing as pk

    toks = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    stats = {(r.seq_id, r.n_tokens) for r in pk.pack_sequences(toks, 512).collect()}
    mat = pk.pack_token_ids(docs, 512, 32768).collect()
    assert {(r.seq_id, r.n_tokens) for r in mat} == stats
    for r in mat:
        ids = r.token_ids.split("-")
        assert len(ids) == r.n_tokens
        assert all(0 <= int(i) < 32768 for i in ids)


def test_text_family_drops_null_text(spark):
    """Family contract: NULL text never reaches downstream signals — it
    is dropped by every text operator rather than emitting null stats
    that would poison quality filters and arg-maxes."""
    from tg_reporting_etl_spark.functions import text as tx

    d = spark.createDataFrame(
        [(1, "the fast key of the run"), (2, None)], "doc_id long, text string"
    )
    for fn in (tx.with_token_stats, tx.with_quality, tx.with_lang_id,
               tx.with_fingerprint, tx.repetition_stats):
        rows = fn(d).collect()
        assert [r.doc_id for r in rows] == [1], fn.__name__
        assert all(v is not None for v in rows[0].asDict().values()), fn.__name__
    assert tx.word_ngram_rows(d, 2).filter("doc_id = 2").count() == 0


def test_full_pipeline_integration(spark, docs, tmp_path):
    """The whole LLM data pipeline composed end to end on real testdata:
    near-dup components -> quality-aware curation -> mixture sampling ->
    sequence packing -> balanced shard write.  Each stage consumes the
    previous stage's actual output; invariants hold at every joint."""
    from tg_reporting_etl_spark.functions import curation as cu
    from tg_reporting_etl_spark.functions import packing as pk
    from tg_reporting_etl_spark.functions import sampling as sp
    from tg_reporting_etl_spark.functions import spans as sn
    from tg_reporting_etl_spark.functions import text as tx

    n_docs = docs.count()

    # 1. near-dup graph -> components (docs outside any pair excluded)
    pairs = dd.ngram_jaccard_dedup_capped(docs, 0.35)
    comp = dd.connected_components(pairs.select("doc_a", "doc_b"))
    assert 0 < comp.count() < n_docs

    # 2. curation: quality floor + repetition ceiling + non-keeper drop
    kept = cu.curate_corpus(docs, comp, 0.3, 0.6).cache()
    n_kept = kept.count()
    assert 0 < n_kept < n_docs
    dropped_ids = {r.doc_id for r in comp.filter("doc_id != component_id").collect()}
    assert not dropped_ids & {r.doc_id for r in kept.collect()}

    # 3. substring surgery on the curated survivors — doc-LEVEL dedup
    # runs first (whole near-dup docs already dropped; running surgery
    # earlier would excise the very spans the pair stage detects), then
    # the residual cross-doc boilerplate spans are cut from the keepers
    kept_docs = docs.join(kept.select("doc_id"), "doc_id")
    clean = sn.remove_duplicated_spans(kept_docs)
    assert clean.count() == n_kept  # every survivor comes back
    assert clean.agg(F.sum("removed_chars")).first()[0] >= 0
    kept_docs = kept_docs.drop("text").join(
        clean.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    ).cache()
    assert kept_docs.count() == n_kept

    # 4. mixture sample over the CURATED corpus
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    mixed = sp.mixture_sample(kept, "source", weights).cache()
    assert 0 < mixed.count() <= n_kept
    assert {r.source for r in mixed.collect()} <= set(weights)

    # 5. pack the sampled docs into training blocks
    packed = pk.pack_sequences(mixed.select("doc_id", "n_tokens"), 256).collect()
    total_tokens = mixed.agg(F.sum("n_tokens")).first()[0]
    assert sum(r.n_tokens for r in packed) == total_tokens
    assert all(r.n_tokens == 256 for r in sorted(packed, key=lambda r: r.seq_id)[:-1])

    # 6. write the mixed corpus (CLEANED text) as balanced shards
    #    and read it back whole
    out = str(tmp_path / "pipeline_shards")
    text_back = kept_docs.select("doc_id", "text").join(mixed.select("doc_id"), "doc_id")
    pk.write_balanced_shards(text_back, out, tokens_per_shard=2000)
    assert spark.read.parquet(out).count() == mixed.count()


def test_sharded_cumsum_scales_to_a_million_rows(spark):
    """Volume smoke for the distributed scan: 1M rows, 256 shards —
    bounded wall clock, exact global total, driver touches only the
    per-shard totals."""
    import time

    from tg_reporting_etl_spark.functions import packing as pk

    df = (
        spark.range(1_000_000)
        .select(F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n_tokens"))
        .repartition(32)
    )
    t0 = time.perf_counter()
    out = pk.sharded_cumsum(df, "doc_id", "n_tokens", n_shards=256)
    last = out.orderBy(F.desc("doc_id")).select("cum_before", "n_tokens").first()
    wall = time.perf_counter() - t0
    total = df.agg(F.sum("n_tokens")).first()[0]
    assert last.cum_before + last.n_tokens == total  # exact inclusive total
    assert wall < 60, f"cumsum over 1M rows took {wall:.1f}s"


def test_quality_report_counts_each_rule_kind(spark):
    """Constructed violations: null, out-of-set, out-of-range, dup key —
    each rule reports exactly its own count; null predicate counts as a
    violation (unknown is not provably valid)."""
    from tg_reporting_etl_spark.functions.validate import quality_report

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "b", 50.0),
            (2, "zz", -1.0),   # dup id, bad enum, below range
            (None, "a", None), # null id, null value
        ],
        "id long, kind string, v double",
    )
    got = {
        r.rule: r.n_violations
        for r in quality_report(
            df, not_null=["id"], in_set={"kind": ["a", "b"]},
            ranges={"v": (0.0, 100.0)}, unique=["id"],
        ).collect()
    }
    assert got == {
        "id_not_null": 1,
        "kind_in_set": 1,
        "v_range": 2,      # -1.0 below range + NULL (unknown)
        "id_unique": 1,
    }


def test_funnel_steps_ordered_progression(spark):
    """Out-of-order steps don't advance; session boundaries isolate
    progressions; the distribution counts sessions, not users."""
    import datetime as dt

    from tg_reporting_etl_spark.operators.sessions import funnel_steps

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def ev(uid, mins, et):
        return (t0 + dt.timedelta(minutes=mins), uid, et, 1.0)

    events = spark.createDataFrame(
        [
            # user 1: view -> (premature purchase ignored) -> click -> purchase = 3
            ev(1, 0, "view"), ev(1, 1, "purchase"), ev(1, 2, "click"), ev(1, 3, "purchase"),
            # user 2: click before any view never counts; later view = 1
            ev(2, 0, "click"), ev(2, 1, "view"),
            # user 3: two sessions (2h apart), each only reaches view = two step-1 sessions
            ev(3, 0, "view"), ev(3, 120, "view"),
            # user 4: nothing relevant = 0
            ev(4, 0, "error"),
        ],
        "ts timestamp, user_id long, event_type string, value double",
    )
    got = {
        r.funnel_step: r.n_sessions
        for r in funnel_steps(events, ["view", "click", "purchase"], 30).collect()
    }
    assert got == {3: 1, 1: 3, 0: 1}


def test_leakage_safe_split_co_travel(spark, sf_dir):
    """Every near-dup pair must land in ONE split, and the hash split
    must cover all docs in roughly 80/10/10."""
    from tg_reporting_etl_spark.plans.llm_plans import (
        q_doc_leakage_safe_split,
        _capped_pairs,
    )

    split = q_doc_leakage_safe_split(spark, sf_dir)
    pairs = _capped_pairs(spark, sf_dir).select("doc_a", "doc_b")
    a = split.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "split_a")
    b = split.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "split_b")
    straddle = (
        pairs.join(a.select("doc_a", "split_a"), "doc_a")
        .join(b.select("doc_b", "split_b"), "doc_b")
        .filter("split_a <> split_b")
    )
    assert straddle.count() == 0

    import pyspark.sql.functions as F

    n = split.count()
    by = {r.split: r.c for r in split.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert n == 500 and set(by) <= {"train", "validation", "test"}
    assert by["train"] / n > 0.6  # md5 bucket split is ~80/10/10


def test_decoder_registry_selects_stub_here():
    """This container has no image libs: the registry must pick the
    stub and decode_image keeps its honest NotImplementedError."""
    if mm._pillow_available():
        pytest.skip("Pillow present — the pillow-path test covers this env")
    assert mm.selected_image_decoder_name() == "stub"


def test_registered_decoder_activates_resize_without_code_change(docs, spark):
    """register_image_decoder mirrors the merge-backend registry: a
    custom decoder (here a deterministic fake 'codec') wins the probe
    and resize_images decodes + resamples through it — zero changes to
    the operator call."""

    def fake_decode(data: bytes) -> dict:
        # 2x2 RGB 'image': 4 pixels derived from the payload bytes
        px = bytes((data * 12)[:12])
        return {"width": 2, "height": 2, "mode": "RGB", "pixels": px}

    mm.register_image_decoder("fake", lambda: True, fake_decode)
    try:
        assert mm.selected_image_decoder_name() == "fake"
        media = mm.attach_fake_media(docs.limit(30))
        out = {r.doc_id: r for r in mm.resize_images(media, 2, 2).collect()}
        assert out  # image rows exist (doc_id % 3 == 0)
        for r in out.values():
            raw = bytes((bytes(media.filter(F.col("doc_id") == r.doc_id).collect()[0].media) * 12)[:12])
            assert bytes(r.thumb) == raw  # identity resample at native 2x2
            assert (r.width, r.height) == (2, 2)
    finally:
        mm._IMAGE_DECODERS[:] = [e for e in mm._IMAGE_DECODERS if e[0] != "fake"]


@pytest.mark.skipif(not mm._pillow_available(), reason="Pillow not installed in this container")
def test_pillow_decoder_end_to_end(docs, spark):
    """Activates automatically in environments that ship Pillow: a real
    PNG decodes and resamples to an RGB thumb of exactly 3*w*h bytes."""
    import io

    import PIL.Image

    img = PIL.Image.new("RGB", (8, 8), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    decoded = mm.decode_image(buf.getvalue())
    assert (decoded["width"], decoded["height"]) == (8, 8)
    assert len(decoded["pixels"]) == 8 * 8 * 3

    media = spark.createDataFrame(
        [(0, bytearray(buf.getvalue()), "image/png")],
        "doc_id long, media binary, media_type string",
    )
    row = mm.resize_images(media, 4, 4).collect()[0]
    assert len(bytes(row.thumb)) == 4 * 4 * 3
    assert bytes(row.thumb)[:3] == bytes((10, 20, 30))


def test_eval_overlap_report_fractions(spark):
    """Per-eval-doc contamination: fully-contained eval doc -> 1.0,
    half-overlapping -> 0.5, disjoint -> 0.0 (still reported, n_overlap
    0); train docs never appear; shingles are DISTINCT per doc so
    repeated grams count once."""
    docs = spark.createDataFrame(
        [
            (1, "abcdef", "train_a"),
            (2, "xyzxyz", "train_b"),
            (3, "abcdef", "eval_set"),   # all 4 shingles in train
            (4, "abcxyz", "eval_set"),   # abc + xyz hit, bcx + cxy miss
            (5, "qqqqq", "eval_set"),    # one distinct shingle, no hit
        ],
        "doc_id long, text string, source string",
    )
    hashed = dd.shingle_hashes(docs, k=3)
    got = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_frac)
        for r in dd.eval_overlap_report(docs, hashed, ["eval_set"]).collect()
    }
    assert got == {3: (4, 4, 1.0), 4: (4, 2, 0.5), 5: (1, 0, 0.0)}


# ---------------------------------------- embedding dup-pairs gate (r10)


def test_embedding_gate_small_corpus_picks_gemm(emb):
    """Within budget the gate runs the exact blocked GEMM — result
    equals the fold-based exact operator, path recorded in path_sink."""
    tau = 0.3
    sink = {}
    gated = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in sim.embedding_dup_pairs_gated(emb, tau, path_sink=sink).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim for r in sim.embedding_dup_pairs(emb, tau).collect()
    }
    assert sink["path"] == "gemm" and sink["npairs"] <= sink["budget"]
    assert gated.keys() == exact.keys()
    for k in exact:
        assert abs(gated[k] - exact[k]) < 2e-6


def test_embedding_gate_error_mode_names_optins(emb):
    """'error' is the DEFAULT: past the budget the exact operator
    refuses, naming both explicit opt-ins."""
    with pytest.raises(ValueError) as exc:
        sim.embedding_dup_pairs_gated(emb, 0.3, pair_budget_per_vec=0, budget_floor=0)
    msg = str(exc.value)
    assert "on_blowup='lsh'" in msg and "on_blowup='force'" in msg


def test_embedding_gate_banded_is_exact_subset(emb):
    """Banded path: every REPORTED pair is exact (same cosine as brute
    force); the pair set is a subset of the exact result."""
    tau = 0.3
    sink = {}
    banded = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in sim.embedding_dup_pairs_gated(
            emb, tau, on_blowup="lsh", pair_budget_per_vec=0, budget_floor=0,
            path_sink=sink,
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim for r in sim.embedding_dup_pairs(emb, tau).collect()
    }
    assert sink["path"] == "lsh" and sink["est"] >= len(banded)
    assert set(banded) <= set(exact)
    for k in banded:
        assert abs(banded[k] - exact[k]) < 2e-6


def test_banded_verify_equals_fold(emb):
    """verify_cosine_pairs (Arrow-batched numpy) == the sequential-fold
    cosine after 6-place rounding, on the full pair set — the verify
    stage changes execution, not results."""
    tau = 0.3
    ids = emb.select(F.col("vec_id").alias("vec_a"))
    pairs = ids.join(
        emb.select(F.col("vec_id").alias("vec_b")), F.col("vec_a") < F.col("vec_b")
    )
    vec = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in sim.verify_cosine_pairs(emb, pairs, tau).collect()
    }
    fold = {
        (r.vec_a, r.vec_b): r.cos_sim for r in sim.embedding_dup_pairs(emb, tau).collect()
    }
    assert vec.keys() == fold.keys()
    for k in fold:
        assert abs(vec[k] - fold[k]) < 2e-6


def test_banded_recall_floor_on_near_dups(spark):
    """The banded path's recall contract: true near-dups (cos -> 1)
    collide in some sign band with probability -> 1.  A corpus of
    random 64-dim vectors plus small-noise copies must keep >= 0.9
    recall at tau=0.9 against the exact GEMM ground truth."""
    import random

    rng = random.Random(7)
    rows = []
    vid = 0
    for _ in range(60):
        base = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((vid, [float(x) for x in base]))
        vid += 1
        # one near-dup copy: 2% relative noise -> cos ~ 0.999
        noisy = [x * (1 + rng.gauss(0, 0.02)) for x in base]
        rows.append((vid, [float(x) for x in noisy]))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.vec_a, r.vec_b)
        for r in sim.embedding_dup_pairs_gated(corpus, 0.9, on_blowup="force").collect()
    }
    banded = {
        (r.vec_a, r.vec_b)
        for r in sim.embedding_dup_pairs_gated(
            corpus, 0.9, on_blowup="lsh", pair_budget_per_vec=0, budget_floor=0
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    recall = len(banded & exact) / len(exact)
    assert recall >= 0.9, f"banded near-dup recall {recall:.3f} < 0.9"
    assert banded <= exact


def test_capped_default_is_constant_not_corpus_growing(docs):
    """Round-10 contract: the df cap defaults to a CONSTANT (250), so
    worst-case candidates are bounded at #shingles * C(250, 2) at any
    corpus size; the old corpus-growing cap (n//divisor) is an explicit
    opt-in.  On this corpus the legacy cap (n//20) is tighter, so the
    legacy pair set must be a subset of the default's."""
    tau = 0.35
    default = {(r.doc_a, r.doc_b) for r in dd.ngram_jaccard_dedup_capped(docs, tau).collect()}
    explicit = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_dedup_capped(docs, tau, max_df=250).collect()
    }
    assert default == explicit
    legacy = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_dedup_capped(docs, tau, max_df_divisor=20).collect()
    }
    assert legacy <= default


def test_shingle_novelty_truth_table(spark):
    """Crafted corpus: doc 1 unique, doc 2 == doc 3 (zero novelty),
    doc 4 half-shared with doc 1."""
    rows = [
        (1, "abcdefgh"),      # shingles abcde..defgh; 'defgh' also in doc 4
        (2, "xxxxxyyyy"),     # identical to doc 3 -> all df>=2
        (3, "xxxxxyyyy"),
        (4, "defghijkl"),     # 'defgh' shared with doc 1, rest unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.shingle_hashes(docs, 5)
    out = {r.doc_id: r for r in dd.shingle_novelty(sh).collect()}
    assert out[2].n_novel == 0 and out[2].novelty_fraction == 0.0
    assert out[3].n_novel == 0
    # doc 1: 4 shingles, 'defgh' shared -> 3 novel
    assert (out[1].n_shingles, out[1].n_novel) == (4, 3)
    assert out[1].novelty_fraction == 0.75
    # doc 4: 5 shingles, 'defgh' shared -> 4 novel
    assert (out[4].n_shingles, out[4].n_novel) == (5, 4)
    # bounds invariant
    for r in out.values():
        assert 0 <= r.n_novel <= r.n_shingles


def test_zero_norm_embedding_never_matches(spark):
    """Degenerate-vector contract, both verify paths and EVERY tau: an
    all-zero embedding has no direction, so its pairs never survive —
    NULL cosine on the fold path (try_divide, no ANSI DIVIDE_BY_ZERO),
    explicit drop on the Arrow path.  tau=0.0 is the case where a
    clamped cos of 0.0 would otherwise pass (0.0 >= 0.0) and the two
    paths would diverge."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),   # exact twin of 1
        (3, [0.0, 0.0, 0.0]),   # degenerate
    ]
    emb3 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "vec_a long, vec_b long"
    )

    for tau in (0.9, 0.0):
        exact = {
            (r.vec_a, r.vec_b) for r in sim.embedding_dup_pairs(emb3, tau).collect()
        }
        assert exact == {(1, 2)}, tau
        verified = {
            (r.vec_a, r.vec_b, r.cos_sim)
            for r in sim.verify_cosine_pairs(emb3, pairs, tau).collect()
        }
        assert verified == {(1, 2, 1.0)}, tau


def test_embedding_dup_components_cluster_near_dups(spark):
    """Noisy copies of the same base vector land in one component with
    the min vec_id as keeper."""
    import random

    rng = random.Random(3)
    rows = []
    vid = 0
    bases = []
    for _ in range(10):
        base = [rng.gauss(0, 1) for _ in range(64)]
        bases.append(base)
        for _ in range(3):  # 3 noisy members per family
            rows.append((vid, [float(x * (1 + rng.gauss(0, 0.01))) for x in base]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = sim.embedding_dup_pairs_gated(
        corpus, 0.95, on_blowup="lsh", pair_budget_per_vec=0, budget_floor=0
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    comp = {r.doc_id: r.component_id for r in dd.connected_components(pairs).collect()}
    # members of a family share a component labeled by the family min
    families = {}
    for v, c in comp.items():
        families.setdefault(v // 3, set()).add(c)
    for fam, labels in families.items():
        assert len(labels) == 1, f"family {fam} split: {labels}"
        assert min(labels) == fam * 3


def test_unigram_logprob_matches_python_reference(spark):
    """mean -log2 p(tok) under the corpus unigram distribution equals a
    driver-side pure-Python computation; NULL text drops."""
    import math

    from collections import Counter

    from tg_reporting_etl_spark.functions import text as tx

    rows = [
        (1, "a a b"),
        (2, "b c"),
        (3, "a c c d"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    counts = Counter(t for _, x in rows if x for t in x.split(" "))
    total = sum(counts.values())

    got = {r.doc_id: r for r in tx.unigram_logprob(docs).collect()}
    assert set(got) == {1, 2, 3}
    for i, text in rows[:3]:
        toks = text.split(" ")
        want = math.log2(total) - sum(math.log2(counts[t]) for t in toks) / len(toks)
        assert got[i].n_tokens == len(toks)
        assert abs(got[i].neg_log2p - round(want, 6)) < 2e-6, i
