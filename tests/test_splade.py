"""SPLADE learned-sparse channel: seam regression, CSR parity, training.

The sparse scorer rides `bm25_topk_sorted`'s term_weights seam; these
tests pin (a) the seam is a no-op for BM25 (weights=1 bit-identical to
None), (b) the fused encode->expand->score device program matches a dense
numpy oracle exactly when the posting window covers every posting, and
(c) the contrastive + FLOPS training recipe moves in-batch accuracy off
chance on tiny synthetic pairs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a_modular_rag_framework_tpu.models.encoder import EncoderConfig
from a_modular_rag_framework_tpu.models.splade import (
    SpladeConfig,
    SpladeEncoder,
    apply_splade,
    make_splade_train_step,
    sparsify_topk,
)
from a_modular_rag_framework_tpu.ops.bm25 import Bm25DeviceIndex, bm25_topk_sorted
from a_modular_rag_framework_tpu.ops.splade import (
    SpladeDeviceIndex,
    SpladeRetriever,
)

TEXTS = [
    "Alice Walker wrote the novel in 1982.",
    "The bridge spans the river near Portland.",
    "Bob Marley recorded the album in Kingston.",
    "A museum in Paris exhibits the painting.",
    "The professor taught chemistry at the university.",
    "Alice Walker later moved to California.",
    "The river floods the valley every spring.",
    "Kingston hosts an annual reggae festival.",
]


def tiny_cfg(**kw):
    return SpladeConfig(
        encoder=EncoderConfig(vocab_size=512, max_len=16, d_model=32,
                              n_heads=2, n_layers=1, d_ff=64),
        doc_top_terms=32, query_top_terms=8, **kw)


def test_term_weights_seam_is_noop_at_one():
    idx = Bm25DeviceIndex.build(TEXTS)
    idx.ensure_scores()
    q_ids = idx.encode_query_terms(["alice walker novel",
                                    "river bridge portland"], max_terms=6)
    t = jnp.asarray(q_ids)[:, None, :]
    kw = dict(n_docs=idx.n_docs, term_topm=8, pool_k=4)
    s0, d0 = bm25_topk_sorted(t, jnp.asarray(idx.doc_ids),
                              jnp.asarray(idx.scores),
                              jnp.asarray(idx.row_ptr), **kw)
    s1, d1 = bm25_topk_sorted(t, jnp.asarray(idx.doc_ids),
                              jnp.asarray(idx.scores),
                              jnp.asarray(idx.row_ptr),
                              term_weights=jnp.ones(t.shape, jnp.float32),
                              **kw)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_term_weights_scale_contributions():
    idx = Bm25DeviceIndex.build(TEXTS)
    idx.ensure_scores()
    q_ids = idx.encode_query_terms(["alice walker"], max_terms=4)
    t = jnp.asarray(q_ids)[:, None, :]
    kw = dict(n_docs=idx.n_docs, term_topm=8, pool_k=4)
    s1, _ = bm25_topk_sorted(t, jnp.asarray(idx.doc_ids),
                             jnp.asarray(idx.scores),
                             jnp.asarray(idx.row_ptr),
                             term_weights=jnp.ones(t.shape), **kw)
    s2, _ = bm25_topk_sorted(t, jnp.asarray(idx.doc_ids),
                             jnp.asarray(idx.scores),
                             jnp.asarray(idx.row_ptr),
                             term_weights=2.0 * jnp.ones(t.shape), **kw)
    np.testing.assert_allclose(np.asarray(s2), 2.0 * np.asarray(s1),
                               rtol=1e-6)


def test_csr_assembly_sorted_by_impact():
    ids = np.array([[3, 7, -1], [3, 1, 7], [7, 3, -1]], dtype=np.int32)
    w = np.array([[0.5, 2.0, 0.0], [1.5, 1.0, 0.25], [3.0, 0.0, 0.0]],
                 dtype=np.float32)
    idx = SpladeDeviceIndex.from_expansions(ids, w, vocab_size=8)
    # zero-weight entries dropped (doc2 term 3 had w=0): 1 + 2 + 3 kept
    assert idx.row_ptr[-1] == 6
    # term 3: docs 0 (0.5), 1 (1.5) -> impact-descending = doc1 first
    lo, hi = idx.row_ptr[3], idx.row_ptr[4]
    np.testing.assert_array_equal(idx.doc_ids[lo:hi], [1, 0])
    np.testing.assert_allclose(idx.impacts[lo:hi], [1.5, 0.5])
    # term 7: 3.0 (doc2), 2.0 (doc0), 0.25 (doc1)
    lo, hi = idx.row_ptr[7], idx.row_ptr[8]
    np.testing.assert_array_equal(idx.doc_ids[lo:hi], [2, 0, 1])


def test_splade_program_matches_dense_oracle():
    enc = SpladeEncoder(tiny_cfg(), seed=3)
    r = SpladeRetriever(enc, term_topm=64, build_batch=4)
    r.build(TEXTS)
    queries = ["Who wrote the novel?", "Where was the album recorded?"]
    ids, scores = r.query_batch(queries, top_k=4)
    oracle = r.score_dense_oracle(queries)
    for b in range(len(queries)):
        order = np.argsort(-oracle[b], kind="stable")
        got = [i for i in ids[b] if i >= 0]
        want_scores = np.sort(oracle[b])[::-1][: len(got)]
        got_scores = scores[b][: len(got)]
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5,
                                   atol=1e-6)
        # id sets agree wherever scores are distinct
        assert set(got) <= set(order[: len(got) + 4].tolist())


def test_expand_is_sparse_and_nonnegative():
    enc = SpladeEncoder(tiny_cfg(), seed=0)
    ids, w = enc.expand_texts(TEXTS[:3], k=16)
    assert ids.shape == (3, 16) and w.shape == (3, 16)
    assert (w >= 0).all()
    assert ((ids >= -1) & (ids < 512)).all()
    dense = enc.dense_expand([""])  # empty text -> all-masked -> zero
    assert float(np.abs(dense).max()) == 0.0


def test_untrained_expansion_is_lexical():
    """Cold-start property behind from-scratch trainability: at init the
    b0 lexical prior + small expansion gate make every own-token bucket
    outrank every expansion term, so the InfoNCE signal is the lexical
    overlap (the previous head had noise expansions at init — unrelated
    passages outscored gold ones and 300-step training never left the
    tied-score basin; see models/splade.py docstring)."""
    enc = SpladeEncoder(tiny_cfg(), seed=4)
    q = "Where was Maria Lopez born"
    gold = "Maria Lopez was born in Lisbon"
    other = "The chemical formula of water is boring"
    w = enc.dense_expand([q, gold, other])
    ids, mask = enc.host_featurize([q])
    own = np.zeros(w.shape[1], dtype=bool)
    own[np.unique(ids[0][mask[0] > 0])] = True
    assert w[0][own].min() > w[0][~own].max()
    # and the gold passage outscores a distractor by a clear margin (the
    # small-gate expansion terms add a noise FLOOR shared by every doc;
    # what ranks is the margin, carried by the boosted shared buckets)
    assert float(w[0] @ w[1]) - float(w[0] @ w[2]) > 1.0


def test_subword_prior_targets_word_buckets_only():
    """With subword featurization the lexical prior lands ONLY on each
    position's whole-word bucket: char n-gram buckets collide across
    words, and carrying the exact-match prior there makes sparse scoring
    fuzzy (measured: held-out recall@10 0.09 prior-on-all-slots vs ~BM25
    parity prior-on-word-bucket; models/splade.py docstring)."""
    cfg = SpladeConfig(
        encoder=EncoderConfig(vocab_size=4096, max_len=16, d_model=32,
                              n_heads=2, n_layers=1, d_ff=64,
                              subword_ngrams=6),
        doc_top_terms=32, query_top_terms=8)
    enc = SpladeEncoder(cfg, seed=6)
    text = "Mirabelle Quovandis researches aeronautics"
    w = enc.dense_expand([text])[0]
    ids, mask = enc.host_featurize([text])
    word_buckets = np.unique(ids[0][mask[0] > 0][:, 0])
    ngram_only = np.setdiff1d(np.unique(ids[0][mask[0] > 0][:, 1:]),
                              word_buckets)
    assert w[word_buckets].min() > w[ngram_only].max()


def test_idf_prior_ranks_rare_terms_above_common():
    from a_modular_rag_framework_tpu.models.splade import idf_lexical_prior
    import zlib

    cfg = tiny_cfg()
    corpus = [f"the sample number {i} of the set" for i in range(50)]
    corpus.append("the quokka appears once")
    lex = idf_lexical_prior(corpus, cfg)
    V = cfg.vocab_size
    b_rare = zlib.crc32(b"quokka") % V
    b_common = zlib.crc32(b"the") % V
    assert lex[b_rare] > lex[b_common]
    # unseen buckets score at the max (novel entities at held-out time)
    b_unseen = zlib.crc32(b"zyzzyva") % V
    assert lex[b_unseen] >= lex[b_rare]


def test_train_smoke_accuracy_off_chance():
    cfg = tiny_cfg()
    enc = SpladeEncoder(cfg, seed=1)
    queries = [f"who is person{i} anyway" for i in range(16)]
    passages = [f"person{i} works in city{i} at plant{i}" for i in range(16)]
    from a_modular_rag_framework_tpu.models.encoder import encode_tokens
    q_ids, q_mask = encode_tokens(queries, cfg.encoder)
    p_ids, p_mask = encode_tokens(passages, cfg.encoder)
    batch = {"q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
             "p_ids": jnp.asarray(p_ids), "p_mask": jnp.asarray(p_mask)}
    init_state, step = make_splade_train_step(cfg, learning_rate=3e-3)
    params, opt = enc.params, init_state(enc.params)
    step = jax.jit(step)
    first = None
    for i in range(30):
        params, opt, metrics = step(params, opt, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["accuracy"]) >= 0.5  # chance = 1/16
    assert float(metrics["loss"]) < first
    assert float(metrics["doc_nnz"]) > 0


def test_hybrid_fuses_sparse_and_dense():
    enc = SpladeEncoder(tiny_cfg(), seed=7)
    from a_modular_rag_framework_tpu.ops.splade import SpladeDenseHybrid

    h = SpladeDenseHybrid(enc, pool_k=8, build_batch=4)
    h.build(TEXTS)
    ids, scores = h.query_batch(["the river near Portland",
                                 "reggae festival Kingston"], top_k=4)
    assert ids.shape == (2, 4) and scores.shape == (2, 4)
    assert (ids >= -1).all() and (ids < len(TEXTS)).all()
    # returned rows are fused-score-descending
    for b in range(2):
        row = scores[b][ids[b] >= 0]
        assert (np.diff(row) <= 1e-6).all()
    # alpha_dense=0 reduces to pure sparse ordering over the pool
    h_sparse = SpladeDenseHybrid(enc, alpha_sparse=1.0, alpha_dense=0.0,
                                 pool_k=8, build_batch=4)
    h_sparse.build(TEXTS)
    r = SpladeRetriever(enc, term_topm=64, build_batch=4)
    r.build(TEXTS)
    ids_s, _ = h_sparse.query_batch(["the river near Portland"], top_k=4)
    ids_r, _ = r.query_batch(["the river near Portland"], top_k=4)
    np.testing.assert_array_equal(ids_s[0], ids_r[0][:4])


def test_hybrid_rerank_stage_runs():
    from a_modular_rag_framework_tpu.models.cross_encoder import (
        CrossEncoderConfig,
        CrossEncoderReranker,
    )
    from a_modular_rag_framework_tpu.ops.splade import SpladeDenseHybrid

    enc = SpladeEncoder(tiny_cfg(), seed=2)
    rr = CrossEncoderReranker(CrossEncoderConfig(
        vocab_size=512, max_len=24, d_model=32, n_heads=2, n_layers=1,
        d_ff=64))
    h = SpladeDenseHybrid(enc, pool_k=8, build_batch=4, reranker=rr,
                          rerank_top_m=4)
    h.build(TEXTS)
    ids, scores = h.query_batch(["who recorded the album"], top_k=6)
    assert ids.shape == (1, 6)
    # rerank permutes only the top-m prefix; the id SET there is unchanged
    h2 = SpladeDenseHybrid(enc, pool_k=8, build_batch=4)
    h2.build(TEXTS)
    ids2, _ = h2.query_batch(["who recorded the album"], top_k=6)
    assert set(ids[0, :4].tolist()) == set(ids2[0, :4].tolist())
    np.testing.assert_array_equal(ids[0, 4:], ids2[0, 4:])


def test_sharded_splade_matches_single_chip():
    """Doc-range-sharded posting scoring over an 8-device mesh returns the
    same global top-k (ids and scores) as the single-chip scorer."""
    from jax.sharding import Mesh
    from a_modular_rag_framework_tpu.parallel.sharded import (
        shard_splade_postings,
        sharded_splade_topk,
    )

    rng = np.random.default_rng(11)
    N, K, V, B, T = 41, 6, 64, 5, 4
    doc_ids = rng.integers(0, V, size=(N, K)).astype(np.int32)
    # distinct weights -> no score ties across docs
    w = (rng.random((N, K)) + 0.01).astype(np.float32)
    idx = SpladeDeviceIndex.from_expansions(doc_ids, w, vocab_size=V)

    t_ids = rng.integers(0, V, size=(B, T)).astype(np.int32)
    t_ids[0, -1] = -1  # padding slot exercises the valid mask
    t_w = (rng.random((B, T)) + 0.1).astype(np.float32)

    k = 7
    ref_s, ref_i = bm25_topk_sorted(
        jnp.asarray(t_ids)[:, None, :], jnp.asarray(idx.doc_ids),
        jnp.asarray(idx.impacts), jnp.asarray(idx.row_ptr),
        n_docs=N, term_topm=N, pool_k=k,
        term_weights=jnp.asarray(t_w)[:, None, :])

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    d_sh, i_sh, rp_sh, rows = shard_splade_postings(idx, 8)
    sh_s, sh_i = sharded_splade_topk(
        jnp.asarray(t_ids), jnp.asarray(t_w),
        jnp.asarray(d_sh), jnp.asarray(i_sh), jnp.asarray(rp_sh),
        mesh=mesh, rows_per_shard=rows, n_docs=N, k=k, term_topm=N)

    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(sh_i))
    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(sh_s),
                               rtol=1e-6)


def test_save_load_roundtrip(tmp_path):
    cfg = tiny_cfg()
    enc = SpladeEncoder(cfg, seed=5)
    p = tmp_path / "splade.npz"
    enc.save(str(p))
    enc2 = SpladeEncoder.load(str(p), cfg)
    w1 = enc.dense_expand(TEXTS[:2])
    w2 = enc2.dense_expand(TEXTS[:2])
    np.testing.assert_array_equal(w1, w2)
    # index roundtrip
    r = SpladeRetriever(enc, build_batch=4)
    idx = r.build(TEXTS)
    ip = tmp_path / "splade_index.npz"
    idx.save(str(ip))
    idx2 = SpladeDeviceIndex.load(str(ip))
    np.testing.assert_array_equal(idx.doc_ids, idx2.doc_ids)
    np.testing.assert_array_equal(idx.row_ptr, idx2.row_ptr)
    assert idx2.n_docs == idx.n_docs
