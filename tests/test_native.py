"""Native C++ host runtime vs the Python reference paths (bit-exact)."""
import numpy as np
import pytest

from a_modular_rag_framework_tpu.models.hash_embed import HashEmbedEncoder, tokenize
from a_modular_rag_framework_tpu.native import (
    bm25_build_native,
    featurize_batch_native,
    native_available,
    token_counts_native,
)
from a_modular_rag_framework_tpu.ops.bm25 import Bm25DeviceIndex

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")

TEXTS = [
    "The Quick brown-fox jumps!! over the lazy dog 42 times",
    "",
    "unicode déjà-vu splits on accents",
    "repeated repeated repeated tokens",
    "a",
]


def _py_featurize(texts, dim, max_features):
    enc = HashEmbedEncoder(dim=dim, max_features=max_features)
    # force the pure-python loop
    import a_modular_rag_framework_tpu.models.hash_embed as he

    B, L = len(texts), max_features
    buckets = np.zeros((B, L), dtype=np.int32)
    signs = np.zeros((B, L), dtype=np.float32)
    for i, t in enumerate(texts):
        feats = he._features(t)[:L]
        for j, feat in enumerate(feats):
            bkt, s = he._bucket_sign(feat, dim)
            buckets[i, j] = bkt
            signs[i, j] = s
    return buckets, signs


def test_featurize_bit_exact():
    nb, ns = featurize_batch_native(TEXTS, 64, 32)
    pb, ps = _py_featurize(TEXTS, 64, 32)
    np.testing.assert_array_equal(nb, pb)
    np.testing.assert_array_equal(ns, ps)


def test_token_counts_match_python():
    counts = token_counts_native(TEXTS)
    want = [len(tokenize(t)) for t in TEXTS]
    np.testing.assert_array_equal(counts, want)


def test_bm25_build_bit_exact():
    out = bm25_build_native(TEXTS)
    ref = Bm25DeviceIndex.build_python(TEXTS)
    assert out["vocab"] == ref.vocab
    np.testing.assert_array_equal(out["row_ptr"], ref.row_ptr)
    np.testing.assert_array_equal(out["doc_ids"], ref.doc_ids)
    np.testing.assert_array_equal(out["tfs"], ref.tfs)
    np.testing.assert_array_equal(out["doc_lens"], ref.doc_lens)
    np.testing.assert_allclose(out["scores"], ref.ensure_scores(), rtol=1e-5)


def test_bm25_build_streaming_chunks_equal_single_pass():
    big = TEXTS * 20
    a = bm25_build_native(big, chunk=7)
    b = bm25_build_native(big, chunk=100000)
    assert a["vocab"] == b["vocab"]
    np.testing.assert_array_equal(a["doc_ids"], b["doc_ids"])
    np.testing.assert_allclose(a["scores"], b["scores"])


def test_default_build_uses_native_and_matches_python():
    idx_native = Bm25DeviceIndex.build(TEXTS)
    idx_py = Bm25DeviceIndex.build(TEXTS, use_native=False)
    assert idx_native.vocab == idx_py.vocab
    np.testing.assert_array_equal(idx_native.doc_ids, idx_py.doc_ids)
    np.testing.assert_allclose(idx_native.ensure_scores(), idx_py.ensure_scores(),
                               rtol=1e-5)


def test_native_vocab_lookup_matches_python():
    from a_modular_rag_framework_tpu.native.binding import NativeVocab

    corpus = ["alpha beta gamma", "beta delta", "gamma gamma epsilon"]
    idx = Bm25DeviceIndex.build_python(corpus)
    nv = NativeVocab(idx.vocab)
    assert nv.available
    queries = ["beta gamma unknownword", "", "epsilon alpha alpha"]
    got = nv.lookup_batch(queries, max_terms=6)
    for q, row in zip(queries, got):
        want = [idx.vocab[t] for t in tokenize(q) if t in idx.vocab][:6]
        want = want + [-1] * (6 - len(want))
        assert row.tolist() == want, (q, row.tolist(), want)


def test_native_unicode_lowercase_parity():
    """Non-ASCII chars that lower() into ASCII (Kelvin sign, dotted I) must
    tokenize identically on the native and Python paths (ADVICE r1)."""
    from a_modular_rag_framework_tpu.native.binding import (
        bm25_build_native,
        token_counts_native,
    )

    texts = ["the K elvin sign", "İstanbul style", "plain ascii text"]
    counts = token_counts_native(texts)
    if counts is None:
        import pytest

        pytest.skip("native lib unavailable")
    want = [len(tokenize(t)) for t in texts]
    assert counts.tolist() == want

    got = bm25_build_native(texts)
    ref = Bm25DeviceIndex.build_python(texts)
    assert set(got["vocab"]) == set(ref.vocab)
