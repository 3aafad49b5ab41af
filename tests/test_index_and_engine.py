

def test_learned_embedding_sidecar_roundtrip(tmp_path):
    """save_learned_embeddings + attach_learned_embeddings swap the dense
    space in place and reconstruct the query encoder; row-count or missing
    checkpoint mismatches refuse to attach."""
    from a_modular_rag_framework_tpu.core.dataset_loader import (
        SyntheticHotpotQALoader,
    )
    from a_modular_rag_framework_tpu.index.builder import build_packed_index
    from a_modular_rag_framework_tpu.index.corpus import SentenceCorpus
    from a_modular_rag_framework_tpu.index.packed import PackedIndex
    from a_modular_rag_framework_tpu.index.reembed import (
        attach_learned_embeddings,
        embed_corpus_pipelined,
        save_learned_embeddings,
    )
    from a_modular_rag_framework_tpu.models.encoder import (
        EncoderConfig,
        TextEncoder,
    )

    samples = SyntheticHotpotQALoader({"count": 6, "seed": 1}).load()
    corpus = SentenceCorpus.from_hotpotqa(samples)
    cache = tmp_path / "cache"
    idx = build_packed_index(corpus, embed_dim=16, out_dir=str(cache))

    cfg = EncoderConfig(vocab_size=512, max_len=8, d_model=16, n_heads=2,
                        n_layers=1, d_ff=32, subword_ngrams=2)
    enc = TextEncoder(cfg, seed=5)
    ckpt = tmp_path / "enc.npz"
    enc.save(str(ckpt))
    emb = embed_corpus_pipelined(enc, corpus.texts(), batch=8)
    assert emb.shape == (len(corpus), 16)
    save_learned_embeddings(cache, emb, str(ckpt), cfg)

    idx2 = PackedIndex.load(cache)
    assert idx2.embed_dim == 16 and idx2.embed_dtype == "bfloat16"
    att = attach_learned_embeddings(idx2, cache)
    assert att is not None
    enc2, doc = att
    assert doc["rows"] == len(corpus)
    # swapped in place: bf16 bit patterns of the learned matrix
    got = idx2.device_embeddings()
    import numpy as np
    ref = np.asarray(enc.encode_texts(corpus.texts()[:4]), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(got[:4], dtype=np.float32), ref,
                               atol=0.01)
    # query encoder reproduces the same space
    q = enc2.encode_texts(["hello world"])
    np.testing.assert_allclose(q, enc.encode_texts(["hello world"]),
                               atol=1e-6)
    # wrong row count -> refuse
    idx3 = PackedIndex.load(cache)
    idx3.corpus.docs.append({"title": "X", "sent_id": 0, "text": "x"})
    assert attach_learned_embeddings(idx3, cache) is None
