"""Re-embed a packed bench cache with a learned encoder (sidecar output).

  python tools/reembed_index.py --cache data/bench_cache_1m \
      --encoder data/encoder_collide.npz

Writes embeddings_learned.npy + learned_embed.json next to the cache
(index/reembed.py); bench.py and engines attach them via
`attach_learned_embeddings`. The encoder checkpoint is stored repo-relative
so fresh checkouts resolve it after tools/restore_artifacts.py.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--encoder", default="data/encoder_collide.npz")
    ap.add_argument("--d_model", type=int, default=128)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--n_heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--max_len", type=int, default=32)
    ap.add_argument("--subword_ngrams", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    from a_modular_rag_framework_tpu.index.packed import PackedIndex
    from a_modular_rag_framework_tpu.index.reembed import (
        embed_corpus_pipelined,
        save_learned_embeddings,
    )
    from a_modular_rag_framework_tpu.models.encoder import (
        EncoderConfig,
        TextEncoder,
    )

    cfg = EncoderConfig(vocab_size=args.vocab, max_len=args.max_len,
                        d_model=args.d_model, n_heads=args.n_heads,
                        n_layers=args.n_layers,
                        subword_ngrams=args.subword_ngrams)
    enc = TextEncoder.load(args.encoder, cfg)
    idx = PackedIndex.load(args.cache)
    t0 = time.time()
    emb = embed_corpus_pipelined(enc, idx.corpus.texts(), batch=args.batch)
    dt = time.time() - t0
    ckpt_rel = str(Path(args.encoder).resolve().relative_to(REPO)) \
        if str(Path(args.encoder).resolve()).startswith(str(REPO)) \
        else args.encoder
    doc = save_learned_embeddings(
        args.cache, emb, ckpt_rel, cfg,
        extra={"embed_sec": round(dt, 1),
               "rows_per_sec": round(emb.shape[0] / dt, 1)})
    print(json.dumps({"cache": args.cache, "rows": doc["rows"],
                      "dim": doc["dim"], "embed_sec": doc["embed_sec"],
                      "rows_per_sec": doc["rows_per_sec"]}))


if __name__ == "__main__":
    main()
