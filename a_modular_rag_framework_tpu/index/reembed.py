"""Learned-embedding sidecars for packed indexes (VERDICT r4 item 1).

The scale bench caches (100k/1M/5.17M rows) were built with the hash
encoder, whose dense channel contributes nothing on colliding corpora
(dense-only recall@10 = 0.0 at 5M, BENCH_r03). Re-embedding with the
collide-trained subword `TextEncoder` (tools/dense_lab.py) makes the dense
channel real — but rebuilding the whole cache would discard the BM25/graph
artifacts and the deterministic restore story. So learned embeddings ride a
SIDECAR next to the cache:

  embeddings_learned.npy   [N, d] uint16 bf16 bit patterns
  learned_embed.json       encoder config + checkpoint path + checksums

`attach_learned_embeddings` swaps a loaded `PackedIndex`'s embedding matrix
for the sidecar (in place) and returns the query-side encoder, so engines
built from the index score dense against the learned space.
"""
from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def embed_corpus_pipelined(encoder, texts: List[str],
                           batch: int = 4096) -> np.ndarray:
    """Pipelined corpus embed: host featurize of batch i+1 overlaps the
    device's encode of batch i (the index builder's discipline); every
    batch pads to one program shape."""
    import jax.numpy as jnp

    out: List[np.ndarray] = []
    pending, pend_rows = None, 0
    for i in range(0, len(texts), batch):
        b = texts[i:i + batch]
        rows = len(b)
        if rows < batch:
            b = b + [""] * (batch - rows)
        ids, mask = encoder.host_featurize(b)
        fut = encoder.device_embed(jnp.asarray(ids), jnp.asarray(mask))
        if pending is not None:
            out.append(np.asarray(pending)[:pend_rows])
        pending, pend_rows = fut, rows
    if pending is not None:
        out.append(np.asarray(pending)[:pend_rows])
    if not out:
        return np.zeros((0, encoder.dim), dtype=np.float32)
    return np.concatenate(out).astype(np.float32)


def _bf16_bits(emb: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(emb, dtype=np.float32).view(np.uint32)
    return ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)


def save_learned_embeddings(cache_dir: str | Path, emb: np.ndarray,
                            encoder_ckpt: str, encoder_cfg: Any,
                            *, extra: Optional[Dict[str, Any]] = None
                            ) -> Dict[str, Any]:
    """Write the sidecar pair into ``cache_dir``. Embeddings store as bf16
    bit patterns (the packed-index convention — halves disk + HBM)."""
    cache_dir = Path(cache_dir)
    np.save(cache_dir / "embeddings_learned.npy", _bf16_bits(emb))
    ck = Path(encoder_ckpt)
    doc = {
        "encoder_checkpoint": str(ck),
        "encoder_sha256": hashlib.sha256(ck.read_bytes()).hexdigest()
        if ck.exists() else None,
        "encoder_config": {
            "vocab_size": encoder_cfg.vocab_size,
            "max_len": encoder_cfg.max_len,
            "d_model": encoder_cfg.d_model,
            "n_heads": encoder_cfg.n_heads,
            "n_layers": encoder_cfg.n_layers,
            "d_ff": encoder_cfg.d_ff,
            "subword_ngrams": encoder_cfg.subword_ngrams,
            "ngram_min": encoder_cfg.ngram_min,
            "ngram_max": encoder_cfg.ngram_max,
        },
        "rows": int(emb.shape[0]),
        "dim": int(emb.shape[1]),
        "embed_dtype": "bfloat16",
        "built_unix": time.time(),
        **(extra or {}),
    }
    (cache_dir / "learned_embed.json").write_text(json.dumps(doc, indent=1))
    return doc


def attach_learned_embeddings(idx, cache_dir: str | Path,
                              *, mmap: bool = True
                              ) -> Optional[Tuple[Any, Dict[str, Any]]]:
    """If ``cache_dir`` holds a learned-embedding sidecar matching the
    index's row count, swap it in (in place) and return
    ``(TextEncoder, sidecar_doc)``; else None. The encoder checkpoint must
    exist — queries have to embed in the same space as the corpus."""
    cache_dir = Path(cache_dir)
    man = cache_dir / "learned_embed.json"
    npy = cache_dir / "embeddings_learned.npy"
    if not (man.exists() and npy.exists()):
        return None
    doc = json.loads(man.read_text())
    arr = np.load(npy, mmap_mode="r" if mmap else None)
    if int(arr.shape[0]) != idx.n_docs:
        return None
    ck = doc.get("encoder_checkpoint") or ""
    ck_path = Path(ck)
    if not ck_path.is_absolute():
        ck_path = cache_dir.parent.parent / ck  # repo-relative
        if not ck_path.exists():
            ck_path = Path(ck)
    if not ck_path.exists():
        return None
    from ..models.encoder import EncoderConfig, TextEncoder

    cfg = EncoderConfig(**doc["encoder_config"])
    enc = TextEncoder.load(str(ck_path), cfg)
    idx.embeddings = arr
    idx.embed_dtype = doc.get("embed_dtype", "bfloat16")
    return enc, doc
