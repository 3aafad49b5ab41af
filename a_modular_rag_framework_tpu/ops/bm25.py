"""BM25 scoring as a device program over CSR postings.

Replaces the reference's python dict-postings scorer
(text_index.py:55-97) with exact-math parity:

  idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
  s(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
  score(q) = sum over q-term OCCURRENCES (duplicate query terms count twice,
             as in the reference's _score_doc loop over q_terms)
  multi-query merge: elementwise max or sum over per-query dense scores.

Layout: postings live in flat CSR arrays (`doc_ids [P]`, `tfs [P]`,
`row_ptr [V+1]`) resident in HBM. For each padded query term we
`dynamic_slice` a fixed-capacity window of its posting list, compute the
BM25 contribution vectorized, and scatter-add into a dense [N+1] score
vector (slot N swallows padding). Everything is static-shaped; the whole
multi-term, multi-query scorer jits into one program.

Capacity note: terms with df > max_postings_per_term are truncated to their
first `cap` postings. Such terms are near-stopwords whose idf ~ 0, so the
effect on top-k pools is negligible; raise `index.max_postings_per_term`
for exact parity on small corpora.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hash_embed import tokenize


@dataclass
class Bm25DeviceIndex:
    """CSR postings + stats, as device-ready arrays.

    Attributes
    ----------
    doc_ids : int32 [P] flat posting doc indices
    tfs     : float32 [P] term frequencies
    row_ptr : int32 [V+1] CSR row pointers per term id
    df      : float32 [V] document frequency per term
    doc_lens: float32 [N] token count per doc
    vocab   : term -> term id
    k1, b   : BM25 parameters
    """

    doc_ids: np.ndarray
    tfs: np.ndarray
    row_ptr: np.ndarray
    df: np.ndarray
    doc_lens: np.ndarray
    vocab: Dict[str, int]
    k1: float = 1.5
    b: float = 0.75
    # Precomputed per-posting BM25 contribution c(t, d) — query-independent,
    # so it's baked at build time and query scoring is a pure gather+sum.
    # Postings within each term are sorted by contribution DESCENDING, so a
    # fixed-capacity window keeps each term's best-scoring docs.
    scores: Optional[np.ndarray] = None

    @property
    def n_docs(self) -> int:
        return int(self.doc_lens.shape[0])

    @property
    def avgdl(self) -> float:
        return float(self.doc_lens.mean()) if self.n_docs else 0.0

    # ---- construction ----

    @classmethod
    def build(cls, texts: Sequence[str], k1: float = 1.5, b: float = 0.75,
              use_native: bool = True) -> "Bm25DeviceIndex":
        """Build from texts — native C++ streaming builder when available
        (bit-exact with the Python path, which remains the test oracle)."""
        if use_native:
            try:
                from ..native import bm25_build_native

                out = bm25_build_native(list(texts), k1=k1, b=b)
                if out is not None:
                    return cls(doc_ids=out["doc_ids"], tfs=out["tfs"],
                               row_ptr=out["row_ptr"], df=out["df"],
                               doc_lens=out["doc_lens"], vocab=out["vocab"],
                               k1=k1, b=b, scores=out["scores"])
            except ImportError:
                pass
        return cls.build_python(texts, k1=k1, b=b)

    @classmethod
    def build_python(cls, texts: Sequence[str], k1: float = 1.5, b: float = 0.75) -> "Bm25DeviceIndex":
        vocab: Dict[str, int] = {}
        postings: List[Dict[int, int]] = []  # term id -> {doc: tf}
        doc_lens = np.zeros(len(texts), dtype=np.float32)
        for di, text in enumerate(texts):
            toks = tokenize(text)
            doc_lens[di] = len(toks)
            for t in toks:
                tid = vocab.setdefault(t, len(vocab))
                if tid == len(postings):
                    postings.append({})
                postings[tid][di] = postings[tid].get(di, 0) + 1
        V = len(vocab)
        df = np.array([len(p) for p in postings], dtype=np.float32)
        row_ptr = np.zeros(V + 1, dtype=np.int32)
        np.cumsum([len(p) for p in postings], out=row_ptr[1:])
        P = int(row_ptr[-1])
        doc_ids = np.zeros(P, dtype=np.int32)
        tfs = np.zeros(P, dtype=np.float32)
        n_total = float(len(texts))
        avgdl = float(doc_lens.mean()) if len(texts) else 1.0
        avgdl = avgdl or 1.0
        scores = np.zeros(P, dtype=np.float32)
        for tid, p in enumerate(postings):
            s = row_ptr[tid]
            idf = np.log((n_total - df[tid] + 0.5) / (df[tid] + 0.5) + 1.0)
            items = []
            for di, tf in p.items():
                dl = doc_lens[di]
                denom = tf + k1 * (1.0 - b + b * dl / avgdl)
                c = idf * tf * (k1 + 1.0) / (denom or 1.0)
                items.append((c, di, tf))
            # contribution-descending, doc-ascending tiebreak
            items.sort(key=lambda x: (-x[0], x[1]))
            for j, (c, di, tf) in enumerate(items):
                doc_ids[s + j] = di
                tfs[s + j] = tf
                scores[s + j] = c
        return cls(doc_ids=doc_ids, tfs=tfs, row_ptr=row_ptr, df=df,
                   doc_lens=doc_lens, vocab=vocab, k1=k1, b=b, scores=scores)

    # ---- query encoding (host) ----

    def encode_query_terms(self, queries: Sequence[str], max_terms: int) -> np.ndarray:
        """[Q, T] int32 term ids per query occurrence, -1 padded.

        Keeps duplicate occurrences (reference scores each occurrence)."""
        out = np.full((len(queries), max_terms), -1, dtype=np.int32)
        for qi, q in enumerate(queries):
            tids = [self.vocab[t] for t in tokenize(q) if t in self.vocab]
            tids = tids[:max_terms]
            out[qi, : len(tids)] = tids
        return out

    def ensure_scores(self) -> np.ndarray:
        """(Re)compute precomputed contributions for indexes loaded without
        them; postings order is preserved (whatever order they were saved)."""
        if self.scores is not None:
            return self.scores
        n_total = float(self.n_docs)
        avgdl = self.avgdl or 1.0
        idf = np.log((n_total - self.df + 0.5) / (self.df + 0.5) + 1.0)
        term_of_posting = np.repeat(
            np.arange(len(self.df), dtype=np.int64),
            np.diff(self.row_ptr).astype(np.int64),
        )
        tf = np.asarray(self.tfs, dtype=np.float32)
        dl = np.asarray(self.doc_lens)[np.asarray(self.doc_ids)]
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / avgdl)
        self.scores = (idf[term_of_posting] * tf * (self.k1 + 1.0) /
                       np.where(denom > 0, denom, 1.0)).astype(np.float32)
        return self.scores

    def device_arrays(self) -> Dict[str, jnp.ndarray]:
        return {
            "doc_ids": jnp.asarray(self.doc_ids),
            "tfs": jnp.asarray(self.tfs),
            "row_ptr": jnp.asarray(self.row_ptr),
            "df": jnp.asarray(self.df),
            "doc_lens": jnp.asarray(self.doc_lens),
            "scores": jnp.asarray(self.ensure_scores()),
        }


@functools.partial(jax.jit, static_argnames=("n_docs", "cap", "merge"))
def bm25_scores_batched(
    term_ids: jax.Array,  # [B, E, T] int32, -1 padded (E query variants)
    doc_ids: jax.Array,  # [P] int32
    contribs: jax.Array,  # [P] f32 precomputed c(t, d)
    row_ptr: jax.Array,  # [V+1] int32
    *,
    n_docs: int,
    cap: int,
    merge: str = "max",
) -> jax.Array:
    """Batched BM25: gather each term's top-``cap`` precomputed contributions
    and land the whole batch with ONE scatter-add into [B*E, N+1].

    This is the engine's production path: ~30x faster than per-term scatters
    because XLA sees one large scatter instead of B*E*T small ones, and the
    per-posting arithmetic happened at index build. Postings are stored
    contribution-descending, so the cap window keeps each term's strongest
    docs (truncation only sheds near-zero stopword tails).

    Returns merged [B, N] (max/sum over the E variants).
    """
    B, E, T = term_ids.shape
    N = n_docs
    P = doc_ids.shape[0]
    doc_ids_p = jnp.concatenate([doc_ids, jnp.full((cap,), N, dtype=jnp.int32)])
    contribs_p = jnp.concatenate([contribs, jnp.zeros((cap,), dtype=jnp.float32)])

    flat_t = term_ids.reshape(-1)  # [B*E*T]
    valid = flat_t >= 0
    t_safe = jnp.maximum(flat_t, 0)
    starts = row_ptr[t_safe]
    lengths = jnp.minimum(row_ptr[t_safe + 1] - starts, cap)

    def window(start):
        return (
            jax.lax.dynamic_slice(doc_ids_p, (start,), (cap,)),
            jax.lax.dynamic_slice(contribs_p, (start,), (cap,)),
        )

    docs_w, c_w = jax.vmap(window)(starts)  # [BET, cap]
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    in_range = (j < lengths[:, None]) & valid[:, None]
    docs_w = jnp.where(in_range, docs_w, N)
    c_w = jnp.where(in_range, c_w, 0.0)

    variant = (
        jnp.arange(B * E * T, dtype=jnp.int32)[:, None] // T
    )  # [BET, 1] -> broadcast over cap
    variant = jnp.broadcast_to(variant, (B * E * T, cap))

    acc = (
        jnp.zeros((B * E, N + 1), dtype=jnp.float32)
        .at[variant.reshape(-1), docs_w.reshape(-1)]
        .add(c_w.reshape(-1))
    )
    per_variant = acc[:, :N].reshape(B, E, N)
    if merge == "sum":
        return jnp.sum(per_variant, axis=1)
    return jnp.max(per_variant, axis=1)


@functools.partial(jax.jit, static_argnames=("n_docs", "cap", "merge", "k1", "b"))
def bm25_scores(
    term_ids: jax.Array,  # [Q, T] int32, -1 padded
    doc_ids: jax.Array,  # [P] int32
    tfs: jax.Array,  # [P] f32
    row_ptr: jax.Array,  # [V+1] int32
    df: jax.Array,  # [V] f32
    doc_lens: jax.Array,  # [N] f32
    *,
    n_docs: int,
    cap: int = 4096,
    merge: str = "max",
    k1: float = 1.5,
    b: float = 0.75,
) -> jax.Array:
    """Dense BM25 scores [Q or 1, N] f32 (merged over queries if requested).

    Returns merged [N] when ``merge`` in ("max", "sum"), else per-query [Q, N].
    """
    N = n_docs
    n_total = jnp.float32(N)
    avgdl = jnp.mean(doc_lens)
    avgdl = jnp.where(avgdl > 0, avgdl, 1.0)
    # Pad postings arrays so a cap-window slice never reads OOB.
    P = doc_ids.shape[0]
    doc_ids_p = jnp.concatenate([doc_ids, jnp.full((cap,), N, dtype=jnp.int32)])
    tfs_p = jnp.concatenate([tfs, jnp.zeros((cap,), dtype=jnp.float32)])

    def score_one_term(tid: jax.Array) -> jax.Array:
        """Dense [N+1] contribution of one query-term occurrence."""
        valid_term = tid >= 0
        t = jnp.maximum(tid, 0)
        start = row_ptr[t]
        length = row_ptr[t + 1] - start
        length = jnp.minimum(length, cap)
        docs = jax.lax.dynamic_slice(doc_ids_p, (start,), (cap,))
        f = jax.lax.dynamic_slice(tfs_p, (start,), (cap,))
        j = jnp.arange(cap, dtype=jnp.int32)
        in_range = (j < length) & valid_term
        docs = jnp.where(in_range, docs, N)  # dump slot
        dl = doc_lens[jnp.minimum(docs, N - 1)]
        n_t = df[t]
        idf = jnp.log((n_total - n_t + 0.5) / (n_t + 0.5) + 1.0)
        denom = f + k1 * (1.0 - b + b * dl / avgdl)
        contrib = idf * f * (k1 + 1.0) / jnp.where(denom > 0, denom, 1.0)
        contrib = jnp.where(in_range, contrib, 0.0)
        dense = jnp.zeros((N + 1,), dtype=jnp.float32).at[docs].add(contrib)
        return dense

    def score_one_query(tids: jax.Array) -> jax.Array:
        per_term = jax.lax.map(score_one_term, tids)  # [T, N+1]
        return jnp.sum(per_term, axis=0)[:N]

    per_query = jax.vmap(score_one_query)(term_ids)  # [Q, N]
    if merge == "max":
        return jnp.max(per_query, axis=0)
    if merge == "sum":
        return jnp.sum(per_query, axis=0)
    return per_query
