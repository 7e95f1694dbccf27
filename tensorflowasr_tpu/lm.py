"""N-gram language models for shallow-fusion beam search.

TPU-native replacement for the reference's external ``ctc_decoders`` KenLM
scorer (``scripts/install_ctc_decoders.sh``, ``tokenizers.py:147-149``
``add_scorer`` hook): token-level n-gram LMs stored as dense log-prob tables
so scoring is a pure gather — jit/beam-search compatible with no host
callbacks.

Supports building from a text corpus (interpolated maximum-likelihood with
add-k smoothing) or loading token-level ARPA files. Orders 1-3; dense tables
bound practical vocab (order 3 → V³ entries, fine for characters; use order
≤ 2 for 1k-subword vocabs).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LOG10 = math.log(10.0)


class NGramLM:
    """Dense-table n-gram LM over token ids.

    ``tables[k]`` has shape ``[V]*(k+1)``: log p(token | k previous tokens),
    already interpolated across orders, so scoring only reads the highest
    table.
    """

    def __init__(self, table: np.ndarray, order: int, bos_id: int = 0):
        self.order = order
        self.table = jnp.asarray(table, jnp.float32)  # [V]*order
        self.vocab_size = table.shape[-1]
        self.bos_id = bos_id

    # ------------------------------ building -------------------------------- #

    @classmethod
    def from_token_corpus(cls, sequences: Sequence[Sequence[int]], vocab_size: int, order: int = 2, add_k: float = 0.5, interpolation: float = 0.3):
        """Count-based LM: interpolate order-n estimate with the (n-1) one."""
        assert 1 <= order <= 3
        # unigram
        uni = np.full((vocab_size,), add_k, np.float64)
        for seq in sequences:
            for t in seq:
                uni[t] += 1
        p_uni = uni / uni.sum()
        if order == 1:
            return cls(np.log(p_uni).astype(np.float32), 1)

        bi = np.full((vocab_size, vocab_size), add_k, np.float64)
        for seq in sequences:
            prev = None
            for t in seq:
                if prev is not None:
                    bi[prev, t] += 1
                prev = t
        p_bi = bi / bi.sum(axis=-1, keepdims=True)
        p_bi = (1 - interpolation) * p_bi + interpolation * p_uni[None, :]
        if order == 2:
            return cls(np.log(p_bi).astype(np.float32), 2)

        tri = np.full((vocab_size, vocab_size, vocab_size), add_k, np.float64)
        for seq in sequences:
            for i in range(2, len(seq)):
                tri[seq[i - 2], seq[i - 1], seq[i]] += 1
        p_tri = tri / tri.sum(axis=-1, keepdims=True)
        p_tri = (1 - interpolation) * p_tri + interpolation * p_bi[None, :, :]
        return cls(np.log(p_tri).astype(np.float32), 3)

    @classmethod
    def from_text_corpus(cls, texts: Sequence[str], tokenizer, order: int = 2, **kwargs):
        seqs = [tokenizer.tokenize(t).tolist() for t in texts]
        return cls.from_token_corpus(seqs, tokenizer.num_classes, order=order, **kwargs)

    @classmethod
    def from_arpa(cls, path: str, token_to_id: dict, order: Optional[int] = None, unk_log10: float = -99.0):
        """Load a token-level ARPA file (log10 probs; backoffs folded in as
        a dense table query of the highest order with recursive backoff)."""
        grams: dict[int, dict[tuple, tuple]] = {}
        cur = None
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line.startswith("\\") and "-grams:" in line:
                    cur = int(line[1 : line.index("-")])
                    grams[cur] = {}
                    continue
                if not line or line.startswith("\\") or "=" in line and cur is None:
                    continue
                if cur is None:
                    continue
                parts = line.split("\t")
                if len(parts) < 2:
                    continue
                logp = float(parts[0])
                toks = tuple(parts[1].split())
                backoff = float(parts[2]) if len(parts) > 2 else 0.0
                grams[cur][toks] = (logp, backoff)
        max_order = order or max(grams)
        v = len(token_to_id)

        def lookup(ctx_toks: tuple, tok: str) -> float:
            key = (*ctx_toks, tok)
            if key in grams.get(len(key), {}):
                return grams[len(key)][key][0]
            if not ctx_toks:
                return grams.get(1, {}).get((tok,), (unk_log10, 0.0))[0]
            bo = grams.get(len(ctx_toks), {}).get(ctx_toks, (0.0, 0.0))[1]
            return bo + lookup(ctx_toks[1:], tok)

        ids = sorted(token_to_id.items(), key=lambda kv: kv[1])
        names = [t for t, _ in ids]
        if max_order == 1:
            table = np.asarray([lookup((), t) for t in names], np.float64) * LOG10
            return cls(table.astype(np.float32), 1)
        if max_order == 2:
            table = np.asarray([[lookup((a,), b) for b in names] for a in names], np.float64) * LOG10
            return cls(table.astype(np.float32), 2)
        table = np.asarray(
            [[[lookup((a, b), c) for c in names] for b in names] for a in names], np.float64
        ) * LOG10
        return cls(table.astype(np.float32), 3)

    # ------------------------------- scoring -------------------------------- #

    def score(self, context: jax.Array, candidates: jax.Array) -> jax.Array:
        """log p(candidates | context).

        context: [..., order-1] previous token ids (use bos_id padding)
        candidates: [..., K] next-token ids
        returns [..., K]
        """
        candidates = jnp.asarray(candidates, jnp.int32)
        if self.order == 1:
            return self.table[candidates]
        if self.order == 2:
            prev = jnp.asarray(context[..., -1], jnp.int32)
            return self.table[prev[..., None], candidates]
        p2 = jnp.asarray(context[..., -2], jnp.int32)
        p1 = jnp.asarray(context[..., -1], jnp.int32)
        return self.table[p2[..., None], p1[..., None], candidates]

    def beam_score_fn(self):
        """Adapter for ``ctc_beam_search_decode(lm_score_fn=...)``:
        (tokens [B,W,T], lengths [B,W], cand_ids [B,K]) → [B,W,K]."""

        def fn(tokens, lengths, cand_ids):
            b, w, t = tokens.shape
            # last and second-to-last emitted tokens (bos when empty)
            idx_last = jnp.clip(lengths - 1, 0, t - 1)
            last = jnp.take_along_axis(tokens, idx_last[..., None], axis=2)[..., 0]
            last = jnp.where(lengths > 0, last, self.bos_id)
            idx_prev = jnp.clip(lengths - 2, 0, t - 1)
            prev = jnp.take_along_axis(tokens, idx_prev[..., None], axis=2)[..., 0]
            prev = jnp.where(lengths > 1, prev, self.bos_id)
            context = jnp.stack([prev, last], axis=-1)  # [B, W, 2]
            cands = jnp.broadcast_to(cand_ids[:, None, :], (b, w, cand_ids.shape[-1]))
            return self.score(context, cands)

        return fn

    def sequence_logprob(self, tokens: Sequence[int]) -> float:
        """Host-side helper: total log p of a token sequence."""
        ctx = [self.bos_id] * max(self.order - 1, 0)
        total = 0.0
        for t in tokens:
            c = jnp.asarray(ctx[-(self.order - 1):] if self.order > 1 else [], jnp.int32)
            total += float(self.score(c, jnp.asarray([t]))[0])
            ctx.append(int(t))
        return total
