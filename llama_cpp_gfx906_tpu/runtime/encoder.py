"""Encoder-model engine: embeddings + cross-encoder rerank.

The serving wrapper around models/bert.py for the reference's embedding
and rerank flows (``tools/server/server.cpp:4700`` embeddings, ``:4810``
rerank over a rank-head cross-encoder; ``examples/embedding``).  Inputs
are padded to the shared bucket grid so each length class compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModelReader
from ..models.bert import forward, load_params, pool, rank_score
from ..models.config import ModelConfig, config_from_gguf
from ..tokenizers import tokenizer_from_gguf
from .engine import bucket_len


class EncoderEngine:
    def __init__(self, cfg: ModelConfig, params: dict, tokenizer, pooling: str = "mean"):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.pooling = pooling
        self._fwd = jax.jit(forward, static_argnames=("cfg",))
        self._pool = jax.jit(pool, static_argnames=("mode",))
        self._rank = jax.jit(rank_score)

    @classmethod
    def from_gguf(cls, path: str, dtype=jnp.float32, pooling: str | None = None) -> "EncoderEngine":
        from ..gguf.constants import Keys

        reader = GGUFModelReader(path)
        cfg = config_from_gguf(reader)
        tok = tokenizer_from_gguf(reader.readers[0])
        params = load_params(reader, cfg, dtype)
        if pooling is None:
            # {arch}.pooling_type: 0 none, 1 mean, 2 cls, 3 last (llama.h)
            pt = reader.get(Keys.LLM.POOLING_TYPE, arch=cfg.arch)
            pooling = {0: "mean", 1: "mean", 2: "cls", 3: "last"}.get(
                int(pt) if pt is not None else 1, "mean"
            )
        return cls(cfg, params, tok, pooling)

    @property
    def has_rank_head(self) -> bool:
        return "cls_out_w" in self.params or "cls_w" in self.params

    def _batch(self, id_lists: list[list[int]]) -> tuple[jnp.ndarray, jnp.ndarray]:
        n_max = max(len(ids) for ids in id_lists)
        padded = bucket_len(n_max)
        toks = np.zeros((len(id_lists), padded), np.int32)
        for i, ids in enumerate(id_lists):
            toks[i, : len(ids)] = ids
        lens = np.asarray([len(ids) for ids in id_lists], np.int32)
        return jnp.asarray(toks), jnp.asarray(lens)

    def embed(self, texts: list[str], normalize: bool = True) -> np.ndarray:
        """(N, D) pooled sentence embeddings."""
        ids = [
            self.tokenizer.tokenize(t, add_special=True, parse_special=True)
            for t in texts
        ]
        toks, lens = self._batch(ids)
        hidden = self._fwd(self.params, self.cfg, toks, lens)
        vecs = np.asarray(self._pool(hidden, lens, mode=self.pooling))
        if normalize:
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=-1, keepdims=True), 1e-12
            )
        return vecs

    def rerank(self, query: str, documents: list[str]) -> list[float]:
        """Cross-encoder relevance scores, one per document.

        Builds the rank-model input ``[CLS] query [SEP] doc [SEP]``
        (reference: format_rerank in server utils) and reads the rank head;
        falls back to embedding cosine when the model has no head."""
        if not self.has_rank_head:
            qv = self.embed([query])[0]
            dv = self.embed(documents)
            return [float(qv @ d) for d in dv]
        sp = self.tokenizer.vocab.special
        bos = [sp.bos] if sp.bos is not None else []  # [CLS]
        sep_id = sp.sep if sp.sep is not None else sp.eos
        sep = [sep_id] if sep_id is not None else []
        q_ids = self.tokenizer.tokenize(query, add_special=False, parse_special=True)
        pairs = []
        for d in documents:
            d_ids = self.tokenizer.tokenize(d, add_special=False, parse_special=True)
            pairs.append(bos + q_ids + sep + d_ids + sep)
        toks, lens = self._batch(pairs)
        hidden = self._fwd(self.params, self.cfg, toks, lens)
        return [float(s) for s in np.asarray(self._rank(self.params, hidden, lens))]
