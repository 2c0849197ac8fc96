"""Control-vector extraction (reference: tools/cvector-generator, 871 LoC):
run positive/negative prompt pairs, take per-layer hidden-state
differences, PCA the difference matrix, and write ``direction.<n>``
tensors to a GGUF consumable by --control-vector / Engine.apply_control_vector_file.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter


def collect_hidden_diffs(engine, positives: list[str], negatives: list[str]) -> np.ndarray:
    """(L, n_pairs, D) last-token hidden-state differences per layer."""
    import jax.numpy as jnp

    from ..models.llama import KVCache
    from ..ops.norms import rms_norm
    from ..ops.rope import apply_rope, rope_frequencies
    from ..models.llama import _act, _norm

    cfg = engine.cfg
    params = engine.params
    layers = params["layers"]
    if hasattr(layers.get("wq"), "q"):
        raise ValueError("cvector extraction needs float weights (keep_quantized=False)")
    inv_freq = jnp.asarray(rope_frequencies(cfg))
    from ..ops.attention import mha_with_cache

    def per_layer_hidden(text: str) -> np.ndarray:
        ids = engine.tokenizer.tokenize(text, add_special=True, parse_special=True)
        T = len(ids)
        kv = KVCache.create(cfg, 1, T, jnp.float32)
        tokens = jnp.asarray([ids], jnp.int32)
        positions = jnp.arange(T)[None, :]
        x = params["tok_emb"][tokens]
        if cfg.embedding_scale != 1.0:
            x = x * cfg.embedding_scale
        outs = []
        for il in range(cfg.n_layers):
            p = {k: v[il] for k, v in layers.items()}
            h = _norm(x, p["attn_norm"], p.get("attn_norm_b"), cfg)
            B = 1
            q = (h @ p["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
            k = (h @ p["wk"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = (h @ p["wv"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            if cfg.pos_emb == "rope":
                q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
                k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            attn, _, _ = mha_with_cache(
                q, k, v, kv.k[il], kv.v[il], kv.n_past,
                cfg.attn_scale or cfg.head_dim**-0.5,
            )
            x = x + attn.reshape(B, T, -1) @ p["wo"]
            hn = _norm(x, p["ffn_norm"], p.get("ffn_norm_b"), cfg)
            x = x + (_act(hn @ p["w_gate"], cfg.act_fn) * (hn @ p["w_up"])) @ p["w_down"]
            outs.append(np.asarray(x[0, -1], np.float32))  # last-token hidden
        return np.stack(outs)  # (L, D)

    diffs = []
    for pos, neg in zip(positives, negatives):
        diffs.append(per_layer_hidden(pos) - per_layer_hidden(neg))
    return np.stack(diffs, axis=1)  # (L, n_pairs, D)


def pca_directions(diffs: np.ndarray) -> np.ndarray:
    """Leading principal component per layer, sign-aligned with the mean
    difference (the reference's PCA mode)."""
    L, n, D = diffs.shape
    dirs = np.zeros((L, D), np.float32)
    for il in range(L):
        X = diffs[il] - diffs[il].mean(axis=0, keepdims=True)
        if n == 1:
            v = diffs[il][0]
        else:
            _, _, vt = np.linalg.svd(X, full_matrices=False)
            v = vt[0]
        if np.dot(v, diffs[il].mean(axis=0)) < 0:
            v = -v
        nrm = np.linalg.norm(v)
        dirs[il] = v / nrm if nrm > 0 else v
    return dirs


def write_control_vector(path: str, dirs: np.ndarray, model_hint: str = "") -> str:
    w = GGUFWriter(path, "controlvector")
    w.add_string("general.name", model_hint or "cvector")
    w.add_uint32("controlvector.layer_count", dirs.shape[0])
    for il in range(dirs.shape[0]):
        w.add_tensor(f"direction.{il + 1}", dirs[il], GGMLType.F32)  # 1-based
    return w.write()


def mean_directions(diffs: np.ndarray) -> np.ndarray:
    """--method mean: normalized mean difference per layer (the
    reference's non-PCA mode)."""
    m = diffs.mean(axis=1)
    nrm = np.linalg.norm(m, axis=-1, keepdims=True)
    return (m / np.where(nrm > 0, nrm, 1.0)).astype(np.float32)


def main(argv=None) -> int:
    from ..common.args import build_parser, maybe_print_completion

    ap = build_parser("cvector",
                      description="control vector extraction (PCA / mean)")
    ap.prog = "llama-cvector-generator (TPU)"
    args = ap.parse_args(argv)
    if maybe_print_completion(args, "cvector", "llama-cvector-generator"):
        return 0
    if not args.positive_file or not args.negative_file:
        raise SystemExit("--positive-file and --negative-file are required")

    import jax.numpy as jnp

    from ..runtime.engine import Engine

    eng = Engine.from_gguf(args.model, keep_quantized=False, dtype=jnp.float32)
    pos = [l.strip() for l in open(args.positive_file, encoding="utf-8") if l.strip()]
    neg = [l.strip() for l in open(args.negative_file, encoding="utf-8") if l.strip()]
    n = min(len(pos), len(neg))
    diffs = collect_hidden_diffs(eng, pos[:n], neg[:n])
    if args.cvector_method == "mean":
        dirs = mean_directions(diffs)
    else:
        dirs = pca_directions(diffs)
    out = write_control_vector(args.output or "control_vector.gguf", dirs)
    print(f"wrote {dirs.shape[0]} directions -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
