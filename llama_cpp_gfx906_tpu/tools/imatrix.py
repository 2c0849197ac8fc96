"""Importance-matrix collection (llama-imatrix equivalent).

Reference: tools/imatrix/imatrix.cpp — hooks every matmul input via the
scheduler eval callback (collect_imatrix :219) and accumulates per-channel
squared activations; saved as GGUF with ``<tensor>.in_sum2`` / ``.counts``
pairs (save_imatrix :507).

TPU design: instead of a per-node callback into a mutable collector, the
forward is re-run with the layer loop unrolled in Python (a tool-path
clone of models/llama.py's scan body) so each matmul input is a concrete
array; sums accumulate on host.  Offline tooling — throughput is fine.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter


def _layer_param(layers: dict, key: str, il: int):
    v = layers.get(key)
    if v is None:
        return None
    return v[il] if not hasattr(v, "q") else None  # quantized stacks unsupported here


def collect_imatrix(engine, chunks: list[list[int]]) -> dict[str, tuple[np.ndarray, int]]:
    """Run token chunks through the model, accumulating sum(x²) per input
    channel of every weight matmul.  Returns {gguf_name: (sum2, n_chunks)}.

    Requires a float-weight engine (keep_quantized=False)."""
    import jax.numpy as jnp

    from ..models.llama import KVCache, _act, _norm
    from ..ops.rope import apply_rope, rope_frequencies

    cfg = engine.cfg
    if engine.family.name != "llama":
        raise ValueError("imatrix collection currently supports attention archs")
    params = engine.params
    layers = params["layers"]
    if hasattr(layers.get("wq"), "q"):
        raise ValueError("imatrix needs float weights: load with keep_quantized=False")

    stats: dict[str, tuple[np.ndarray, int]] = {}

    def acc(name: str, x: np.ndarray):
        x2 = np.asarray(x, np.float32).reshape(-1, x.shape[-1])
        s = (x2 * x2).sum(axis=0)
        if name in stats:
            prev, n = stats[name]
            stats[name] = (prev + s, n + 1)
        else:
            stats[name] = (s, 1)

    inv_freq = jnp.asarray(rope_frequencies(cfg))

    for chunk in chunks:
        T = len(chunk)
        kv = KVCache.create(cfg, 1, T, jnp.float32)
        tokens = jnp.asarray([chunk], jnp.int32)
        positions = jnp.arange(T)[None, :]
        x = params["tok_emb"][tokens]
        if cfg.embedding_scale != 1.0:
            x = x * cfg.embedding_scale

        for il in range(cfg.n_layers):
            p = {k: v[il] for k, v in layers.items()}
            h = _norm(x, p["attn_norm"], p.get("attn_norm_b"), cfg)
            b = f"blk.{il}."
            acc(b + "attn_q.weight", h)
            acc(b + "attn_k.weight", h)
            acc(b + "attn_v.weight", h)
            q = h @ p["wq"]
            k = h @ p["wk"]
            v = h @ p["wv"]
            if "bq" in p:
                q, k, v = q + p["bq"], k + p["bk"], v + p["bv"]
            B, _, _ = x.shape
            q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
            k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            if cfg.qk_norm:
                from ..ops.norms import rms_norm

                q = rms_norm(q, p["q_norm"], cfg.rms_eps)
                k = rms_norm(k, p["k_norm"], cfg.rms_eps)
            if cfg.pos_emb == "rope":
                q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
                k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            from ..ops.attention import mha_with_cache

            attn, _, _ = mha_with_cache(
                q, k, v, kv.k[il], kv.v[il], kv.n_past,
                cfg.attn_scale or cfg.head_dim**-0.5,
                sliding_window=cfg.sliding_window if cfg.swa_layers[il] else 0,
                logit_softcap=cfg.attn_logit_softcap,
            )
            attn = attn.reshape(B, T, cfg.n_heads * cfg.head_dim)
            acc(b + "attn_output.weight", attn)
            attn = attn @ p["wo"]
            x = x + attn
            h = _norm(x, p["ffn_norm"], p.get("ffn_norm_b"), cfg)
            if "moe_gate_inp" in p:
                acc(b + "ffn_gate_inp.weight", h)
                # expert inputs: same h for every routed expert (dense proxy)
                acc(b + "ffn_gate_exps.weight", h)
                acc(b + "ffn_up_exps.weight", h)
                from ..ops.moe import moe_ffn

                mlp = moe_ffn(h, p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg)
            elif cfg.ffn_gated:
                acc(b + "ffn_gate.weight", h)
                acc(b + "ffn_up.weight", h)
                act = _act(h @ p["w_gate"], cfg.act_fn) * (h @ p["w_up"])
                acc(b + "ffn_down.weight", act)
                mlp = act @ p["w_down"]
            else:
                acc(b + "ffn_up.weight", h)
                act = _act(h @ p["w_up"] + p.get("b_up", 0), cfg.act_fn)
                acc(b + "ffn_down.weight", act)
                mlp = act @ p["w_down"] + p.get("b_down", 0)
            x = x + mlp
        # lm_head input
        xf = _norm(x, params["out_norm"], params.get("out_norm_b"), cfg)
        acc("output.weight", xf)
    return stats


def save_imatrix(path: str, stats: dict[str, tuple[np.ndarray, int]],
                 dataset: str = "", chunk_size: int = 512) -> str:
    """GGUF imatrix file (reference save_imatrix: general.type=imatrix,
    per-tensor <name>.in_sum2 + <name>.counts)."""
    w = GGUFWriter(path, "imatrix")
    w.add_string("general.type", "imatrix")
    w.add_array("imatrix.datasets", [dataset or "unknown"])
    w.add_uint32("imatrix.chunk_count", max(n for _, n in stats.values()))
    w.add_uint32("imatrix.chunk_size", chunk_size)
    for name in sorted(stats):
        sum2, n = stats[name]
        w.add_tensor(f"{name}.in_sum2", sum2.astype(np.float32), GGMLType.F32)
        w.add_tensor(f"{name}.counts", np.asarray([float(n)], np.float32), GGMLType.F32)
    return w.write()


def load_imatrix(path: str) -> dict[str, np.ndarray]:
    """Returns {tensor_name: mean squared activation per input channel}."""
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    sums: dict[str, np.ndarray] = {}
    counts: dict[str, float] = {}
    for name, t in r.tensors.items():
        if name.endswith(".in_sum2"):
            sums[name[: -len(".in_sum2")]] = t.to_f32().reshape(-1)
        elif name.endswith(".counts"):
            counts[name[: -len(".counts")]] = float(t.to_f32().reshape(-1)[0])
    return {
        k: v / max(counts.get(k, 1.0), 1.0) for k, v in sums.items()
    }


def _merge_stats(dst: dict, src: dict) -> None:
    for k, (s, n) in src.items():
        if k in dst:
            ps, pn = dst[k]
            dst[k] = (ps + s, pn + n)
        else:
            dst[k] = (s, n)


def main(argv=None) -> int:
    from ..common.args import build_parser, maybe_print_completion

    ap = build_parser("imatrix", description="importance-matrix collection",
                      require_model=False)
    ap.prog = "llama-imatrix (TPU)"
    ap.add_argument("--max-chunks", type=int, default=None,
                    help="alias of --chunks")
    args = ap.parse_args(argv)
    if maybe_print_completion(args, "imatrix", "llama-imatrix"):
        return 0
    output = args.output or "imatrix.gguf"

    if args.show_statistics:
        # reference --show-statistics: read an imatrix (--in-file) and print
        # per-tensor activation statistics, no collection
        src = (args.in_file or [None])[0] or output
        avg = load_imatrix(src)
        for name in sorted(avg):
            v = avg[name]
            print(f"{name:48s} mean={v.mean():.4g} min={v.min():.4g} "
                  f"max={v.max():.4g} n={v.size}")
        return 0

    if not args.model or not (args.file or args.in_file):
        raise SystemExit("imatrix collection needs -m and -f/--in-file")

    from ..runtime.engine import Engine

    eng = Engine.from_gguf(args.model, max_seq=args.chunk_size,
                           keep_quantized=False)
    text_parts = []
    for path in [args.file] + list(args.in_file or []):
        if path:
            with open(path, encoding="utf-8") as f:
                text_parts.append(f.read())
    ids = eng.tokenizer.tokenize("\n".join(text_parts), add_special=False,
                                 parse_special=args.parse_special)
    max_chunks = args.max_chunks or args.chunks or 64
    chunks = [
        ids[i : i + args.chunk_size]
        for i in range(0, len(ids) - args.chunk_size + 1, args.chunk_size)
    ][:max_chunks]
    if not chunks:
        raise SystemExit("not enough tokens for one chunk")

    # --output-frequency: save the in-progress matrix every N chunks
    # (reference imatrix.cpp m_params.n_out_freq); --save-frequency writes
    # numbered snapshots alongside
    stats: dict = {}
    step = max(args.output_frequency, 1)
    done = 0
    for i in range(0, len(chunks), step):
        batch = chunks[i : i + step]
        _merge_stats(stats, collect_imatrix(eng, batch))
        done += len(batch)
        if done < len(chunks):
            save_imatrix(output, stats, dataset=args.file or "",
                         chunk_size=args.chunk_size)
            if args.save_frequency and (done % args.save_frequency) == 0:
                save_imatrix(f"{output}.at_{done}", stats,
                             dataset=args.file or "",
                             chunk_size=args.chunk_size)
    if not args.process_output:
        stats.pop("output.weight", None)
    out = save_imatrix(output, stats, dataset=args.file or "",
                       chunk_size=args.chunk_size)
    print(f"saved imatrix for {len(stats)} tensors over {len(chunks)} "
          f"chunks -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
