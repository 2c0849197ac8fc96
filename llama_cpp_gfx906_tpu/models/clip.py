"""CLIP/SigLIP-style ViT vision encoder + LLaVA projector (mtmd path).

Reference: tools/mtmd/clip.cpp (vision graph; tensor names per
clip-impl.h:57-88, metadata keys clip.vision.*).  The TPU build runs the
whole encoder as one jitted function: patch embedding as an unfolded
matmul (MXU instead of a conv kernel), standard pre-LN ViT blocks, and
the llava MLP projector mapping vision features into the LM embedding
space.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm


@dataclass(frozen=True)
class ClipConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_layers: int
    n_heads: int
    n_ff: int
    proj_dim: int  # LM embedding size after the mm projector
    eps: float = 1e-5
    feature_layer: int = -2  # llava: hidden states from the n-2'th layer
    use_class_token: bool = True
    # projector family (clip.projector_type): "mlp" = llava 2-layer MLP;
    # "gemma3" = SigLIP tower + 4×4 average pooling + gemma RMS norm +
    # single input projection (clip.cpp PROJECTOR_TYPE_GEMMA3)
    projector: str = "mlp"
    act: str = "gelu_erf"  # "gelu_tanh" for SigLIP towers
    mm_tokens_per_side: int = 0  # gemma3: pooled grid side (16 → 256 tokens)
    # minicpmv: perceiver-resampler projector (clip.cpp build_minicpmv) —
    # learned queries cross-attend to kv-projected ViT features + 2D sincos
    minicpmv_query_num: int = 0
    pos_embd_bucket: int = 0  # navit-style bucketed ViT pos-embd grid (70)
    # pixtral tower (clip.cpp build_pixtral:555): RMS norms, gated-silu FFN,
    # no learned positions — 2D rope on q/k instead; optional mistral-small
    # patch merger and [IMG_BREAK] row separators
    norm: str = "layer"  # "rms" → weight-only RMS norms in the tower
    ffn_gated: bool = False
    rope_2d: bool = False
    rope_theta: float = 10000.0
    spatial_merge_size: int = 1
    # idefics3/internvl: pixel-shuffle scale (clip.vision.projector.scale_factor)
    proj_scale_factor: int = 0

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _cnorm(x, w, b, cfg: ClipConfig):
    if cfg.norm == "rms":
        xf = x.astype(jnp.float32)
        return (xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + cfg.eps)
                * w.astype(jnp.float32)).astype(x.dtype)
    return layer_norm(x, w, b, cfg.eps)


def _attn(x, p, cfg: ClipConfig, rope2d=None):
    B, N, D = x.shape
    H = cfg.n_heads
    Dh = D // H

    def lin(key):
        y = x @ p[key[0]]
        return (y + p[key[1]] if key[1] in p else y).reshape(B, N, H, Dh)

    q = lin(("wq", "bq"))
    k = lin(("wk", "bk"))
    v = lin(("wv", "bv"))
    if rope2d is not None:
        # pixtral 2D rope (build_rope_2d / HF PixtralRotaryEmbedding):
        # pair j < Dh/4 rotates by the row index with even-indexed
        # frequencies, j >= Dh/4 by the column with odd-indexed ones
        from ..ops.rope import apply_mrope

        pos_hw, freqs = rope2d
        q = apply_mrope(q, pos_hw, freqs, (Dh // 4, Dh // 4))
        k = apply_mrope(k, pos_hw, freqs, (Dh // 4, Dh // 4))
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * Dh**-0.5, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, N, D) @ p["wo"]
    return out + p["bo"] if "bo" in p else out


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: dict, cfg: ClipConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels (B, 3, H, W) normalized → projected features (B, N, proj_dim).

    Mirrors the llava path: run the ViT, take the ``feature_layer`` hidden
    states, drop CLS, apply the mm projector."""
    B = pixels.shape[0]
    ps = cfg.patch_size
    g = cfg.image_size // ps
    # unfold into patches: (B, 3, g, ps, g, ps) -> (B, g*g, 3*ps*ps)
    x = pixels.reshape(B, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * ps * ps)
    x = x @ params["patch_w"]  # (B, N, D); conv bias if present
    if "patch_b" in params:
        x = x + params["patch_b"]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(params["class_embd"], (B, 1, cfg.n_embd))
        x = jnp.concatenate([cls, x], axis=1)
    if cfg.pos_embd_bucket:
        # navit-style position bucketing (clip.cpp minicpmv set_input:
        # floor(70·i/g) per axis into a 70×70 learned table)
        bk = cfg.pos_embd_bucket
        coords = np.floor(bk * np.arange(g) / g).astype(np.int64)
        ids = (coords[:, None] * bk + coords[None, :]).reshape(-1)
        x = x + params["pos_embd"][jnp.asarray(ids)][None]
    elif cfg.projector == "idefics3":
        # navit-style fractional bucketing (HF Idefics3VisionEmbeddings:
        # frac = (i/g)·(1−1e−6), bucketize right over (1..nps−1)/nps) — for
        # full-resolution squares this is NOT arange (the .25−ε trick)
        nps = cfg.image_size // cfg.patch_size
        bounds = np.arange(1, nps) / nps
        coords = np.searchsorted(bounds, (np.arange(g) / g) * (1 - 1e-6), side="right")
        ids = (coords[:, None] * nps + coords[None, :]).reshape(-1)
        x = x + params["pos_embd"][jnp.asarray(ids)][None]
    elif "pos_embd" in params:
        x = x + params["pos_embd"][None, : x.shape[1]]

    rope2d = None
    if cfg.rope_2d:
        Dh = cfg.n_embd // cfg.n_heads
        base = cfg.rope_theta
        fr = 1.0 / base ** (np.arange(0, Dh, 2) / Dh)
        # reordered frequency vector: [even-indexed | odd-indexed] — pair j
        # then rotates by (row, col) positions via the M-RoPE sections
        freqs = jnp.asarray(np.concatenate([fr[0::2], fr[1::2]]).astype(np.float32))
        hh, ww = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        pos_hw = jnp.asarray(
            np.broadcast_to(
                np.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)[None],
                (B, g * g, 2),
            ).astype(np.int32)
        )
        rope2d = (pos_hw, freqs)
    if "pre_ln" in params:
        x = _cnorm(x, params["pre_ln"], params.get("pre_ln_b"), cfg)

    n_run = cfg.n_layers + cfg.feature_layer + 1 if cfg.feature_layer < 0 else cfg.feature_layer
    hidden = x
    tanh_act = cfg.act == "gelu_tanh"
    for il, p in enumerate(params["layers"]):
        if il >= n_run:
            break
        h = _cnorm(hidden, p["ln1"], p.get("ln1_b"), cfg)
        att = _attn(h, p, cfg, rope2d)
        if "ls1" in p:  # internvl layer scale (HF lambda_1/lambda_2)
            att = att * p["ls1"]
        hidden = hidden + att
        h = _cnorm(hidden, p["ln2"], p.get("ln2_b"), cfg)
        if cfg.ffn_gated:  # pixtral: silu-gated, bias-free
            mlp = (jax.nn.silu((h @ p["ffn_gate"]).astype(jnp.float32)).astype(h.dtype)
                   * (h @ p["ffn_up"])) @ p["ffn_down"]
        else:
            h = jax.nn.gelu((h @ p["ffn_up"] + p["b_up"]).astype(jnp.float32), approximate=tanh_act).astype(h.dtype)
            mlp = h @ p["ffn_down"] + p["b_down"]
        if "ls2" in p:
            mlp = mlp * p["ls2"]
        hidden = hidden + mlp

    if "post_ln" in params:
        hidden = _cnorm(hidden, params["post_ln"], params.get("post_ln_b"), cfg)

    feats = hidden[:, 1:] if cfg.use_class_token else hidden  # drop CLS

    if cfg.projector == "gemma3":
        # SigLIP features → 4×4 average pool → gemma RMS norm → projection
        # (clip.cpp PROJECTOR_TYPE_GEMMA3; HF Gemma3MultiModalProjector)
        gp = cfg.image_size // cfg.patch_size
        k = gp // max(cfg.mm_tokens_per_side, 1)
        f = feats.reshape(B, gp // k, k, gp // k, k, cfg.n_embd)
        f = f.mean(axis=(2, 4)).reshape(B, -1, cfg.n_embd)
        ff = f.astype(jnp.float32)
        rms = jax.lax.rsqrt((ff * ff).mean(-1, keepdims=True) + cfg.eps)
        f = (ff * rms * (1.0 + params["mm_soft_norm"].astype(jnp.float32))).astype(feats.dtype)
        return f @ params["mm_input_proj"]

    if cfg.projector == "minicpmv":
        # perceiver resampler (clip.cpp build_minicpmv:853): learned queries
        # cross-attend to kv-projected features; keys carry a 2D sincos
        # positional term; d_head fixed at 128 (clip.cpp:868)
        Dm = params["res_kv_proj"].shape[1]
        d_head = 128
        n_head = Dm // d_head
        nq = cfg.minicpmv_query_num
        v = feats @ params["res_kv_proj"]  # (B, N, Dm)
        q = layer_norm(params["res_query"], params["res_ln_q"], params["res_ln_q_b"], cfg.eps)
        v = layer_norm(v, params["res_ln_kv"], params["res_ln_kv_b"], cfg.eps)
        k = v + params["res_pos_embed"][None]
        Q = (q @ params["res_wq"] + params["res_bq"]).reshape(nq, n_head, d_head)
        K = (k @ params["res_wk"] + params["res_bk"]).reshape(B, -1, n_head, d_head)
        V = (v @ params["res_wv"] + params["res_bv"]).reshape(B, -1, n_head, d_head)
        scores = jnp.einsum("qhd,bmhd->bhqm", Q, K, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * d_head**-0.5, axis=-1)
        out = jnp.einsum("bhqm,bmhd->bqhd", probs.astype(V.dtype), V,
                         preferred_element_type=jnp.float32).astype(feats.dtype)
        out = out.reshape(B, nq, Dm) @ params["res_wo"] + params["res_bo"]
        out = layer_norm(out, params["res_ln_post"], params["res_ln_post_b"], cfg.eps)
        return out @ params["res_proj"]

    if cfg.projector == "pixtral":
        # optional mistral-small-3.1 patch merger (clip.cpp build_pixtral:581)
        if "mm_patch_merger" in params:
            m = cfg.spatial_merge_size
            ff = feats.astype(jnp.float32)
            ff = ff * jax.lax.rsqrt((ff * ff).mean(-1, keepdims=True) + cfg.eps)
            f = (ff * params["mm_input_norm"].astype(jnp.float32)).astype(feats.dtype)
            # torch.nn.functional.unfold layout: vec[c·m² + i·m + j]
            f = f.reshape(B, g // m, m, g // m, m, cfg.n_embd)
            f = f.transpose(0, 1, 3, 5, 2, 4).reshape(B, (g // m) ** 2, cfg.n_embd * m * m)
            feats = f @ params["mm_patch_merger"]
            rows, cols = g // m, g // m
        else:
            rows, cols = g, g
        if "mm1_w" in params:
            y = feats @ params["mm1_w"]
            if "mm1_b" in params:
                y = y + params["mm1_b"]
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
            y = y @ params["mm2_w"]
            if "mm2_b" in params:
                y = y + params["mm2_b"]
        else:
            y = feats
        # [IMG_BREAK] after every row but the last (clip.cpp:617)
        brk = jnp.broadcast_to(params["img_break"].reshape(1, 1, 1, -1),
                               (B, rows, 1, y.shape[-1])).astype(y.dtype)
        y = jnp.concatenate([y.reshape(B, rows, cols, -1), brk], axis=2)
        return y.reshape(B, rows * (cols + 1), -1)[:, :-1]

    if cfg.projector in ("idefics3", "internvl"):
        # pixel shuffle (HF Idefics3Connector.pixel_shuffle — the reference
        # replicates the same permutes, clip.cpp:521/internvl:938): each
        # s×s patch block folds into one token of D·s² features
        sf = cfg.proj_scale_factor
        D = cfg.n_embd
        f = feats.reshape(B, g, g // sf, D * sf)
        f = f.transpose(0, 2, 1, 3)
        f = f.reshape(B, g // sf, g // sf, D * sf * sf)
        f = f.transpose(0, 2, 1, 3)
        f = f.reshape(B, (g // sf) ** 2, D * sf * sf)
        if cfg.projector == "idefics3":
            return f @ params["mm_fc"] if "mm_fc" in params else f
        # internvl: LN → linear → gelu → linear (clip.cpp build_internvl)
        f = layer_norm(f, params["mm0_w"], params["mm0_b"], 1e-5)
        f = f @ params["mm1_w"] + params["mm1_b"]
        f = jax.nn.gelu(f.astype(jnp.float32), approximate=False).astype(f.dtype)
        return f @ params["mm3_w"] + params["mm3_b"]

    # llava 2-layer MLP projector (mm.0 / mm.2)
    y = feats @ params["mm0_w"] + params["mm0_b"]
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
    return y @ params["mm2_w"] + params["mm2_b"]


def sincos_pos_embed_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """2D sincos positional embedding (clip.cpp get_2d_sincos_pos_embed:3684):
    first half encodes the row index, second half the column, each as
    [sin(p·ω) | cos(p·ω)] with ω_i = 10000^(-i/(D/4)).  Returns (h·w, D)."""
    assert embed_dim % 4 == 0
    quarter = embed_dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))

    def enc(pos):  # (n,) -> (n, D/2)
        ang = pos[:, None] * omega[None, :]
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)

    hh, ww = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    emb_h = enc(hh.reshape(-1))
    emb_w = enc(ww.reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=-1)


# ---------------------------------------------------------------------------
# mmproj GGUF loading (names: clip-impl.h TN_*)
# ---------------------------------------------------------------------------


def config_from_mmproj(reader) -> ClipConfig:
    g = lambda k, d=None: reader.get(k) if reader.get(k) is not None else d
    projector = str(g("clip.projector_type", "mlp"))
    gemma3 = projector == "gemma3"
    minicpmv = projector == "minicpmv"
    pixtral = projector == "pixtral"
    internvl = projector == "internvl"
    img = int(g("clip.vision.image_size"))
    patch = int(g("clip.vision.patch_size"))
    return ClipConfig(
        image_size=img,
        patch_size=patch,
        n_embd=int(g("clip.vision.embedding_length")),
        n_layers=int(g("clip.vision.block_count")),
        n_heads=int(g("clip.vision.attention.head_count")),
        n_ff=int(g("clip.vision.feed_forward_length")),
        proj_dim=int(g("clip.vision.projection_dim")),
        eps=float(g("clip.vision.attention.layer_norm_epsilon", 1e-5)),
        # gemma3/minicpmv project the final post-norm hidden states
        feature_layer=int(g("clip.vision.feature_layer",
                            -1 if (gemma3 or minicpmv or pixtral or internvl
                                   or projector == "idefics3") else -2)),
        use_class_token=not (gemma3 or minicpmv or pixtral or projector == "idefics3"),
        projector=projector,
        act="gelu_tanh" if (gemma3 or minicpmv or projector == "idefics3") else "gelu_erf",
        minicpmv_query_num=int(g("clip.minicpmv_query_num", 64)) if minicpmv else 0,
        pos_embd_bucket=70 if minicpmv else 0,
        # pixtral tower (clip.cpp hparams: rope_theta defaults 10000 :2239)
        norm="rms" if pixtral else "layer",
        proj_scale_factor=int(g("clip.vision.projector.scale_factor", 0) or 0),
        ffn_gated=pixtral,
        rope_2d=pixtral,
        rope_theta=float(g("clip.vision.rope_theta", 10000.0)),
        spatial_merge_size=int(g("clip.vision.spatial_merge_size", 1) or 1),
        mm_tokens_per_side=int(
            g("clip.vision.mm_tokens_per_side",
              int(int(g("clip.vision.mm_tokens_per_image", 256)) ** 0.5) if gemma3 else 0)
        ),
    )


def load_mmproj(reader, dtype=jnp.float32) -> tuple[ClipConfig, dict]:
    cfg = config_from_mmproj(reader)
    t = reader.tensors

    def w(name, transpose=False):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return jnp.asarray(a.astype(dtype))

    params: dict = {
        # conv weight (D, 3, ps, ps) -> unfold layout (3*ps*ps, D)
        "patch_w": jnp.asarray(
            np.ascontiguousarray(
                t["v.patch_embd.weight"].to_f32().reshape(cfg.n_embd, -1).T
            ).astype(dtype)
        ),
    }
    if "v.position_embd.weight" in t:  # pixtral has none (2D rope instead)
        params["pos_embd"] = w("v.position_embd.weight")
    if cfg.projector == "gemma3":
        params["mm_input_proj"] = w("mm.input_projection.weight")
        params["mm_soft_norm"] = w("mm.soft_emb_norm.weight")
    elif cfg.projector == "minicpmv":
        # resampler tensors (clip-impl.h TN_MINICPMV_*)
        params["res_kv_proj"] = w("resampler.kv.weight", True)
        params["res_proj"] = w("resampler.proj.weight", True)
        params["res_query"] = w("resampler.query")
        for nm, key in [("q", "q"), ("k", "k"), ("v", "v"), ("out", "o")]:
            params[f"res_w{key}"] = w(f"resampler.attn.{nm}.weight", True)
            params[f"res_b{key}"] = w(f"resampler.attn.{nm}.bias")
        for nm in ("q", "kv", "post"):
            params[f"res_ln_{nm}"] = w(f"resampler.ln_{nm}.weight")
            params[f"res_ln_{nm}_b"] = w(f"resampler.ln_{nm}.bias")
        # fixed-grid 2D sincos positional term for the keys
        # (clip.cpp get_2d_sincos_pos_embed:3684 — [sin|cos](h) ‖ [sin|cos](w))
        Dm = params["res_kv_proj"].shape[1]
        gp = cfg.image_size // cfg.patch_size
        params["res_pos_embed"] = jnp.asarray(
            sincos_pos_embed_2d(Dm, gp, gp).astype(np.float32))
    elif cfg.projector == "pixtral":
        # bare towers (no projector tensors) emit raw features + breaks
        if "mm.1.weight" in t:
            params["mm1_w"] = w("mm.1.weight", True)
            params["mm2_w"] = w("mm.2.weight", True)
        if "mm.1.bias" in t:
            params["mm1_b"] = w("mm.1.bias")
        if "mm.2.bias" in t:
            params["mm2_b"] = w("mm.2.bias")
        params["img_break"] = w("v.token_embd.img_break")
        if "mm.patch_merger.weight" in t:  # mistral small 3.1
            params["mm_patch_merger"] = w("mm.patch_merger.weight", True)
            params["mm_input_norm"] = w("mm.input_norm.weight")
    elif cfg.projector == "idefics3":
        if "mm.model.fc.weight" in t:
            params["mm_fc"] = w("mm.model.fc.weight", True)
    elif cfg.projector == "internvl":
        params["mm0_w"] = w("mm.0.weight")
        params["mm0_b"] = w("mm.0.bias")
        params["mm1_w"] = w("mm.1.weight", True)
        params["mm1_b"] = w("mm.1.bias")
        params["mm3_w"] = w("mm.3.weight", True)
        params["mm3_b"] = w("mm.3.bias")
    else:
        params["mm0_w"] = w("mm.0.weight", True)
        params["mm0_b"] = w("mm.0.bias")
        params["mm2_w"] = w("mm.2.weight", True)
        params["mm2_b"] = w("mm.2.bias")
    if "v.patch_embd.bias" in t:
        params["patch_b"] = w("v.patch_embd.bias")
    if "v.class_embd" in t:
        params["class_embd"] = w("v.class_embd")
    if "v.pre_ln.weight" in t:
        params["pre_ln"] = w("v.pre_ln.weight")
        if "v.pre_ln.bias" in t:  # pixtral: RMS pre-norm has no bias
            params["pre_ln_b"] = w("v.pre_ln.bias")
    if "v.post_ln.weight" in t:
        params["post_ln"] = w("v.post_ln.weight")
        if "v.post_ln.bias" in t:
            params["post_ln_b"] = w("v.post_ln.bias")
    layers = []
    for i in range(cfg.n_layers):
        b = f"v.blk.{i}."
        layer = {
            "ln1": w(b + "ln1.weight"),
            "ln2": w(b + "ln2.weight"),
            "wq": w(b + "attn_q.weight", True),
            "wk": w(b + "attn_k.weight", True),
            "wv": w(b + "attn_v.weight", True),
            "wo": w(b + "attn_out.weight", True),
            "ffn_up": w(b + "ffn_up.weight", True),
            "ffn_down": w(b + "ffn_down.weight", True),
        }
        for gg, key in [("ln1.bias", "ln1_b"), ("ln2.bias", "ln2_b"),
                        ("attn_q.bias", "bq"), ("attn_k.bias", "bk"),
                        ("attn_v.bias", "bv"), ("attn_out.bias", "bo"),
                        ("ffn_up.bias", "b_up"), ("ffn_down.bias", "b_down")]:
            if b + gg in t:
                layer[key] = w(b + gg)
        if b + "ffn_gate.weight" in t:
            layer["ffn_gate"] = w(b + "ffn_gate.weight", True)
        for gg, key in [("ls1.weight", "ls1"), ("ls2.weight", "ls2")]:
            if b + gg in t:
                layer[key] = w(b + gg)
        layers.append(layer)
    params["layers"] = layers
    return cfg, params
