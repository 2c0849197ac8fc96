"""Diffusion LMs (Dream / LLaDA): bidirectional forward + iterative
denoising generation.

Reference: ``llm_build_dream`` (src/llama-model.cpp:8254 — qwen2 block
shape over ``build_attn_inp_no_cache``), ``llm_build_llada`` (:8357 —
llama block shape, non-causal), and the generation loop of
``examples/diffusion/diffusion-cli.cpp``: the whole ``max_length`` canvas
starts as [prompt | MASK…]; each step runs the full bidirectional
forward, samples every masked position, and commits the
``transfer_count`` most confident samples (timestep- or block-based
schedule, :98-121; confidence algorithms :62-96).

TPU design: one jitted full-canvas forward per denoising step (static
shape — the canvas never changes length); the remask/commit bookkeeping
is tiny host work on (T,) vectors.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies

NEG_INF = -1e30


def forward_bidir(params: dict, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Non-causal full-canvas forward: (B, T) ids → (B, T, V) f32 logits."""
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    inv_freq = jnp.asarray(rope_frequencies(cfg))
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    Hkv = cfg.n_kv_heads
    G = cfg.n_heads // Hkv

    def layer_step(x, p):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        if "wqkv_fused" in p:
            qkv = h @ p["wqkv_fused"]
            if "bqkv_fused" in p:
                qkv = qkv + p["bqkv_fused"]
            Dq = cfg.n_heads * cfg.head_dim
            Dkv = Hkv * cfg.head_dim
            q, k, v = qkv[..., :Dq], qkv[..., Dq:Dq + Dkv], qkv[..., Dq + Dkv:]
        else:
            q = h @ p["wq"]
            k = h @ p["wk"]
            v = h @ p["wv"]
            if "bq" in p:
                q, k, v = q + p["bq"], k + p["bk"], v + p["bv"]
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, Hkv, cfg.head_dim)
        v = v.reshape(B, T, Hkv, cfg.head_dim)
        q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
        k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
        qg = q.reshape(B, T, Hkv, G, cfg.head_dim)
        scores = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhgts,bshd->bthgd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, T, cfg.n_heads * cfg.head_dim).astype(x.dtype)
        x = x + attn @ p["wo"]
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        if "wgateup_fused" in p:
            gu = h @ p["wgateup_fused"]
            g, u = gu[..., :cfg.n_ff], gu[..., cfg.n_ff:]
        else:
            g, u = h @ p["w_gate"], h @ p["w_up"]
        mlp = (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u) @ p["w_down"]
        return x + mlp, None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])
    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits


class DiffusionEngine:
    """Iterative-denoising generator (diffusion-cli analog)."""

    def __init__(self, cfg: ModelConfig, params: dict, tokenizer,
                 mask_token_id: int | None = None, shift_logits: bool | None = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.mask_token_id = mask_token_id
        # Dream predicts shifted (next-token) logits; LLaDA predicts in place
        self.shift_logits = (cfg.arch == "dream") if shift_logits is None else shift_logits
        from functools import partial

        self._fwd = jax.jit(partial(forward_bidir, cfg=cfg))

    @classmethod
    def from_gguf(cls, path: str, dtype=jnp.float32, **kw) -> "DiffusionEngine":
        from ..gguf.reader import GGUFModelReader
        from ..models.config import config_from_gguf
        from ..tokenizers import tokenizer_from_gguf
        from .weights import load_llama_params

        reader = GGUFModelReader(path)
        cfg = config_from_gguf(reader)
        tok = tokenizer_from_gguf(reader.readers[0])
        params = load_llama_params(reader, cfg, dtype)
        mask_id = kw.pop("mask_token_id", None)
        if mask_id is None:
            mask_id = reader.get("tokenizer.ggml.mask_token_id")
        return cls(cfg, params, tok, mask_token_id=mask_id, **kw)

    def generate(
        self,
        prompt_ids: list[int],
        max_length: int = 128,
        steps: int = 32,
        temperature: float = 0.0,
        algorithm: str = "confidence",  # confidence|entropy|margin|random
        schedule: str = "timestep",  # timestep | block
        block_length: int = 32,
        eps: float = 1e-3,
        seed: int = 0,
        alg_temp: float = 0.0,        # --diffusion-alg-temp: stochastic
        #                               transfer-position choice
        cfg_scale: float = 0.0,       # --diffusion-cfg-scale: classifier-
        #                               free guidance vs masked prompt
        add_gumbel_noise: bool = False,  # --diffusion-add-gumbel-noise
        visual_cb=None,               # --diffusion-visual: per-step hook
    ) -> list[int]:
        """Denoise [prompt | MASK…] into ``max_length`` tokens; returns the
        generated suffix token ids."""
        if self.mask_token_id is None:
            raise ValueError("diffusion generation needs a mask token id")
        n_input = len(prompt_ids)
        assert max_length > n_input
        canvas = np.full((max_length,), self.mask_token_id, np.int64)
        canvas[:n_input] = prompt_ids
        rng = np.random.default_rng(seed)

        if schedule == "block":
            assert max_length % block_length == 0
            num_blocks = (max_length - n_input + block_length - 1) // block_length
            steps_per_block = max(steps // max(num_blocks, 1), 1)
        else:
            num_blocks, steps_per_block = 1, steps

        for block in range(num_blocks):
            if schedule == "block":
                b0 = n_input + block * block_length
                b1 = min(n_input + (block + 1) * block_length, max_length)
                block_masks = int((canvas[b0:b1] == self.mask_token_id).sum())
                base, rem = divmod(block_masks, steps_per_block)
                transfer_plan = [base + (1 if s < rem else 0)
                                 for s in range(steps_per_block)]
            else:
                b0, b1 = 0, max_length
                transfer_plan = None

            for step in range(steps_per_block):
                mask_pos = np.nonzero(
                    (canvas == self.mask_token_id)
                    & (np.arange(max_length) >= b0)
                    & (np.arange(max_length) < b1)
                )[0]
                if mask_pos.size == 0:
                    break
                logits = np.asarray(
                    self._fwd(self.params, tokens=jnp.asarray(canvas[None], jnp.int32))
                )[0]
                if cfg_scale > 0:
                    # classifier-free guidance: uncond forward with the
                    # prompt masked; logits = uncond + (scale+1)(cond-uncond)
                    # (diffusion-cli.cpp:318-347)
                    un = canvas.copy()
                    un[:n_input] = self.mask_token_id
                    uncond = np.asarray(self._fwd(
                        self.params, tokens=jnp.asarray(un[None], jnp.int32)))[0]
                    logits = uncond + (cfg_scale + 1.0) * (logits - uncond)
                if self.shift_logits:
                    # dream: position i is predicted by logits at i-1
                    logits = np.concatenate([logits[:1], logits[:-1]], axis=0)

                lg = logits[mask_pos].astype(np.float64)
                if temperature > 0:
                    # gumbel-max sampling ≡ softmax(logits/T) draw; the
                    # reference's --diffusion-add-gumbel-noise requests
                    # exactly this noising, so the flag is subsumed here
                    u = np.clip(rng.random(lg.shape), 1e-20, 1.0)
                    lg = lg / temperature - np.log(-np.log(u))
                sampled = lg.argmax(-1)
                p = np.exp(logits[mask_pos] - logits[mask_pos].max(-1, keepdims=True))
                p = p / p.sum(-1, keepdims=True)
                if algorithm == "entropy":
                    conf = (p * np.log(p + 1e-10)).sum(-1)  # -entropy, negated below
                    conf = -(-conf)  # keep sign: higher = more confident
                elif algorithm == "margin":
                    part = np.partition(p, -2, axis=-1)
                    conf = part[:, -1] - part[:, -2]
                elif algorithm == "random":  # RANDOM: shuffle the order
                    conf = rng.random(mask_pos.size)
                else:  # confidence/low_confidence: p of the sampled token
                    conf = p[np.arange(mask_pos.size), sampled]

                if transfer_plan is not None:
                    n_transfer = transfer_plan[step]
                else:
                    t = 1.0 - step / steps_per_block * (1.0 - eps)
                    s = 1.0 - (step + 1) / steps_per_block * (1.0 - eps)
                    p_tr = (1.0 - s / t) if step < steps_per_block - 1 else 1.0
                    n_transfer = int(mask_pos.size * p_tr)
                n_transfer = max(min(n_transfer, mask_pos.size),
                                 1 if step == steps_per_block - 1 else 0)
                if n_transfer <= 0:
                    continue
                if alg_temp > 0:
                    # stochastic transfer choice: sample positions from
                    # softmax(conf / alg_temp) (diffusion-cli.cpp:449-470)
                    w = np.exp(conf / alg_temp - (conf / alg_temp).max())
                    w = w / w.sum()
                    order = rng.choice(mask_pos.size, size=min(
                        n_transfer, mask_pos.size), replace=False, p=w)
                else:
                    order = np.argsort(-conf, kind="stable")[:n_transfer]
                canvas[mask_pos[order]] = sampled[order]
                if visual_cb is not None:
                    visual_cb(canvas.copy(), step)

            if schedule == "block":
                # force-commit any leftovers in the block
                left = np.nonzero(canvas[b0:b1] == self.mask_token_id)[0] + b0
                if left.size:
                    logits = np.asarray(self._fwd(
                        self.params, tokens=jnp.asarray(canvas[None], jnp.int32)))[0]
                    if self.shift_logits:
                        logits = np.concatenate([logits[:1], logits[:-1]], axis=0)
                    canvas[left] = logits[left].argmax(-1)

        return canvas[n_input:].tolist()
