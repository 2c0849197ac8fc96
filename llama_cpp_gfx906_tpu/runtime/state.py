"""Inference-state persistence (reference: llama_state_* API, llama.h:779-894;
impl src/llama-context.cpp:1630-1996, LLAMA_SESSION_VERSION 9).

Two granularities, mirroring the reference:
- whole-context state files (llama-cli ``--prompt-cache``): token history +
  the full cache pytree;
- per-sequence state blobs (server slot save/restore,
  ``llama_state_seq_get_data``) — produced by BatchedEngine.save_slot_state.

Format: a small JSON header (magic/version/config fingerprint) + an .npz
payload of the cache leaves.  The config fingerprint rejects mismatched
models, like the reference's hparams checks on session load.
"""

from __future__ import annotations

import io
import json
import zipfile

import jax
import numpy as np

STATE_MAGIC = "LCGT-STATE"
STATE_VERSION = 1


def _cfg_fingerprint(cfg) -> dict:
    return {
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
        "n_embd": cfg.n_embd,
        "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "n_vocab": cfg.n_vocab,
    }


def save_state_file(path: str, engine, token_ids: list[int]) -> int:
    """Serialize engine cache + token history.  Returns bytes written."""
    leaves, treedef = jax.tree_util.tree_flatten(engine.kv)
    header = {
        "magic": STATE_MAGIC,
        "version": STATE_VERSION,
        "config": _cfg_fingerprint(engine.cfg),
        "family": engine.family.name,
        "n_leaves": len(leaves),
        "tokens": list(map(int, token_ids)),
        "max_seq": engine.max_seq,
        "batch_size": engine.batch_size,
    }
    buf = io.BytesIO()
    leaf_meta = []
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            # raw bytes + explicit dtype tag: np.save can't round-trip
            # ml_dtypes (bfloat16) reliably
            leaf_meta.append({"shape": list(arr.shape), "dtype": str(arr.dtype)})
            z.writestr(f"leaf_{i}.bin", np.ascontiguousarray(arr).tobytes())
        header["leaves"] = leaf_meta
        z.writestr("header.json", json.dumps(header))
    data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_state_file(path: str, engine) -> list[int]:
    """Restore a state file into the engine; returns the token history.

    Raises ValueError on magic/version/config mismatch (the reference
    returns false from llama_state_load_file the same way)."""
    import jax.numpy as jnp

    with zipfile.ZipFile(path, "r") as z:
        header = json.loads(z.read("header.json"))
        if header.get("magic") != STATE_MAGIC:
            raise ValueError("not a state file")
        if header.get("version") != STATE_VERSION:
            raise ValueError(f"unsupported state version {header.get('version')}")
        if header["config"] != _cfg_fingerprint(engine.cfg):
            raise ValueError("state file belongs to a different model")
        # cache dims are baked into the engine's compiled step functions —
        # reject mismatches up front (reference: hparams check on session
        # load) instead of failing later with an opaque XLA shape error
        if header["batch_size"] != engine.batch_size or header["max_seq"] != engine.max_seq:
            raise ValueError(
                f"state dims (batch={header['batch_size']}, max_seq={header['max_seq']}) "
                f"!= engine dims (batch={engine.batch_size}, max_seq={engine.max_seq})"
            )
        fresh = engine.family.make_cache(
            engine.cfg, header["batch_size"], header["max_seq"], engine.kv_dtype
        )
        leaves, treedef = jax.tree_util.tree_flatten(fresh)
        if header["n_leaves"] != len(leaves):
            raise ValueError("cache structure mismatch")
        import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

        new_leaves = []
        for i, proto in enumerate(leaves):
            meta = header["leaves"][i]
            arr = np.frombuffer(z.read(f"leaf_{i}.bin"), dtype=np.dtype(meta["dtype"]))
            arr = arr.reshape(meta["shape"])
            if tuple(arr.shape) != tuple(proto.shape):
                raise ValueError(
                    f"leaf {i}: shape {arr.shape} != expected {tuple(proto.shape)}"
                )
            new_leaves.append(jnp.asarray(arr).astype(proto.dtype))
        engine.kv = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return list(header["tokens"])


def save_seq_state_file(path: str, state: dict, cfg) -> int:
    """Per-sequence blob → file (llama_state_seq_save_file analog)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        header = {
            "magic": STATE_MAGIC + "-SEQ",
            "version": STATE_VERSION,
            "config": _cfg_fingerprint(cfg),
            "n_past": int(state["n_past"]),
            "prompt_ids": list(map(int, state.get("prompt_ids", []))),
            "generated": list(map(int, state.get("generated", []))),
        }
        z.writestr("header.json", json.dumps(header))
        for key in ("k", "v"):
            sub = io.BytesIO()
            np.save(sub, np.asarray(state[key]), allow_pickle=False)
            z.writestr(f"{key}.npy", sub.getvalue())
    data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_seq_state_file(path: str, cfg) -> dict:
    with zipfile.ZipFile(path, "r") as z:
        header = json.loads(z.read("header.json"))
        if header.get("magic") != STATE_MAGIC + "-SEQ":
            raise ValueError("not a sequence-state file")
        if header["config"] != _cfg_fingerprint(cfg):
            raise ValueError("sequence state belongs to a different model")
        return {
            "k": np.load(io.BytesIO(z.read("k.npy")), allow_pickle=False),
            "v": np.load(io.BytesIO(z.read("v.npy")), allow_pickle=False),
            "n_past": header["n_past"],
            "prompt_ids": header["prompt_ids"],
            "generated": header["generated"],
        }
