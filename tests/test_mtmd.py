"""Multimodal (llava-style) parity vs HF transformers (reference:
tools/mtmd — clip.cpp vision graph + chunk injection)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llava

VOCAB = 96
IMG_TOKEN = 4  # "<t1>" reused as the image placeholder


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


@pytest.fixture(scope="module")
def llava_pair(tmp_path_factory):
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(0)
    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=24, patch_size=8, projection_dim=32,
    )
    text = LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text,
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    hf = LlavaForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("llava")
    lm = str(d / "lm.gguf")
    mm = str(d / "mmproj.gguf")
    convert_hf_llava(hf, dummy_vocab(), lm, mm, quant_type=GGMLType.F32)
    return lm, mm, hf


def test_clip_encoder_parity(llava_pair):
    """Projected image features must match HF's get_image_features."""
    lm, mm, hf = llava_pair
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj

    cfg, params = load_mmproj(GGUFReader(mm), jnp.float32)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(pixels), vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.reshape(-1, ref.shape[-1]).numpy()
    got = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))[0]
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_llava_end_to_end_logits(llava_pair):
    """Full pipeline: text+image prefill logits match HF llava."""
    lm, mm, hf = llava_pair
    from llama_cpp_gfx906_tpu.runtime.mtmd import MtmdEngine

    eng = MtmdEngine.from_gguf(lm, mm, max_seq=64, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((3, 24, 24)).astype(np.float32)
    n_patches = (24 // 8) ** 2

    prompt = "<t5><image><t6><t7>"
    embeds, ids = eng.build_embeds(prompt, pixels)
    assert embeds.shape[1] == 1 + 1 + n_patches + 2  # bos + t5 + img + t6 + t7

    # HF: input_ids with the image token expanded to n_patches positions
    hf_ids = [0, 8] + [IMG_TOKEN] * n_patches + [9, 10]  # bos <t5> img… <t6> <t7>
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=torch.tensor(pixels[None]),
        ).logits[0, -1].numpy()

    import llama_cpp_gfx906_tpu.models.llama as L

    kv = L.KVCache.create(eng.engine.cfg, 1, 64, jnp.float32)
    logits, _ = L.forward(
        eng.engine.params, eng.engine.cfg,
        jnp.zeros((1, embeds.shape[1]), jnp.int32), kv,
        embeds=jnp.asarray(embeds),
    )
    got = np.asarray(logits[0, -1])
    np.testing.assert_allclose(got, ref, rtol=4e-3, atol=4e-3)


def test_mtmd_generate(llava_pair):
    lm, mm, _ = llava_pair
    from llama_cpp_gfx906_tpu.runtime.mtmd import MtmdEngine

    eng = MtmdEngine.from_gguf(lm, mm, max_seq=64, dtype=jnp.float32)
    pixels = np.random.default_rng(2).standard_normal((3, 24, 24)).astype(np.float32)
    text, ids = eng.generate("<t5><image><t6>", pixels, n_predict=4)
    assert len(ids) <= 4
    text2, ids2 = eng.generate("<t5><image><t6>", pixels, n_predict=4)
    assert ids == ids2  # deterministic


# -----------------------------------------------------------------------------
# Gemma3 / SigLIP vision tower + projector (clip.cpp PROJECTOR_TYPE_GEMMA3)
# -----------------------------------------------------------------------------


def test_gemma3_siglip_parity(tmp_path):
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration
    from transformers.models.siglip import SiglipVisionConfig

    torch.manual_seed(3)
    vision = SiglipVisionConfig(
        hidden_size=48, intermediate_size=80, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14, num_channels=3,
    )
    text = dict(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    cfg = Gemma3Config(vision_config=vision, text_config=text,
                       mm_tokens_per_image=4)  # 4x4 patch grid -> 2x2 pooled
    hf = Gemma3ForConditionalGeneration(cfg).eval()
    # the projector weight initializes to zeros — randomize for a real test
    with torch.no_grad():
        hf.multi_modal_projector.mm_input_projection_weight.normal_(0, 0.2)
        hf.multi_modal_projector.mm_soft_emb_norm.weight.normal_(0, 0.1)

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gemma3_vision

    path = str(tmp_path / "g3-mmproj.gguf")
    convert_hf_gemma3_vision(hf, path, mm_tokens_per_image=4)
    ccfg, cparams = load_mmproj(GGUFReader(path))
    assert ccfg.projector == "gemma3" and not ccfg.use_class_token
    assert ccfg.mm_tokens_per_side == 2

    pixels = np.random.default_rng(0).standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        feats = hf.vision_tower(torch.tensor(pixels)).last_hidden_state
        ref = hf.multi_modal_projector(feats).numpy()
    got = np.asarray(encode_image(cparams, ccfg, jnp.asarray(pixels)))
    assert got.shape == ref.shape == (1, 4, 32)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_server_vision_api(llava_pair):
    """Multimodal chat completions: image_url data-URI parts flow through
    the CLIP encoder into an embeds prefill (reference: server vision API,
    tools/server/tests/unit/test_vision_api.py)."""
    import asyncio
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.clip import load_mmproj
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf
    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine
    from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app
    from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf

    lm, mm, _ = llava_pair
    reader = GGUFReader(lm)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    eng = BatchedEngine(cfg, params, tok, n_slots=2, max_seq=64, dtype=jnp.float32)
    clip = load_mmproj(GGUFReader(mm))
    srv = InferenceServer(eng, model_name="tiny-llava", clip=clip)
    srv.start()
    app = build_app(srv)

    buf = io.BytesIO()
    Image.new("RGB", (24, 24), (120, 30, 200)).save(buf, format="PNG")
    data_uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "<t1>describe"},
                    {"type": "image_url", "image_url": {"url": data_uri}},
                    {"type": "text", "text": "<t2>"},
                ]}],
                "max_tokens": 5, "temperature": 0,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            msg = body["choices"][0]["message"]
            assert isinstance(msg["content"], str) and len(msg["content"]) > 0
            assert body["usage"]["completion_tokens"] == 5

        loop.run_until_complete(run())
    finally:
        loop.run_until_complete(client.close())
        srv.stop()
        loop.close()


def test_minicpmv_resampler(tmp_path):
    """MiniCPM-V perceiver resampler + navit bucketed ViT positions
    (reference: clip.cpp build_minicpmv:853, set_input bucketing :3847,
    get_2d_sincos_pos_embed:3684) against an independent numpy oracle
    built from the same reference formulas."""
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj

    rng = np.random.default_rng(5)
    D, FF, L, H = 32, 64, 2, 4
    IMG, PS = 16, 4
    G = IMG // PS  # 4x4 patch grid
    N = G * G
    DM, NQ, OUT = 128, 8, 64

    def t(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = GGUFWriter(str(tmp_path / "minicpmv-mmproj.gguf"), "clip")
    w.add_string("clip.projector_type", "minicpmv")
    w.add_uint32("clip.vision.image_size", IMG)
    w.add_uint32("clip.vision.patch_size", PS)
    w.add_uint32("clip.vision.embedding_length", D)
    w.add_uint32("clip.vision.block_count", L)
    w.add_uint32("clip.vision.attention.head_count", H)
    w.add_uint32("clip.vision.feed_forward_length", FF)
    w.add_uint32("clip.vision.projection_dim", OUT)
    w.add_uint32("clip.minicpmv_query_num", NQ)
    from llama_cpp_gfx906_tpu.gguf import GGMLType as GT

    arrays = {}

    def add(name, arr):
        arrays[name] = arr
        w.add_tensor(name, arr, GT.F32)

    add("v.patch_embd.weight", t(D, 3, PS, PS))
    add("v.patch_embd.bias", t(D))
    add("v.position_embd.weight", t(70 * 70, D))
    add("v.post_ln.weight", 1 + t(D, scale=0.05))
    add("v.post_ln.bias", t(D))
    for i in range(L):
        b = f"v.blk.{i}."
        add(b + "ln1.weight", 1 + t(D, scale=0.05)); add(b + "ln1.bias", t(D))
        add(b + "ln2.weight", 1 + t(D, scale=0.05)); add(b + "ln2.bias", t(D))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            add(b + nm + ".weight", t(D, D)); add(b + nm + ".bias", t(D))
        add(b + "ffn_up.weight", t(FF, D)); add(b + "ffn_up.bias", t(FF))
        add(b + "ffn_down.weight", t(D, FF)); add(b + "ffn_down.bias", t(D))
    add("resampler.query", t(NQ, DM))
    add("resampler.kv.weight", t(DM, D))
    add("resampler.proj.weight", t(OUT, DM))
    for nm in ("q", "k", "v", "out"):
        add(f"resampler.attn.{nm}.weight", t(DM, DM))
        add(f"resampler.attn.{nm}.bias", t(DM))
    for nm in ("q", "kv", "post"):
        add(f"resampler.ln_{nm}.weight", 1 + t(DM, scale=0.05))
        add(f"resampler.ln_{nm}.bias", t(DM))
    path = w.write()

    cfg, params = load_mmproj(GGUFReader(path), jnp.float32)
    assert cfg.projector == "minicpmv" and cfg.minicpmv_query_num == NQ
    pixels = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    got = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))[0]
    assert got.shape == (NQ, OUT)

    # ---- numpy oracle (reference formulas, written independently) ----
    def ln(x, wgt, b, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * wgt + b

    def gelu_tanh(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))

    # patch embed (conv as unfold) + bucketed positions
    px = pixels[0].reshape(3, G, PS, G, PS).transpose(1, 3, 0, 2, 4).reshape(N, -1)
    x = px @ arrays["v.patch_embd.weight"].reshape(D, -1).T + arrays["v.patch_embd.bias"]
    coords = np.floor(70.0 * np.arange(G) / G).astype(int)
    ids = (coords[:, None] * 70 + coords[None, :]).reshape(-1)
    x = x + arrays["v.position_embd.weight"][ids]
    for i in range(L):
        b = f"v.blk.{i}."
        h = ln(x, arrays[b + "ln1.weight"], arrays[b + "ln1.bias"])
        q = (h @ arrays[b + "attn_q.weight"].T + arrays[b + "attn_q.bias"]).reshape(N, H, -1)
        k = (h @ arrays[b + "attn_k.weight"].T + arrays[b + "attn_k.bias"]).reshape(N, H, -1)
        v = (h @ arrays[b + "attn_v.weight"].T + arrays[b + "attn_v.bias"]).reshape(N, H, -1)
        sc = np.einsum("nhd,mhd->hnm", q, k) / np.sqrt(D // H)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr = pr / pr.sum(-1, keepdims=True)
        att = np.einsum("hnm,mhd->nhd", pr, v).reshape(N, D)
        x = x + att @ arrays[b + "attn_out.weight"].T + arrays[b + "attn_out.bias"]
        h = ln(x, arrays[b + "ln2.weight"], arrays[b + "ln2.bias"])
        h = gelu_tanh(h @ arrays[b + "ffn_up.weight"].T + arrays[b + "ffn_up.bias"])
        x = x + h @ arrays[b + "ffn_down.weight"].T + arrays[b + "ffn_down.bias"]
    x = ln(x, arrays["v.post_ln.weight"], arrays["v.post_ln.bias"])

    # resampler
    v = x @ arrays["resampler.kv.weight"].T  # (N, DM)
    q = ln(arrays["resampler.query"], arrays["resampler.ln_q.weight"], arrays["resampler.ln_q.bias"])
    v = ln(v, arrays["resampler.ln_kv.weight"], arrays["resampler.ln_kv.bias"])
    quarter = DM // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
    hh, ww = np.meshgrid(np.arange(G), np.arange(G), indexing="ij")
    ang_h = hh.reshape(-1)[:, None] * omega
    ang_w = ww.reshape(-1)[:, None] * omega
    pos = np.concatenate([np.sin(ang_h), np.cos(ang_h), np.sin(ang_w), np.cos(ang_w)], -1)
    k = v + pos
    Q = q @ arrays["resampler.attn.q.weight"].T + arrays["resampler.attn.q.bias"]
    K = k @ arrays["resampler.attn.k.weight"].T + arrays["resampler.attn.k.bias"]
    V = v @ arrays["resampler.attn.v.weight"].T + arrays["resampler.attn.v.bias"]
    sc = Q @ K.T / np.sqrt(128.0)  # DM=128 → one head
    pr = np.exp(sc - sc.max(-1, keepdims=True)); pr = pr / pr.sum(-1, keepdims=True)
    out = pr @ V
    out = out @ arrays["resampler.attn.out.weight"].T + arrays["resampler.attn.out.bias"]
    out = ln(out, arrays["resampler.ln_post.weight"], arrays["resampler.ln_post.bias"])
    want = out @ arrays["resampler.proj.weight"].T

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pixtral_tower_parity(tmp_path):
    """Pixtral ViT (RMS norms, gated FFN, 2D rope, no learned positions)
    must match HF PixtralVisionModel hidden states (reference:
    clip.cpp build_pixtral:555 / build_rope_2d)."""
    from transformers import PixtralVisionConfig, PixtralVisionModel

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_pixtral_vision

    torch.manual_seed(6)
    vt = PixtralVisionModel(PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4, rope_theta=10000.0,
    )).eval()
    path = str(tmp_path / "pixtral-mmproj.gguf")
    convert_hf_pixtral_vision(vt, path)
    cfg, params = load_mmproj(GGUFReader(path), jnp.float32)
    assert cfg.projector == "pixtral" and cfg.norm == "rms" and cfg.rope_2d

    pixels = np.random.default_rng(0).standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = vt(torch.tensor(pixels)).last_hidden_state[0].numpy()

    # bare tower: no projector tensors → raw features + zero break rows
    D = 32
    rows = cols = 4
    got = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))[0]
    y = ref.reshape(rows, cols, D)
    brk = np.zeros((rows, 1, D), np.float32)
    want = np.concatenate([y, brk], axis=1).reshape(rows * (cols + 1), D)[:-1]
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_pixtral_patch_merger(tmp_path):
    """Mistral-small-3.1 patch merger: unfold layout + RMS input norm must
    match torch.nn.functional.unfold exactly (clip.cpp build_pixtral:581)."""
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_pixtral_vision
    from transformers import PixtralVisionConfig, PixtralVisionModel

    torch.manual_seed(7)
    D, M, OUT = 32, 2, 48
    vt = PixtralVisionModel(PixtralVisionConfig(
        hidden_size=D, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=4, image_size=16, patch_size=4,
    )).eval()
    base = str(tmp_path / "pm-base.gguf")
    convert_hf_pixtral_vision(vt, base)

    rng = np.random.default_rng(1)
    merger_w = (rng.standard_normal((D, D * M * M)) * 0.1).astype(np.float32)
    norm_w = (1 + rng.standard_normal(D) * 0.05).astype(np.float32)
    mm1 = (rng.standard_normal((OUT, D)) * 0.1).astype(np.float32)
    mm2 = (rng.standard_normal((OUT, OUT)) * 0.1).astype(np.float32)
    brk = rng.standard_normal(OUT).astype(np.float32)

    # re-write the mmproj with merger + projector tensors appended
    r0 = GGUFReader(base)
    w = GGUFWriter(str(tmp_path / "pm-full.gguf"), "clip")
    for k in r0.field_names():
        if k.startswith("clip."):
            w.add_kv(k, r0.get(k))
    w.add_uint32("clip.vision.spatial_merge_size", M)
    w.add_uint32("clip.vision.projection_dim", OUT)
    from llama_cpp_gfx906_tpu.gguf import GGMLType as GT

    for name, t in r0.tensors.items():
        w.add_tensor(name, t.to_f32(), GT.F32)
    w.add_tensor("mm.patch_merger.weight", merger_w, GT.F32)
    w.add_tensor("mm.input_norm.weight", norm_w, GT.F32)
    w.add_tensor("mm.1.weight", mm1, GT.F32)
    w.add_tensor("mm.2.weight", mm2, GT.F32)
    w.add_tensor("v.token_embd.img_break", brk, GT.F32)
    path = w.write()

    cfg, params = load_mmproj(GGUFReader(path), jnp.float32)
    assert cfg.spatial_merge_size == M
    pixels = np.random.default_rng(2).standard_normal((1, 3, 16, 16)).astype(np.float32)
    got = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))[0]

    # oracle: HF tower → RMS norm → torch unfold → merger → GELU MLP → breaks
    with torch.no_grad():
        feats = vt(torch.tensor(pixels)).last_hidden_state[0]  # (16, D)
        f = feats / torch.sqrt((feats ** 2).mean(-1, keepdim=True) + 1e-5)
        f = f * torch.tensor(norm_w)
        grid = f.view(4, 4, D).permute(2, 0, 1).unsqueeze(0)  # (1, D, 4, 4)
        unf = torch.nn.functional.unfold(grid, kernel_size=M, stride=M)  # (1, D*M*M, 4)
        merged = unf[0].T @ torch.tensor(merger_w).T  # (4, D)
        y = merged @ torch.tensor(mm1).T
        y = torch.nn.functional.gelu(y)
        y = y @ torch.tensor(mm2).T  # (4, OUT)
        y = y.view(2, 2, OUT)
        out_rows = []
        for r in range(2):
            out_rows.append(torch.cat([y[r], torch.tensor(brk)[None]], dim=0))
        want = torch.cat(out_rows, dim=0)[:-1].numpy()  # (2*(2+1)-1, OUT)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_idefics3_pixel_shuffle_parity(tmp_path):
    """Idefics3/SmolVLM connector: pixel shuffle + fc must match the HF
    Idefics3Connector end to end (reference clip.cpp:521)."""
    from transformers import Idefics3VisionConfig
    from transformers.models.idefics3.configuration_idefics3 import Idefics3Config
    from transformers.models.idefics3.modeling_idefics3 import (
        Idefics3Connector,
        Idefics3VisionTransformer,
    )

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_idefics3_vision

    torch.manual_seed(9)
    vcfg = Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4,
    )
    tower = Idefics3VisionTransformer(vcfg).eval()
    full = Idefics3Config(vision_config=vcfg.to_dict(),
                          text_config=dict(hidden_size=48, vocab_size=64),
                          scale_factor=2)
    conn = Idefics3Connector(full).eval()

    class Shim:
        vision_model = tower
        connector = conn
        config = full

    path = str(tmp_path / "id3-mmproj.gguf")
    convert_hf_idefics3_vision(Shim, path, scale_factor=2)
    cfg, params = load_mmproj(GGUFReader(path))
    assert cfg.projector == "idefics3" and cfg.proj_scale_factor == 2

    pixels = np.random.default_rng(4).standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        hs = tower(torch.tensor(pixels)).last_hidden_state
        ref = conn(hs)[0].numpy()
    got = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_internvl_projector_parity(tmp_path):
    """InternVL: layer-scaled tower + pixel shuffle + LN/gelu MLP projector
    vs HF get_image_features (reference clip.cpp build_internvl)."""
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.clip import encode_image, load_mmproj
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_internvl_vision

    torch.manual_seed(10)
    hf = InternVLForConditionalGeneration(InternVLConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=[16, 16], patch_size=[4, 4]),
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2),
        downsample_ratio=0.5,
    )).eval()
    path = str(tmp_path / "ivl-mmproj.gguf")
    convert_hf_internvl_vision(hf, path, scale_factor=2)
    cfg, params = load_mmproj(GGUFReader(path))
    assert cfg.projector == "internvl" and cfg.use_class_token

    pixels = np.random.default_rng(5).standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-1,
            vision_feature_select_strategy="default",
        )[0].numpy()
    got = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)
