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
