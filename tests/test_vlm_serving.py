"""VLM serving + export: OpenAI image_url content parts routed to the VLM
engine (reference: vlm/inference wrappers behind the deploy proxy,
`nemo/collections/vlm/inference/vlm_engine.py`), and the StableHLO
image→caption program (reference role: `nemo/export/multimodal/build.py`).
"""

import base64
import http.client
import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.models.llm.config import GPTConfig
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel

IMG_ID = 61
PORT = 18127


def _tiny_vlm():
    llm = GPTConfig(num_layers=2, hidden_size=32, ffn_hidden_size=64,
                    num_attention_heads=4, num_query_groups=2, vocab_size=64,
                    seq_length=64, scan_layers=False, compute_dtype="float32")
    vit = ViTConfig(image_size=16, patch_size=8, hidden_size=16,
                    num_layers=1, num_heads=2, ffn_hidden_size=32,
                    use_cls_token=False)
    cfg = NevaConfig(llm=llm, vision=vit, image_token_id=IMG_ID)
    model = NevaModel(cfg)
    images = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    toks = jnp.asarray([[5, 9] + [IMG_ID] * 4 + [17, 3]], jnp.int32)
    import flax.linen as nn

    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0),
                                      jnp.asarray(images), toks)["params"])
    return model, params, images


class ByteTok:
    def text_to_ids(self, t):
        return [b % 60 for b in t.encode()] or [1]

    def ids_to_text(self, ids):
        return bytes(max(32, min(126, i + 32)) for i in ids).decode(
            errors="replace")


def _npy_data_url(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return "data:application/npy;base64," + base64.b64encode(
        buf.getvalue()).decode()


def test_api_generate_vlm_text_level():
    model, params, images = _tiny_vlm()
    from nemo_tpu.llm.api import generate_vlm

    out = generate_vlm(model, params, images, ["look <image> describe"],
                       ByteTok(), n_image_tokens=4)
    assert len(out) == 1 and isinstance(out[0], str) and out[0]


def test_server_chat_with_image_parts():
    model, params, images = _tiny_vlm()
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.llm.gpt import GPTModel
    from nemo_tpu.serve.openai_server import LLMServer

    cfg = tiny_test()
    lm = GPTModel(cfg)
    lm_params = lm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    srv = LLMServer(cfg, lm_params, ByteTok(),
                    vlm={"model": model, "params": params,
                         "n_image_tokens": 4})
    srv.serve(port=PORT, blocking=False)
    try:
        payload = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "what is this "},
                {"type": "image_url",
                 "image_url": {"url": _npy_data_url(images[0])}},
            ]}],
            "max_tokens": 4,
        }
        conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=300)
        conn.request("POST", "/v1/chat/completions", json.dumps(payload),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        out = json.loads(r.read())
        assert r.status == 200, out
        assert out["choices"][0]["message"]["content"]
        # text-only chat still rides the continuous-batching engine
        conn.request("POST", "/v1/chat/completions", json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 2}), {"Content-Type": "application/json"})
        r2 = conn.getresponse()
        assert r2.status == 200
        json.loads(r2.read())
    finally:
        srv.shutdown()


def test_export_vlm_generate_round_trip(tmp_path):
    """Saved StableHLO program reproduces the live engine's image→caption
    tokens exactly."""
    model, params, images = _tiny_vlm()
    from nemo_tpu.export.stablehlo import export_vlm_generate, load_exported
    from nemo_tpu.models.llm.generate import SamplingParams
    from nemo_tpu.models.vlm.inference import VLMGenerationEngine

    path = export_vlm_generate(
        model, params, str(tmp_path / "vlm"), batch=1, prompt_len=16,
        max_new_tokens=4, image_shape=(1, 16, 16, 3),
        platforms=("cpu",))
    prog = load_exported(path)
    assert prog.manifest["kind"] == "vlm_generate"

    prompt = [5, 9] + [IMG_ID] * 4 + [17, 3]
    S = 16
    tokens = np.zeros((1, S), np.int32)
    tokens[0, S - len(prompt):] = prompt
    plen = np.asarray([len(prompt)], np.int32)
    pad = S - plen
    positions = np.maximum(np.arange(S)[None, :] - pad[:, None], 0).astype(
        np.int32)
    got = np.asarray(prog(jnp.asarray(images), jnp.asarray(tokens),
                          jnp.asarray(plen), jnp.asarray(positions),
                          jax.random.PRNGKey(0)))

    engine = VLMGenerationEngine(model, params)
    want = engine.generate_tokens(
        images, [prompt], SamplingParams(greedy=True, max_new_tokens=4,
                                         eos_id=-1))
    assert [int(t) for t in got[0]] == want[0]
