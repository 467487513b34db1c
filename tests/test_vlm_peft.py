"""PEFT for vision-language models (reference nemo/collections/vlm/peft):
GenericLoRA over the NeVA LLM's attention kernels with every base weight
frozen — the vlm LoRA fine-tuning path on the generic adapter framework."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nemo_tpu.core.adapters import (
    GenericLoRA, adapter_trainable, frozen_base_optimizer,
)
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.vision.vit import ViTConfig
from nemo_tpu.models.vlm.neva import NevaConfig, NevaModel


def test_neva_lora_finetune_frozen_base():
    llm = tiny_test(num_layers=2, hidden_size=64, ffn_hidden_size=128,
                    num_attention_heads=4, vocab_size=64)
    vision = ViTConfig(image_size=16, patch_size=4, hidden_size=32,
                       num_layers=2, num_heads=2, ffn_hidden_size=64,
                       use_cls_token=False)
    cfg = NevaConfig(llm=llm, vision=vision, image_token_id=63)
    model = NevaModel(cfg)

    rng = np.random.RandomState(0)
    B = 2
    toks = rng.randint(1, 60, (B, 12))
    toks[:, 2:6] = 63
    tokens = jnp.asarray(toks, jnp.int32)
    images = jnp.asarray(rng.rand(B, 16, 16, 3), jnp.float32)
    mask = jnp.ones(tokens.shape, jnp.float32)
    import flax.linen as nn
    base = nn.meta.unbox(model.init(jax.random.PRNGKey(0), images,
                                    tokens)["params"])

    lora = GenericLoRA(targets=["q_proj", "v_proj"], dim=4)
    adapters = lora.init({"params": base})
    assert all("llm" in k for k in adapters)  # only LLM attn matched

    state = {"params": base, "adapters": adapters}
    opt = frozen_base_optimizer(state, 3e-3,
                                lambda p: adapter_trainable(p))
    ost = opt.init(state)

    @jax.jit
    def step(state, ost):
        def lf(s):
            merged = lora.merge({"params": s["params"]},
                                s["adapters"])["params"]
            return model.apply({"params": merged}, images, tokens, mask,
                               method=NevaModel.loss, train=False)

        l, g = jax.value_and_grad(lf)(state)
        u, ost = opt.update(g, ost, state)
        return optax.apply_updates(state, u), ost, l

    first = last = None
    for i in range(30):
        state, ost, l = step(state, ost)
        if i == 0:
            first = float(l)
        last = float(l)
    assert last < first  # adapters learn

    # base weights bit-identical (true PEFT: only lora_a/lora_b moved)
    for (pa, va), (pb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(base),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(state["params"]),
                   key=lambda t: str(t[0]))):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        adapters, state["adapters"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
