"""Generic adapter injection for ASR/TTS (VERDICT r2 #10): wildcard module
targeting + houlsby adapters in Conformer layers + frozen-base fine-tune."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from nemo_tpu.core.adapters import (
    GenericLoRA, adapter_trainable, freeze_mask, frozen_base_optimizer,
    match_params)
from nemo_tpu.core.config import ConfigDict
from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
from nemo_tpu.ops.ctc import ctc_loss_mean


def _cfg(adapter_dim=0):
    enc = dict(
        _target_="ConformerEncoder", feat_in=32, n_layers=2, d_model=32,
        n_heads=2, subsampling_factor=4, dropout=0.0, dropout_att=0.0,
    )
    if adapter_dim:
        enc["adapter_dim"] = adapter_dim
    return ConfigDict(dict(labels=list("ab "), preprocessor=dict(features=32),
                           encoder=enc))


def test_wildcard_module_matcher():
    m = EncDecCTCModel(_cfg())
    paths = match_params(m.variables, ["attn/linear_q"])
    assert len(paths) == 2  # one q kernel per layer
    assert all("attn/linear_q" in "/".join(x) for x in paths)
    # bare-name pattern matches anywhere (module_matcher semantics)
    ff = match_params(m.variables, ["ff1"])
    assert len(ff) >= 2
    with pytest.raises(ValueError):
        GenericLoRA(targets=["nonexistent_module"]).init(m.variables)


def test_generic_lora_identity_at_init_on_conformer():
    m = EncDecCTCModel(_cfg())
    lora = GenericLoRA(targets=["attn/linear_q", "attn/linear_v"], dim=4)
    ads = lora.init(m.variables, seed=0)
    assert len(ads) == 4  # q+v × 2 layers
    merged = lora.merge(m.variables, ads)
    sig = jnp.asarray(np.random.RandomState(0).randn(1, 3200) * 0.1, jnp.float32)
    lens = jnp.full((1,), 3200, jnp.int32)
    lp0, _ = m._infer_fn(m.variables, sig, lens)
    lp1, _ = m._infer_fn(merged, sig, lens)
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1), atol=1e-6)


def test_houlsby_adapters_identity_at_init():
    """adapter_up is zero-init → inserting adapters must not change the
    function (reference: adapters initialize to identity)."""
    rng = np.random.RandomState(0)
    sig = jnp.asarray(rng.randn(1, 3200) * 0.1, jnp.float32)
    lens = jnp.full((1,), 3200, jnp.int32)
    base = EncDecCTCModel(_cfg())
    adpt = EncDecCTCModel(_cfg(adapter_dim=8), init_params=False)
    # graft base weights into the adapter model (adapters init separately)
    flat_b = traverse_util.flatten_dict(base.variables)
    adpt._init_params(seed=0)
    flat_a = dict(traverse_util.flatten_dict(adpt.variables))
    for p, v in flat_b.items():
        flat_a[p] = v
    adpt.variables = traverse_util.unflatten_dict(flat_a)
    lp0, _ = base._infer_fn(base.variables, sig, lens)
    lp1, _ = adpt._infer_fn(adpt.variables, sig, lens)
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1), atol=1e-5)


def test_frozen_base_adapter_finetune_on_ctc():
    """Fine-tune the CTC model with ONLY houlsby adapters trainable: loss
    decreases, base params bit-identical after training."""
    m = EncDecCTCModel(_cfg(adapter_dim=8))
    mask = freeze_mask(m.variables, adapter_trainable)
    flat_mask = traverse_util.flatten_dict(mask)
    n_train = sum(1 for v in flat_mask.values() if v)
    assert n_train == 2 * 6  # 2 layers × (norm s+b, down k+b, up k+b)
    tx = frozen_base_optimizer(m.variables, 3e-3, adapter_trainable)

    rng = np.random.RandomState(0)
    sig = jnp.asarray(rng.randn(2, 3200) * 0.1, jnp.float32)
    lens = jnp.full((2,), 3200, jnp.int32)
    targets = jnp.asarray(rng.randint(0, 3, (2, 4)), jnp.int32)
    tlen = jnp.full((2,), 4, jnp.int32)

    @jax.jit
    def step(v, opt):
        def f(v):
            lp, el = m._infer_fn(v, sig, lens)
            return ctc_loss_mean(lp, el, targets, tlen)

        loss, g = jax.value_and_grad(f)(v)
        up, opt = tx.update(g, opt, v)
        return optax.apply_updates(v, up), opt, loss

    v, opt = m.variables, tx.init(m.variables)
    first = None
    for _ in range(15):
        v, opt, loss = step(v, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))
    # base params untouched; adapter params moved
    f0 = traverse_util.flatten_dict(m.variables)
    f1 = traverse_util.flatten_dict(v)
    moved = unmoved = 0
    for p in f0:
        same = np.array_equal(np.asarray(f0[p]), np.asarray(f1[p]))
        if flat_mask[p]:
            moved += 0 if same else 1
        else:
            assert same, f"frozen base param changed: {'/'.join(p)}"
            unmoved += 1
    assert moved > 0 and unmoved > 0


def test_generic_lora_on_ssm_model():
    """GenericLoRA targets mamba in_proj/out_proj kernels — PEFT works on
    the SSM collection with the same tree-level machinery."""
    import flax.linen as nn
    import optax

    from nemo_tpu.core.adapters import (
        GenericLoRA, adapter_trainable, frozen_base_optimizer)
    from nemo_tpu.models.llm.ssm import SSMConfig, SSMModel

    cfg = SSMConfig(num_layers=2, hidden_size=32, vocab_size=100, num_heads=4,
                    head_dim=8, n_groups=2, state_size=8, chunk_size=8)
    model = SSMModel(cfg)
    tok = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 16)))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), tok)["params"])

    lora = GenericLoRA(targets=("in_proj", "out_proj"), dim=4)
    adapters = lora.init({"params": params})
    assert len(adapters) == 2 * cfg.num_layers  # in+out per mixer
    # identity at init
    merged = lora.merge({"params": params}, adapters)["params"]
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": merged}, tok)),
        np.asarray(model.apply({"params": params}, tok)), atol=1e-6)

    # one adapter-only step moves loss, base stays frozen
    opt = frozen_base_optimizer({"adapters": adapters}, 1e-2,
                                adapter_trainable)
    ostate = opt.init({"adapters": adapters})

    def loss_fn(ad):
        m = lora.merge({"params": params}, ad["adapters"])["params"]
        logits = model.apply({"params": m}, tok)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, tok[..., None], -1))

    l0, g = jax.value_and_grad(loss_fn)({"adapters": adapters})
    updates, _ = opt.update(g, ostate, {"adapters": adapters})
    new = optax.apply_updates({"adapters": adapters}, updates)
    l1 = loss_fn(new)
    assert float(l1) < float(l0)
